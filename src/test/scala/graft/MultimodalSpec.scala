package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{BinaryItem, ImageMeta, StubCodec}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("StubCodec.decode: header-derived metadata, deterministic") {
    val m = StubCodec.decode("hello world padding".getBytes("UTF-8"))
    assert(m.width == 16 + 'h'.toInt % 128)
    assert(m.height == 16 + 'e'.toInt % 128)
    assert(m.channels == 1 + 'l'.toInt % 4)
    assert(m == StubCodec.decode("hello world padding".getBytes("UTF-8")))
    // empty payload doesn't crash
    assert(StubCodec.decode(Array.emptyByteArray).width == 16)
  }

  test("decode: binary column → typed metadata table, distributed") {
    val df = Seq((1L, "abcdef".getBytes), (2L, "xy".getBytes))
      .toDF("id", "payload").repartition(2)
    val got = Multimodal.decode(df, "id", "payload")
      .orderBy("item_id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("n_bytes") == 6L)
    assert(got(0).getAs[String]("format") == "png") // 6 % 3 == 0
    assert(got(1).getAs[String]("format") == "webp") // 2 % 3 == 2
  }

  test("resize stub: metadata rescaled, payload bounded") {
    val payload = Array.fill[Byte](1000)(7)
    val meta = ImageMeta(100, 100, 3, "png")
    val (p2, m2) = StubCodec.resize(payload, meta, 10, 10)
    assert(m2.width == 10 && m2.height == 10)
    assert(p2.length <= payload.length && p2.length >= 1)
  }

  /** Real PNG bytes rendered with the JDK — no fixtures, no codec deps. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ImageIoCodec: real PNG decodes with true dimensions; garbage falls through") {
    val m = Multimodal.ImageIoCodec.decode(pngBytes(40, 25))
    assert(m.contains(ImageMeta(40, 25, 3, "png")))
    assert(Multimodal.ImageIoCodec.decode("not an image".getBytes).isEmpty)
    assert(Multimodal.ImageIoCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("ImageIoCodec.resize: real pixel rescale, re-decodable output") {
    val Some((resized, meta)) = Multimodal.ImageIoCodec.resize(pngBytes(64, 64), 16, 8)
    assert(meta.width == 16 && meta.height == 8)
    val roundTrip = Multimodal.ImageIoCodec.decode(resized)
    assert(roundTrip.contains(ImageMeta(16, 8, 3, "png")))
  }

  test("decodeAuto: real images get real metadata, others stub + flag, distributed") {
    val df = Seq((1L, pngBytes(33, 21)), (2L, "plain bytes!".getBytes))
      .toDF("id", "payload").repartition(2)
    val got = Multimodal.decodeAuto(df, "id", "payload")
      .orderBy("item_id").collect()
    assert(got(0).getAs[Boolean]("real_decode"))
    assert(got(0).getAs[Int]("width") == 33 && got(0).getAs[Int]("height") == 21)
    assert(got(0).getAs[String]("format") == "png")
    assert(!got(1).getAs[Boolean]("real_decode"))
    assert(got(1).getAs[String]("format") == "png") // stub: 12 % 3 == 0
  }

  test("perceptualHash: identical images collide, half-split differs, flat image is 0") {
    // top half dark, bottom half bright → exactly the 8 bottom cells set
    def halfPng(bright: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(x => (0 until 16).foreach(y =>
        img.setRGB(x, y, if (y < 8) 0x000000 else bright)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val df = Seq(
      (1L, halfPng(0xFFFFFF)), (2L, halfPng(0xFFFFFF)), // identical pair
      (3L, pngBytes(16, 16)),                           // different gradient
      (4L, halfPng(0x050505))                           // near-flat split
    ).toDF("id", "payload").repartition(2)
    val got = Multimodal.perceptualHash(df, "id", "payload")
      .orderBy("item_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L), "identical images must collide")
    // bottom-half-bright = cells 8..15 above the mean = bits 8..15
    assert(got(1L) == 0xFF00L)
    assert(got(1L) != got(3L), "distinct content must (here) differ")
    // the near-flat split still hashes by relative brightness — same shape
    assert(got(4L) == got(1L))
  }

  test("differenceHash: gradient bits, brightness-shift invariance") {
    // vertical split: left dark, right bright → only the horizontal
    // boundary transitions (j=1→2 within each row... columns 0-1 dark,
    // 2-3 bright: bit set where g[i][j+1] > g[i][j], i.e. j=1 for every
    // row) plus NO vertical bits (rows identical)
    def vsplitPng(dark: Int, bright: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(x => (0 until 16).foreach(y =>
        img.setRGB(x, y, if (x < 8) dark else bright)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val df = Seq(
      (1L, vsplitPng(0x000000, 0xFFFFFF)),
      // uniform +0x20 brightness shift on every channel: every aHash-style
      // global-mean compare can move, but the GRADIENTS are identical
      (2L, vsplitPng(0x202020, 0xFFFFFF)),
      (3L, vsplitPng(0xFFFFFF, 0x000000))) // reversed gradient
      .toDF("id", "payload").repartition(2)
    val got = Multimodal.differenceHash(df, "id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // horizontal bits: (i, j=1) for i = 0..3 → k = i*3 + 1 → bits 1,4,7,10
    assert(got(1L) == ((1L << 1) | (1L << 4) | (1L << 7) | (1L << 10)))
    // brightness-shifted image keeps the identical dHash
    assert(got(2L) == got(1L))
    // reversed gradient has only DECREASING transitions → no bits set:
    // dHash encodes direction, so mirror images land in different groups
    assert(got(3L) == 0L && got(3L) != got(1L))
  }

  test("null binary cells flow through the image tier as empty payloads") {
    val df = Seq((1L, "bytes".getBytes), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    assert(Multimodal.decodeAuto(df, "id", "payload").count() == 2)
    assert(Multimodal.imageFeatures(df, "id", "payload").count() == 2)
    val ph = Multimodal.perceptualHash(df, "id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ph(2L) == 0L) // empty payload → all-zero grid → hash 0
    assert(Multimodal.resize(df, "id", "payload", 8, 8).count() == 2)
    // 5-byte payload → offsets 0,4; null/empty payload → no frames
    assert(Multimodal.sampleFrames(df, "id", "payload", 4).count() == 2)
  }

  test("imageFeatures: solid-color PNG yields exact channel means and flat grid") {
    val img = new java.awt.image.BufferedImage(20, 20,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 20).foreach(x => (0 until 20).foreach(y =>
      img.setRGB(x, y, 0xCC3366))) // r=204 g=51 b=102
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val df = Seq((1L, out.toByteArray), (2L, "just bytes".getBytes))
      .toDF("id", "payload").repartition(2)
    val got = Multimodal.imageFeatures(df, "id", "payload")
      .orderBy("item_id").collect()
    assert(got(0).getAs[Boolean]("real_decode"))
    assert(got(0).getAs[Double]("mean_r") == 204.0)
    assert(got(0).getAs[Double]("mean_g") == 51.0)
    assert(got(0).getAs[Double]("mean_b") == 102.0)
    val luma = 0.299 * 204 + 0.587 * 51 + 0.114 * 102
    (0 to 3).foreach(i => (0 to 3).foreach(j =>
      assert(math.abs(got(0).getAs[Double](s"g$i$j") - luma) < 1e-9)))
    // fallback path: deterministic byte-slice means, flagged not-real
    assert(!got(1).getAs[Boolean]("real_decode"))
    assert(got(1).getAs[Double]("mean_r") > 0.0)
  }

  test("sampleFrames: ceil(len/stride) offsets per item") {
    val df = Seq((1L, Array.fill[Byte](130)(1)), (2L, Array.fill[Byte](64)(1)))
      .toDF("id", "payload")
    val got = Multimodal.sampleFrames(df, "id", "payload", stride = 64)
      .groupBy("item_id").agg(count(lit(1)).as("n"))
      .orderBy("item_id").collect().map(_.getLong(1))
    assert(got.toSeq == Seq(3L, 1L)) // 130→offsets 0,64,128; 64→offset 0
  }

  /** Canonical 44-byte PCM WAV around the given int16 mono samples. */
  private def wav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("decodeAudio: real WAV header parsed through the distributed path") {
    val sine = Array.tabulate[Short](64)(i =>
      (math.sin(i * math.Pi / 8) * 1000).toShort)
    val df = Seq((1L, wav(16000, sine)), (2L, "not a wav at all".getBytes))
      .toDF("id", "payload")
    val got = Multimodal.decodeAudio(df, "id", "payload")
      .orderBy("item_id").collect()
    assert(got(0).getInt(2) == 16000 && got(0).getInt(3) == 1 &&
      got(0).getInt(4) == 16 && got(0).getLong(5) == 64L &&
      got(0).getBoolean(6), "real WAV: rate/channels/bits/frames parsed")
    assert(!got(1).getBoolean(6) && got(1).getLong(5) == 8L,
      "non-WAV falls back to raw-PCM16 frame count")
  }

  test("audio: null and sub-sample payloads emit no feature row, no crash") {
    val df = Seq((1L, null.asInstanceOf[Array[Byte]]), (2L, Array[Byte](7)))
      .toDF("id", "payload")
    assert(Multimodal.audioFeatures(df, "id", "payload").count() == 0L)
    assert(Multimodal.decodeAudio(df, "id", "payload").count() == 2L)
  }

  test("audioFeatures: exact PCM math; WAV wrapper and raw payload agree") {
    // alternating ±1000: sum 0, sum_sq 4e6·n/ n... per-sample square 1e6
    val pcm = Array[Short](1000, -1000, 1000, -1000)
    val raw = {
      val bb = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      pcm.foreach(bb.putShort); bb.array()
    }
    val df = Seq((1L, wav(8000, pcm)), (2L, raw)).toDF("id", "payload")
    val got = Multimodal.audioFeatures(df, "id", "payload")
      .orderBy("item_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    // WAV data chunk and headerless payload carry the same samples →
    // identical features (the parse isolates the data chunk correctly)
    assert(got(0) == got(1))
    assert(got(0) == ((4L, 0L, 4000000L, 3L, 1000.0)))
  }

  test("pairAlignment: one verdict per pair, real-PNG tower path, layout-stable") {
    val df = Seq(
      (1L, pngBytes(24, 24), "a real image with a real caption"),
      (2L, "not an image at all".getBytes("UTF-8"), "stub tower fallback pair"),
      (3L, pngBytes(8, 8), "short caption"),
      (4L, pngBytes(8, 8), "   ")).toDF("id", "payload", "caption")
    val got = Multimodal.pairAlignment(df, "id", "payload", "caption",
      threshold = 0.0).orderBy("item_id").collect()
    assert(got.length == 4) // every pair gets a row, kept or not
    got.foreach { r =>
      val (score, kept) = (r.getDouble(1), r.getBoolean(2))
      assert(!score.isNaN && kept == (score >= 0.0))
    }
    // token-less caption: still a row, scored -inf, rejected — not dropped
    assert(got(3).getDouble(1) == Double.NegativeInfinity && !got(3).getBoolean(2))
    val again = Multimodal.pairAlignment(df.repartition(5), "id", "payload",
      "caption", threshold = 0.0).orderBy("item_id").collect()
    assert(got.map(_.getDouble(1)).toSeq == again.map(_.getDouble(1)).toSeq)
  }

  test("nearDupImages: brightness-shifted copy pairs at hamming 0, " +
      "reversed gradient does not pair") {
    // same vertical-split PNGs as the differenceHash spec: 1 and 2 differ
    // only by a uniform brightness shift (identical gradients → identical
    // dHash → hamming 0 pair); 3 is the reversed gradient (hamming 4 from
    // the 4 horizontal boundary bits — outside maxHamming=3, and band
    // recall is irrelevant because the verify would drop it anyway)
    def vsplitPng(dark: Int, bright: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(x => (0 until 16).foreach(y =>
        img.setRGB(x, y, if (x < 8) dark else bright)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val df = Seq(
      (1L, vsplitPng(0x000000, 0xFFFFFF)),
      (2L, vsplitPng(0x202020, 0xFFFFFF)),
      (3L, vsplitPng(0xFFFFFF, 0x000000)))
      .toDF("id", "payload").repartition(2)
    val pairs = Multimodal.nearDupImages(df, "id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)),
      s"only the brightness-shifted copy may pair: ${pairs.toSeq}")
  }
}
