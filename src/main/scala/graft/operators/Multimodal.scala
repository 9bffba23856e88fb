package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal column handling: images/audio/video ride through the engine as
  * opaque `binary` columns plus typed metadata structs; per-item decode /
  * feature-extract / resize / frame-sample run as partition-local batch
  * transforms (north star, SURVEY.md §2c).
  *
  * Two codec tiers: [[Multimodal.ImageIoCodec]] really decodes/resizes
  * anything the JDK's ImageIO readers claim (PNG/JPEG/BMP/GIF — in every
  * JRE, no external libraries), and [[StubCodec]] derives deterministic
  * metadata from raw bytes for everything else (the synthetic test corpora,
  * codecs absent from the JRE) so pipelines stay total. [[decodeAuto]]
  * composes them with a `real_decode` provenance flag — the production
  * "decode what you can, flag what you can't" shape. The Spark plumbing —
  * binary schema, typed Dataset encoding, partition-local batching via
  * `mapPartitions` (the Scala analogue of arrow-batched `mapInPandas`),
  * metadata structs, downstream relational ops — is identical for both
  * tiers; extending to a new modality means adding a codec, not a pipeline
  * — demonstrated by the audio tier ([[WavCodec]]: a real RIFF/WAVE parser,
  * with a headerless raw-PCM16 fallback so the synthetic corpus flows
  * through the same path).
  *
  * Scale notes: decode is embarrassingly parallel and partition-local (no
  * shuffle); binary payloads stay off the driver; at 100 TB the only knobs
  * are `spark.sql.files.maxPartitionBytes` (bound batch memory) and
  * repartitioning upstream if payload sizes are skewed.
  */
object Multimodal {

  /** One-time, JVM-wide: keep ImageIO streams IN MEMORY. The JDK default
    * (`useCache=true`) makes `ImageIO.read(InputStream)` and
    * `createImageInputStream` spool every payload to a temp FILE in
    * java.io.tmpdir for random access — one disk write+delete per row,
    * even when no reader claims the payload. Our payloads are in-memory
    * byte arrays, so the file cache is pure disk I/O — and a hidden
    * coupling: the multimodal queries' wall time tracked /tmp page-cache
    * pressure from whatever ran before them (the round-11 3-7× slowdown
    * on unchanged code) while CPU-bound calibration probes read quiet.
    * Lazily forced by [[readImage]]/[[ImageIoCodec]] so the setting lands
    * in every JVM (driver or executor) before its first decode.
    */
  @transient private lazy val imageIoMemOnly: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** In-memory ImageIO read: `Some(img)` for payloads a JRE reader claims,
    * `None` otherwise (callers fall back to [[StubCodec]]). All decode
    * paths route through here so the no-disk-cache posture above is
    * guaranteed wherever the closure runs.
    */
  private[graft] def readImage(
      payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    imageIoMemOnly
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Typed metadata for a decoded image-like payload. */
  case class ImageMeta(width: Int, height: Int, channels: Int, format: String)

  case class BinaryItem(item_id: Long, payload: Array[Byte])
  case class DecodedItem(item_id: Long, n_bytes: Long, width: Int,
      height: Int, channels: Int, format: String)

  /** Deterministic stand-in for a real codec. Reads "header" bytes the way a
    * real decoder reads magic numbers + dimensions. ??? -- replace with a
    * real decoder (e.g. javacv / ImageIO via JNI) in a full deployment.
    */
  object StubCodec {
    def decode(payload: Array[Byte]): ImageMeta = {
      def b(i: Int): Int = if (payload.length > i) payload(i) & 0xff else 0
      ImageMeta(
        width = 16 + b(0) % 128,
        height = 16 + b(1) % 128,
        channels = 1 + b(2) % 4,
        format = (payload.length % 3) match {
          case 0 => "png"
          case 1 => "jpg"
          case _ => "webp"
        })
    }

    /** Stub resize: real implementation reencodes pixels; the stub rescales
      * metadata and truncates the payload proportionally.
      */
    def resize(payload: Array[Byte], meta: ImageMeta, w: Int, h: Int): (Array[Byte], ImageMeta) = {
      val scale = (w.toLong * h) .toDouble / math.max(1, meta.width.toLong * meta.height)
      // clamp order matters: empty payloads resize to 0 bytes (min binds
      // last), non-empty ones to at least 1
      val n = math.min(payload.length, math.max(1, (payload.length * scale).toInt))
      (payload.take(n), meta.copy(width = w, height = h))
    }

    /** Stub frame sampling for "video" payloads: returns byte offsets of
      * every `stride`-th fake frame boundary. stride must be positive
      * (checked at the [[Multimodal.sampleFrames]] API boundary so a bad
      * value fails on the driver, and again here for direct callers).
      */
    def frameOffsets(payload: Array[Byte], stride: Int): Seq[Long] = {
      require(stride > 0, s"stride must be positive, got $stride")
      (0L until payload.length.toLong by stride.toLong).toSeq
    }
  }

  /** Real image decoder over the JDK's ImageIO — PNG/JPEG/BMP/GIF readers
    * ship in every JRE, so this needs no external codec libraries. Payloads
    * no installed reader claims (e.g. the synthetic test corpora, or codecs
    * like webp/avif absent from the JRE) return None and callers fall back
    * to [[StubCodec]], keeping the pipeline total. Executor-local and
    * allocation-bounded: one reader per payload, disposed eagerly.
    */
  object ImageIoCodec {
    def decode(payload: Array[Byte]): Option[ImageMeta] = {
      imageIoMemOnly // no per-row temp files — see the field's doc
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val img = r.read(0)
            Some(ImageMeta(img.getWidth, img.getHeight,
              img.getRaster.getNumBands, r.getFormatName.toLowerCase))
          } finally r.dispose()
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally if (iis != null) iis.close()
    }

    /** Real pixel resize: decode → bilinear rescale → re-encode as PNG.
      * None when the payload isn't a decodable image.
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Option[(Array[Byte], ImageMeta)] =
      try {
        readImage(payload).map { src =>
          val dst = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, w, h, null)
          } finally g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", out)
          (out.toByteArray, ImageMeta(w, h, dst.getRaster.getNumBands, "png"))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decoded metadata plus whether a real codec (vs the stub) produced it. */
  case class DecodedItemEx(item_id: Long, n_bytes: Long, width: Int,
      height: Int, channels: Int, format: String, real_decode: Boolean)

  /** Typed boundary shared by the image entries: null binary cells (a
    * nullable binary column) normalize to empty payloads, so every codec
    * tier downstream sees bytes — the same total-function posture as the
    * audio tier's in-loop guard.
    */
  private def binaryItems(df: DataFrame, idCol: String,
      binCol: String): Dataset[BinaryItem] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("item_id"),
      coalesce(col(binCol), typedLit(Array.emptyByteArray)).as("payload"))
      .as[BinaryItem]
  }

  private def orEmpty(p: Array[Byte]): Array[Byte] =
    if (p == null) Array.emptyByteArray else p

  /** Batch decode with codec autodetection: real ImageIO decode where a
    * reader claims the payload, [[StubCodec]] metadata otherwise — the
    * production shape (decode what you can, quarantine-flag what you
    * can't) with the same partition-local batching as [[decodeItems]].
    */
  def decodeItemsAuto(items: Dataset[BinaryItem]): Dataset[DecodedItemEx] = {
    implicit val enc = Encoders.product[DecodedItemEx]
    items.mapPartitions { it =>
      it.map { item =>
        val p = orEmpty(item.payload)
        ImageIoCodec.decode(p) match {
          case Some(m) => DecodedItemEx(item.item_id, p.length.toLong,
            m.width, m.height, m.channels, m.format, real_decode = true)
          case None =>
            val m = StubCodec.decode(p)
            DecodedItemEx(item.item_id, p.length.toLong,
              m.width, m.height, m.channels, m.format, real_decode = false)
        }
      }
    }
  }

  /** DataFrame-level entry for [[decodeItemsAuto]]. */
  def decodeAuto(df: DataFrame, idCol: String, binCol: String): DataFrame =
    decodeItemsAuto(binaryItems(df, idCol, binCol)).toDF()

  /** Per-item image features: RGB channel means + a 4×4 mean-luminance grid
    * (the classic cheap embedding for near-dup blocking / quality filters).
    */
  case class ImageFeatures(item_id: Long, real_decode: Boolean,
      mean_r: Double, mean_g: Double, mean_b: Double,
      g00: Double, g01: Double, g02: Double, g03: Double,
      g10: Double, g11: Double, g12: Double, g13: Double,
      g20: Double, g21: Double, g22: Double, g23: Double,
      g30: Double, g31: Double, g32: Double, g33: Double)

  /** Feature extraction over a binary image column: decodable payloads get
    * REAL pixel statistics (per-channel means, 4×4 block-mean luminance
    * grid — flattened to scalar columns so results dump/oracle cleanly);
    * everything else gets the deterministic byte-slice fallback so the
    * pipeline stays total. Partition-local like the other codec passes; on
    * a real corpus the per-pixel loop is the CPU hot spot and is O(pixels)
    * with zero allocation per pixel.
    */
  def imageFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val typed = binaryItems(df, idCol, binCol)
    implicit val enc = Encoders.product[ImageFeatures]
    typed.mapPartitions { it =>
      it.map { item =>
        val g = Array.ofDim[Double](16)
        var (sr, sg, sb) = (0.0, 0.0, 0.0)
        var real = false
        val img = readImage(item.payload)
        img match {
          case Some(im) if im.getWidth > 0 && im.getHeight > 0 =>
            real = true
            val (w, h) = (im.getWidth, im.getHeight)
            val cnt = Array.ofDim[Long](16)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = im.getRGB(x, y)
                val r = (rgb >> 16) & 0xff
                val gg = (rgb >> 8) & 0xff
                val b = rgb & 0xff
                sr += r; sg += gg; sb += b
                val cell = math.min(3, y * 4 / h) * 4 + math.min(3, x * 4 / w)
                g(cell) += 0.299 * r + 0.587 * gg + 0.114 * b
                cnt(cell) += 1
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            sr /= n; sg /= n; sb /= n
            var i = 0
            while (i < 16) { if (cnt(i) > 0) g(i) /= cnt(i); i += 1 }
          case _ =>
            // fallback: byte-slice means — thirds for "channels", 16 equal
            // slices for the grid; empty payloads yield all zeros
            val p = item.payload
            def sliceMean(lo: Int, hi: Int): Double =
              if (hi <= lo) 0.0
              else { var s = 0.0; var i = lo
                while (i < hi) { s += (p(i) & 0xff); i += 1 }
                s / (hi - lo) }
            val n = p.length
            sr = sliceMean(0, n / 3); sg = sliceMean(n / 3, 2 * n / 3)
            sb = sliceMean(2 * n / 3, n)
            var i = 0
            // long boundary math: n * 15 overflows Int past ~143 MB payloads
            // and would silently zero the upper grid cells
            while (i < 16) {
              g(i) = sliceMean((n.toLong * i / 16).toInt,
                (n.toLong * (i + 1) / 16).toInt)
              i += 1
            }
        }
        ImageFeatures(item.item_id, real, sr, sg, sb,
          g(0), g(1), g(2), g(3), g(4), g(5), g(6), g(7),
          g(8), g(9), g(10), g(11), g(12), g(13), g(14), g(15))
      }
    }.toDF()
  }

  /** Perceptual hash (aHash over the 4×4 luminance grid of
    * [[imageFeatures]]): bit i set iff cell i's mean exceeds the whole-grid
    * mean — the classic average-hash image fingerprint. Visually identical
    * images collide exactly, so a plain hash `groupBy` on `phash` IS the
    * image dedup pass (and hamming-near hashes can feed SimHash-style
    * banded blocking for the near-dup tier). The bit math is a fixed-order
    * codegen'd expression tree over the feature columns — deterministic
    * and oracle-replayable; `real_decode` provenance rides along.
    */
  def perceptualHash(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val cells = for { i <- 0 to 3; j <- 0 to 3 } yield s"g$i$j"
    val gmean = cells.map(col).reduce(_ + _) / lit(16.0)
    val bits = cells.zipWithIndex.map { case (c, i) =>
      when(col(c) > col("gmean"), lit(1L << i)).otherwise(lit(0L)) }
    imageFeatures(df, idCol, binCol)
      .withColumn("gmean", gmean)
      .select(col("item_id"), bits.reduce(_ + _).as("phash"),
        col("real_decode"))
  }

  /** Difference hash (dHash) over the same 4×4 luminance grid — the
    * gradient companion to [[perceptualHash]]'s aHash: each bit compares
    * ADJACENT cells (12 horizontal + 12 vertical = 24 bits) instead of
    * comparing to the global mean, so uniform brightness/contrast shifts
    * — which flip many aHash bits at once — leave dHash unchanged
    * (gradients are shift-invariant). Running both and intersecting
    * groups is the standard high-precision image-dedup recipe. Same
    * fixed-order codegen'd expression tree, oracle-replayable,
    * `real_decode` provenance rides along.
    */
  def differenceHash(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val hbits = (for { i <- 0 to 3; j <- 0 to 2 } yield (i, j)).zipWithIndex
      .map { case ((i, j), k) =>
        when(col(s"g$i${j + 1}") > col(s"g$i$j"), lit(1L << k))
          .otherwise(lit(0L)) }
    val vbits = (for { i <- 0 to 2; j <- 0 to 3 } yield (i, j)).zipWithIndex
      .map { case ((i, j), k) =>
        when(col(s"g${i + 1}$j") > col(s"g$i$j"), lit(1L << (12 + k)))
          .otherwise(lit(0L)) }
    imageFeatures(df, idCol, binCol)
      .select(col("item_id"), (hbits ++ vbits).reduce(_ + _).as("dhash"),
        col("real_decode"))
  }

  /** NEAR-duplicate image pairs via Hamming banding over the 24-bit
    * [[differenceHash]] fingerprint — the image face of the SimHash
    * near-dup recipe: where [[differenceHash]]'s exact-equality grouping
    * only catches byte-level re-encodes, band blocking (4×6-bit bands,
    * pigeonhole recall for Hamming ≤ 3) + exact `bit_count(xor)` verify
    * catches the slightly-recompressed / slightly-cropped copies that
    * dominate scraped image corpora. Shares
    * [[graft.operators.Dedup.hammingBandPairs]] — same bucket caps, same
    * equi-join-only shape, Σ bucket² work.
    */
  def nearDupImages(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame =
    graft.operators.Dedup.hammingBandPairs(
      differenceHash(df, idCol, binCol)
        .select(col("item_id").as("id"), col("dhash").as("sh")),
      bands = 4, bandBits = 6, hashBits = 24, maxHamming = maxHamming,
      maxBucket = maxBucket)

  /** Batch decode: one pass per partition, typed output. The inner loop is
    * an iterator transform — constant memory per partition regardless of
    * corpus size.
    */
  def decodeItems(items: Dataset[BinaryItem]): Dataset[DecodedItem] = {
    implicit val enc = Encoders.product[DecodedItem]
    items.mapPartitions { it =>
      it.map { item =>
        val p = orEmpty(item.payload)
        val m = StubCodec.decode(p)
        DecodedItem(item.item_id, p.length.toLong,
          m.width, m.height, m.channels, m.format)
      }
    }
  }

  /** DataFrame-level entry: binary column + id → decoded metadata table. */
  def decode(df: DataFrame, idCol: String, binCol: String): DataFrame =
    decodeItems(binaryItems(df, idCol, binCol)).toDF()

  /** Decode + resize in one partition pass: (item_id, resized byte count,
    * target dims, original dims) — the shape of a thumbnailing stage in a
    * training-data pipeline (stub pixel math, real Spark plumbing).
    */
  def resize(df: DataFrame, idCol: String, binCol: String,
      w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = binaryItems(df, idCol, binCol)
    typed.mapPartitions { it =>
      it.map { item =>
        val m = StubCodec.decode(item.payload)
        val (resized, m2) = StubCodec.resize(item.payload, m, w, h)
        (item.item_id, resized.length.toLong, m2.width, m2.height,
          m.width, m.height)
      }
    }.toDF("item_id", "n_bytes_resized", "width", "height",
      "orig_width", "orig_height")
  }

  /** Frame sampling over a binary "video" column → (item_id, frame_offset)
    * rows, one scan, explode on the executor side.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    val typed = binaryItems(df, idCol, binCol)
    typed.flatMap(item => StubCodec.frameOffsets(item.payload, stride)
        .map(off => (item.item_id, off)))
      .toDF("item_id", "frame_offset")
  }

  // --- audio tier: same pipeline, different codec (see object scaladoc) ---

  /** Typed metadata for a parsed audio payload. */
  case class AudioMeta(sample_rate: Int, channels: Int, bits: Int,
      n_frames: Long, format: String)

  case class AudioFeatures(item_id: Long, n_samples: Long, pcm_sum: Long,
      sum_sq: Long, zero_crossings: Long, rms: Double)

  /** Real RIFF/WAVE parser — pure JVM byte reads, no libraries (canonical
    * PCM layout: RIFF + WAVE + 'fmt ' chunk + chunk scan to 'data').
    * Returns (meta, dataOffset, dataLength) or None for anything that
    * isn't a PCM WAV; [[audioFeatures]] then falls back to the headerless
    * raw-PCM16LE interpretation, so the pipeline stays total exactly like
    * [[decodeAuto]]'s image tiers.
    */
  object WavCodec {
    def parse(p: Array[Byte]): Option[(AudioMeta, Int, Int)] = {
      def u8(i: Int): Int = p(i) & 0xff
      def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def u32(i: Int): Long = u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      def tag(i: Int, s: String): Boolean =
        p.length >= i + 4 && s.indices.forall(j => p(i + j) == s(j).toByte)
      if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE") ||
        !tag(12, "fmt ")) return None
      val fmtSize = u32(16).toInt
      val audioFormat = u16(20)
      val channels = u16(22)
      val rate = u32(24)
      val bits = u16(34)
      if (audioFormat != 1 || channels <= 0 || bits % 8 != 0 || bits == 0)
        return None
      // chunk scan to 'data' (fmt may be followed by LIST/fact/etc.).
      // Offsets advance in Long and corrupt sizes (a size field that would
      // step backwards or past the payload) abort to None — a malformed
      // chunk header must degrade like every other malformed input, not
      // throw AIOOBE out of the executor task
      var off = 20L + fmtSize
      var found = -1L
      var guard = 0
      while (found < 0 && off >= 0 && off + 8 <= p.length && guard < 64) {
        val sz = u32(off.toInt + 4)
        if (tag(off.toInt, "data")) found = off
        else off += 8L + sz + (sz & 1L) // chunks are word-aligned
        guard += 1
      }
      if (found < 0) return None
      val dataLen = math.min(u32(found.toInt + 4), p.length - found - 8).toInt
      val frame = channels * (bits / 8)
      Some((AudioMeta(rate.toInt, channels, bits, dataLen.toLong / frame,
        "wav/pcm"), found.toInt + 8, dataLen))
    }
  }

  /** Parsed-WAV metadata table: (item_id, n_bytes, sample_rate, channels,
    * bits, n_frames, real_parse) — non-WAV payloads get n_frames from the
    * raw-PCM16 fallback and real_parse = false.
    */
  def decodeAudio(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = binaryItems(df, idCol, binCol)
    typed.mapPartitions { it =>
      it.map { item =>
        val p = orEmpty(item.payload)
        WavCodec.parse(p) match {
          case Some((m, _, _)) => (item.item_id, p.length.toLong,
            m.sample_rate, m.channels, m.bits, m.n_frames, true)
          case None => (item.item_id, p.length.toLong,
            0, 1, 16, p.length.toLong / 2, false)
        }
      }
    }.toDF("item_id", "n_bytes", "sample_rate", "channels", "bits",
      "n_frames", "real_parse")
  }

  /** Audio features over int16 little-endian PCM: a real WAV's data chunk
    * when the RIFF parse succeeds, the whole payload as headerless PCM16
    * otherwise. Emits per item:
    *  - `n_samples`, `pcm_sum` (DC component), `sum_sq` — exact in int64;
    *  - `zero_crossings` counted after integer-exact DC removal (the sign
    *    of `x_i*n - sum` — the bias-removed ZCR, no FP in the comparison);
    *  - `rms = sqrt(sum_sq/n)` — one IEEE op on exact integers, identical
    *    in any engine (the DuckDB oracle replays all five values).
    * Items with no full sample (0-1 bytes) emit no row. One partition-local
    * pass, no shuffle; payloads never visit the driver.
    */
  def audioFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = binaryItems(df, idCol, binCol)
    implicit val enc = Encoders.product[AudioFeatures]
    typed.mapPartitions { it =>
      it.flatMap { item =>
        // null payloads normalize to empty at the typed boundary and emit
        // no row, like empty ones
        val p = orEmpty(item.payload)
        val (off, len) = WavCodec.parse(p)
          .map { case (_, o, l) => (o, l) }
          .getOrElse((0, p.length))
        val n = len / 2
        if (n == 0) None
        else {
          val xs = new Array[Int](n)
          var i = 0; var sum = 0L; var ss = 0L
          while (i < n) {
            val lo = p(off + 2 * i) & 0xff
            val hi = p(off + 2 * i + 1)
            val x = (lo | (hi << 8)).toShort.toInt
            xs(i) = x; sum += x; ss += x.toLong * x
            i += 1
          }
          var zc = 0L
          i = 1
          while (i < n) {
            if ((xs(i - 1).toLong * n - sum >= 0) !=
              (xs(i).toLong * n - sum >= 0)) zc += 1
            i += 1
          }
          Some(AudioFeatures(item.item_id, n.toLong, sum, ss, zc,
            math.sqrt(ss.toDouble / n)))
        }
      }
    }.toDF()
  }

  /** Image–text PAIR FILTERING — the LAION-style curation step (Schuhmann
    * et al. 2021: keep an (image, caption) pair only when the two encoders'
    * embeddings align above a cosine threshold). The plumbing — per-pair
    * dual embedding, cosine, threshold verdict — is the real pipeline; the
    * ENCODERS are this container's deterministic stand-ins (the image tower
    * is [[imageFeatures]]' 19 pixel/byte statistics, the text tower is the
    * feature-hashing embedding, both swappable for CLIP towers behind the
    * same (id → vector) shape). Emits every pair with its score and
    * verdict rather than silently dropping — the downstream filter (and
    * threshold sweeps) read the score column; token-less captions score
    * -Infinity with kept=false. One pass per side, one
    * equi join on the pair id; scales like any keyed join.
    */
  def pairAlignment(df: DataFrame, idCol: String, binCol: String,
      captionCol: String, threshold: Double): DataFrame = {
    import graft.operators.Similarity
    val featCols = Seq("mean_r", "mean_g", "mean_b") ++
      (for { i <- 0 to 3; j <- 0 to 3 } yield s"g$i$j")
    val ivec = imageFeatures(df.select(col(idCol), col(binCol)), idCol, binCol)
      .select(col("item_id"), array(featCols.map(col): _*).as("ivec"))
    val tvec = Similarity.hashEmbed(df.select(col(idCol), col(captionCol)),
        Seq(idCol), captionCol, dim = featCols.size)
      .select(col(idCol).as("item_id"), col("vec").as("tvec"))
    // LEFT join: a pair whose caption has no tokens (empty/whitespace/NULL
    // — exactly the broken pairs this filter exists to reject) must still
    // get a row, scored -Infinity and kept=false, not silently vanish
    ivec.join(tvec, Seq("item_id"), "left")
      .select(col("item_id"),
        when(col("tvec").isNull, lit(Double.NegativeInfinity))
          .otherwise(Similarity.cosineScore(
            Similarity.dot(col("ivec"), col("tvec")),
            Similarity.norm(col("ivec")) * Similarity.norm(col("tvec"))))
          .as("score"))
      .select(col("item_id"), col("score"),
        (col("score") >= threshold).as("kept"))
  }
}
