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
  * tiers; extending to audio/video means adding a codec, not a pipeline.
  *
  * Scale notes: decode is embarrassingly parallel and partition-local (no
  * shuffle); binary payloads stay off the driver; at 100 TB the only knobs
  * are `spark.sql.files.maxPartitionBytes` (bound batch memory) and
  * repartitioning upstream if payload sizes are skewed.
  */
object Multimodal {

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
      * every `stride`-th fake frame boundary.
      */
    def frameOffsets(payload: Array[Byte], stride: Int): Seq[Long] =
      (0L until payload.length.toLong by stride.toLong).toSeq
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
      val iis = javax.imageio.ImageIO.createImageInputStream(
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
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))).map { src =>
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

  /** Batch decode with codec autodetection: real ImageIO decode where a
    * reader claims the payload, [[StubCodec]] metadata otherwise — the
    * production shape (decode what you can, quarantine-flag what you
    * can't) with the same partition-local batching as [[decodeItems]].
    */
  def decodeItemsAuto(items: Dataset[BinaryItem]): Dataset[DecodedItemEx] = {
    implicit val enc = Encoders.product[DecodedItemEx]
    items.mapPartitions { it =>
      it.map { item =>
        ImageIoCodec.decode(item.payload) match {
          case Some(m) => DecodedItemEx(item.item_id, item.payload.length.toLong,
            m.width, m.height, m.channels, m.format, real_decode = true)
          case None =>
            val m = StubCodec.decode(item.payload)
            DecodedItemEx(item.item_id, item.payload.length.toLong,
              m.width, m.height, m.channels, m.format, real_decode = false)
        }
      }
    }
  }

  /** DataFrame-level entry for [[decodeItemsAuto]]. */
  def decodeAuto(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(idCol).cast("long").as("item_id"),
      col(binCol).as("payload")).as[BinaryItem]
    decodeItemsAuto(typed).toDF()
  }

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
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(idCol).cast("long").as("item_id"),
      col(binCol).as("payload")).as[BinaryItem]
    implicit val enc = Encoders.product[ImageFeatures]
    typed.mapPartitions { it =>
      it.map { item =>
        val g = Array.ofDim[Double](16)
        var (sr, sg, sb) = (0.0, 0.0, 0.0)
        var real = false
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(item.payload)))
          catch { case scala.util.control.NonFatal(_) => None }
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
            while (i < 16) { g(i) = sliceMean(n * i / 16, n * (i + 1) / 16); i += 1 }
        }
        ImageFeatures(item.item_id, real, sr, sg, sb,
          g(0), g(1), g(2), g(3), g(4), g(5), g(6), g(7),
          g(8), g(9), g(10), g(11), g(12), g(13), g(14), g(15))
      }
    }.toDF()
  }

  /** Batch decode: one pass per partition, typed output. The inner loop is
    * an iterator transform — constant memory per partition regardless of
    * corpus size.
    */
  def decodeItems(items: Dataset[BinaryItem]): Dataset[DecodedItem] = {
    implicit val enc = Encoders.product[DecodedItem]
    items.mapPartitions { it =>
      it.map { item =>
        val m = StubCodec.decode(item.payload)
        DecodedItem(item.item_id, item.payload.length.toLong,
          m.width, m.height, m.channels, m.format)
      }
    }
  }

  /** DataFrame-level entry: binary column + id → decoded metadata table. */
  def decode(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(idCol).cast("long").as("item_id"),
      col(binCol).as("payload")).as[BinaryItem]
    decodeItems(typed).toDF()
  }

  /** Decode + resize in one partition pass: (item_id, resized byte count,
    * target dims, original dims) — the shape of a thumbnailing stage in a
    * training-data pipeline (stub pixel math, real Spark plumbing).
    */
  def resize(df: DataFrame, idCol: String, binCol: String,
      w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(idCol).cast("long").as("item_id"),
      col(binCol).as("payload")).as[BinaryItem]
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
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(idCol).cast("long").as("item_id"),
      col(binCol).as("payload")).as[BinaryItem]
    typed.flatMap(item => StubCodec.frameOffsets(item.payload, stride)
        .map(off => (item.item_id, off)))
      .toDF("item_id", "frame_offset")
  }
}
