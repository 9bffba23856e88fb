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
