package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column model (SURVEY.md §2b E5): media is carried as an opaque
  * `binary` payload column plus typed metadata, and per-item decode /
  * feature-extraction runs batch-wise over partitions.
  *
  * The decode step is REAL for raster images: [[decodeImage]] sniffs the
  * payload's magic bytes and decodes PNG/JPEG/GIF/BMP via JDK `ImageIO`
  * (javax.imageio — public platform API, zero new dependencies), returning
  * true dimensions, the container's frame count, and a grid-luminance
  * feature vector. Payloads that are not decodable images (this repo's
  * test fixtures carry text-cast blobs) fall back to [[decodeStub]], a
  * deterministic content-hash fake, so every pipeline stays reproducible
  * end-to-end with or without real media. Audio/video codecs beyond what
  * ImageIO ships (MP4/H.264, WAV beyond javax.sound) remain out of scope
  * for this container.
  */
object Multimodal {

  /** One media item: opaque payload + typed metadata. */
  case class MediaItem(media_id: Long, media_type: String,
                       payload: Array[Byte], source: String)

  /** Decoded form (stub: dims/pixels derived from a content hash). */
  case class Decoded(media_id: Long, media_type: String,
                     width: Int, height: Int, n_frames: Int,
                     feature: Array[Float])

  /** Wrap any table with a binary payload column (here: utf-8 text bytes —
    * stand-in for real image/audio blobs). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mediaType: String, sourceCol: String): Dataset[MediaItem] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit(mediaType).as("media_type"),
        col(payloadCol).cast("binary").as("payload"),
        col(sourceCol).cast("string").as("source"))
      .as[MediaItem]
  }

  /** True when the payload's leading bytes carry one of the raster-image
    * magics ImageIO ships readers for. Cheap rejection filter so the text
    * blobs the fixtures carry never pay a codec probe. */
  private[multimodal] def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') || // PNG
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) || // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||          // GIF
      (p(0) == 'B' && p(1) == 'M'))                                          // BMP

  /** Hard ceiling on declared pixel count before a full decode is attempted:
    * 64 MPix ≈ 256 MB of ARGB — large enough for any sane still image, small
    * enough that one row can never OOM an executor. Checked against the
    * HEADER dimensions (no pixel allocation) in [[decodeImage]]. */
  private[multimodal] val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** REAL image decode via JDK ImageIO: dimensions and frame count from the
    * container, feature = mean luminance over a row-major cell grid
    * (ceil(sqrt(dim)) per side, values in [0,1]) — a deterministic,
    * codec-grade per-pixel pass. Returns None when the payload is not a
    * decodable image so callers can fall back to the portable stand-in.
    *
    * ImageIO's disk cache is disabled once per JVM: a per-row decode must
    * not write a temp file per image on an executor. */
  private[multimodal] def decodeImage(payload: Array[Byte],
                                      featureDim: Int): Option[(Int, Int, Int, Array[Float])] = {
    if (!looksLikeImage(payload)) return None
    ImageIoInit.ensure()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, /*seekForwardOnly=*/ false, /*ignoreMetadata=*/ true)
        // Decompression-bomb guard: the declared dimensions come from a cheap
        // header read, BEFORE reader.read(0) allocates width*height*4 bytes.
        // A hostile payload (tiny bytes, huge declared dims) would otherwise
        // OOM the executor with an Error the handler below can't catch.
        val declaredPixels = reader.getWidth(0).toLong * reader.getHeight(0).toLong
        if (declaredPixels <= 0L || declaredPixels > MaxDecodePixels) return None
        // GIF containers report their true frame count; single-image
        // formats report 1. allowSearch=true is fine on a byte-array stream.
        val nFrames = math.max(1, reader.getNumImages(true))
        val img = reader.read(0)
        val (w, h) = (img.getWidth, img.getHeight)
        val grid = math.ceil(math.sqrt(featureDim.toDouble)).toInt.max(1)
        val feat = new Array[Float](featureDim)
        var cell = 0
        while (cell < featureDim) {
          val (cy, cx) = (cell / grid, cell % grid)
          val (x0, x1) = (cx * w / grid, ((cx + 1) * w / grid).max(cx * w / grid + 1).min(w))
          val (y0, y1) = (cy * h / grid, ((cy + 1) * h / grid).max(cy * h / grid + 1).min(h))
          var sum = 0.0; var n = 0
          var y = y0.min(h - 1)
          while (y < y1) {
            var x = x0.min(w - 1)
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              // ITU-R BT.601 luma from the sRGB channels
              sum += (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                0.114 * (rgb & 0xff)) / 255.0
              n += 1; x += 1
            }
            y += 1
          }
          feat(cell) = if (n == 0) 0.0f else (sum / n).toFloat
          cell += 1
        }
        Some((w, h, nFrames, feat))
      } finally reader.dispose()
    } catch {
      case _: java.io.IOException | _: RuntimeException => None // torn/hostile payload → stand-in
    } finally iis.close()
  }

  /** Once-per-JVM ImageIO setup (executor-side safe; idempotent). */
  private object ImageIoInit {
    @volatile private var done = false
    def ensure(): Unit = if (!done) synchronized {
      if (!done) { javax.imageio.ImageIO.setUseCache(false); done = true }
    }
  }

  /** Deterministic content-hash stand-in for payloads that are NOT decodable
    * images (the fixtures' text blobs, torn files, unsupported codecs) —
    * keyed by payload content so tests are stable and re-runs reproducible.
    * Also the portable twin the DuckDB oracle rows replay (MultimodalOps). */
  private[multimodal] def decodeStub(payload: Array[Byte],
                                     featureDim: Int): (Int, Int, Int, Array[Float]) = {
    // FNV-1a over the payload — stands in for actual pixel decoding
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h ^= payload(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    val width = 64 + (Math.floorMod(h, 448L)).toInt // 64..511
    val height = 64 + (Math.floorMod(h >>> 16, 448L)).toInt
    val nFrames = 1 + Math.floorMod(h >>> 32, 32L).toInt
    val feat = new Array[Float](featureDim)
    var s = h
    i = 0
    while (i < featureDim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      feat(i) = ((s >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f
      i += 1
    }
    (width, height, nFrames, feat)
  }

  /** Batch decode + featurize: processes rows in partition-sized batches —
    * the shape a vectorized codec UDF needs. `featureDim` fixes the output
    * embedding width. Real images (PNG/JPEG/GIF/BMP by magic bytes) decode
    * through ImageIO ([[decodeImage]]); everything else falls back to the
    * deterministic stand-in ([[decodeStub]]). The input is WIDENED when it
    * arrives narrower than the session's cores (graft.operators.WidenScan):
    * a codec is the most compute-heavy per-row work in the engine, exactly
    * the consumer the widening repartition exists for — a single-file media
    * drop must never decode on one core. */
  def decodeAndFeaturize(media: Dataset[MediaItem],
                         featureDim: Int = 16): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    graft.operators.WidenScan(media).mapPartitions { it =>
      it.map { m =>
        val (w, hgt, f, feat) = decodeImage(m.payload, featureDim)
          .getOrElse(decodeStub(m.payload, featureDim))
        Decoded(m.media_id, m.media_type, w, hgt, f, feat)
      }
    }
  }

  /** Frame sampling stub: every `stride`-th frame index up to n_frames —
    * the row-explosion shape of real video frame extraction. */
  def sampleFrames(decoded: Dataset[Decoded], stride: Int): DataFrame =
    decoded.toDF().select(col("media_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize metadata stub: target box with aspect preserved (integer math
    * only — deterministic, engine-comparable). */
  def resizePlan(decoded: Dataset[Decoded], maxSide: Int): DataFrame =
    decoded.toDF().select(col("media_id"), col("width"), col("height"),
      when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
        .otherwise(lit(maxSide) / greatest(col("width"), col("height"))
          .cast("double")).as("scale"))
}
