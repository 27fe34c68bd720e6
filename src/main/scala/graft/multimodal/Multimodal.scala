package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column model (SURVEY.md §2b E5): media is carried as an opaque
  * `binary` payload column plus typed metadata, and per-item decode /
  * feature-extraction runs batch-wise over partitions.
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs, so
  * [[decodeStub]] produces a deterministic fake (content-hash-seeded bytes and
  * dimensions). Everything around it is the real Spark plumbing — schema,
  * partition-preserving batch iteration, fixed-dimension feature output —
  * exactly what a libjpeg/ffmpeg-backed implementation would slot into.
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

  /** ??? in spirit: the codec call. Deterministic fake keyed by payload
    * content so tests are stable and re-runs are reproducible. */
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
    * embedding width. The input is WIDENED when it arrives narrower than
    * the session's cores (graft.operators.WidenScan): a codec is the most
    * compute-heavy per-row work in the engine, exactly the consumer the
    * widening repartition exists for — a single-file media drop must never
    * decode on one core. */
  def decodeAndFeaturize(media: Dataset[MediaItem],
                         featureDim: Int = 16): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    graft.operators.WidenScan(media).mapPartitions { it =>
      it.map { m =>
        val (w, hgt, f, feat) = decodeStub(m.payload, featureDim)
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
