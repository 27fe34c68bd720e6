package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.md5Hash60
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.Decoded

/** Driver-checked catalog rows for the multimodal surface (SURVEY.md §2b
  * E5): the real [[Multimodal]] operators (frame sampling, resize planning)
  * run against a PORTABLE stand-in decode, so DuckDB can replay the full
  * pipeline and hash-check it.
  *
  * The production decode path ([[Multimodal.decodeStub]]'s FNV-seeded fake,
  * standing in for libjpeg/ffmpeg) stays engine-side — its 64-bit wrapping
  * arithmetic has no DuckDB spelling — and is covered by MultimodalSpec.
  * Here the SAME operators consume dimensions derived from the md5Hash60
  * family (the e2_simhash_md5 companion pattern): the operator logic, row
  * explosion shape, and schema get full driver rows; only the codec fake
  * differs. Both ops are per-row / map-side — no shuffle at any scale.
  */
object MultimodalOps {

  /** Portable "decoded media" table: dimensions/frame counts derived from a
    * DuckDB-replayable content hash; feature vector empty (unused by the
    * layout ops under test). */
  private def decodedPortable(s: SparkSession, dir: String) = {
    import s.implicits._
    val h = md5Hash60(col("text"))
    // No WidenScan here: the PORTABLE stand-in is one md5 per row —
    // hash-grade work that can't use the parallelism a widening repartition
    // buys (it cost these rows 2-3× at sf0.1, round-10 watch item). The
    // REAL decode path wraps its input in WidenScan where the codec runs
    // (Multimodal.decodeStub call sites): a production codec is the most
    // compute-heavy per-row work in the engine and must never be
    // single-threaded by a narrow scan.
    Tables.documents(s, dir).select(
        col("doc_id").as("media_id"),
        lit("video").as("media_type"),
        (lit(64) + pmod(h, lit(448L))).cast("int").as("width"),
        (lit(64) + pmod(shiftright(h, 16), lit(448L))).cast("int").as("height"),
        (lit(1) + pmod(shiftright(h, 32), lit(32L))).cast("int").as("n_frames"),
        array().cast("array<float>").as("feature"))
      .as[Decoded]
  }

  private val hSql = graft.functions.TextFunctions.md5Hash60Sql("text")

  val defs: Seq[QueryDef] = Seq(

    // E5b: video frame sampling — every stride-th frame index per item, the
    // row-explosion shape of real frame extraction (1 row in, n_frames/stride
    // rows out, partition-preserving).
    QueryDef("mm_frame_sample",
      (s, dir) => Multimodal.sampleFrames(decodedPortable(s, dir), stride = 4)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"))
        .orderBy("media_id", "frame_idx"),
      Some(s"""WITH d AS (SELECT doc_id AS media_id,
            1 + (($hSql >> 32) % 32) AS n_frames
          FROM documents)
        SELECT media_id, unnest(generate_series(0, n_frames - 1, 4)) AS frame_idx
        FROM d ORDER BY media_id, frame_idx""")),

    // E5c: resize planning — aspect-preserving scale factor into a 256-box
    // (the metadata half of an image resize; the pixel half slots into the
    // decode stub). Pure per-row math.
    QueryDef("mm_resize_plan",
      (s, dir) => Multimodal.resizePlan(decodedPortable(s, dir), maxSide = 256)
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(col("scale"), 6).as("scale"))
        .orderBy("media_id"),
      Some(s"""WITH d AS (SELECT doc_id AS media_id,
            64 + ($hSql % 448) AS width,
            64 + (($hSql >> 16) % 448) AS height
          FROM documents)
        SELECT media_id, width, height,
          round(CASE WHEN greatest(width, height) <= 256 THEN CAST(1 AS DOUBLE)
            ELSE CAST(256 AS DOUBLE) / greatest(width, height) END, 6) AS scale
        FROM d ORDER BY media_id"""))
  )
}
