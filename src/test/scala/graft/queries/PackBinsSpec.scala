package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The distributed two-phase prefix sum behind e8_pack_bins must be
  * value-identical to the naive one-window-partition-per-language
  * formulation it replaced (which is the obviously-correct spec, just not
  * scalable). Any chunking bug — offset off-by-one, chunk boundary split,
  * non-deterministic ordering — shows up as a bin count diff here.
  */
class PackBinsSpec extends SparkSpec {

  test("two-phase pack-bins equals the single-window formulation") {
    val dir = "/root/testdata/sf0.01"
    val naive = {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(spark, dir)
        .withColumn("cum", sum("n_chars").over(w))
        .withColumn("bin", floor((col("cum") - col("n_chars")) / 4096))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
    }
    val a = naive.collect().map(_.toSeq).toSet
    assert(a.nonEmpty)
    // catalog chunking (degenerates to one chunk at this SF) AND a tiny
    // chunk that forces ~8 chunks per language with real nonzero offsets
    for (chunk <- Seq(8192L, 64L)) {
      val b = StreamShaped.packBins(Tables.documents(spark, dir), chunk)
        .collect().map(_.toSeq).toSet
      assert(a == b, s"chunkDocs=$chunk diverged")
    }
  }
}
