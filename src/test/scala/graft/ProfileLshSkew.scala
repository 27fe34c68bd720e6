package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextFunctions._

/** Scratch: quantify LSH band-bucket skew (Test/runMain) — round-5 verdict:
  * e2_minhash_lsh is 30× at 10× docs on the driver-distribution corpus; is
  * the blow-up hot buckets, where does the wall time go stage-by-stage, and
  * how much does a lossless size-ratio prefilter on the banding join buy? */
object ProfileLshSkew {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale_sf1")
    val spark = GraftSession.local(32, "profile-lsh-skew")
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[skew] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()

    val sh = timed("sign+checkpoint")(
      signatureTable(docs, 64, 5).localCheckpoint())
    println(s"[skew] docs=$nDocs signed=${sh.count()}")

    val bands = 8; val rows = 8
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        struct((0 until rows).map(r =>
          col("mh").getItem(b * rows + r).as(s"r$r")): _*).as("sig"))
    }
    val buckets = sh.select(col("doc_id"), size(col("shset")).as("sz"),
      explode(array(bandCols: _*)).as("bucket"))

    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val nCand = timed("cand join+dedup")(cand.count())

    // lossless prefilter: jaccard >= t  ⟹  min(|A|,|B|) >= t·max(|A|,|B|)
    val t = 0.8
    val candF = buckets.as("a").join(buckets.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")).cast(DoubleType) >=
            lit(t) * greatest(col("a.sz"), col("b.sz")) - lit(1e-9))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val nCandF = timed("cand join+dedup+szfilter")(candF.count())
    println(s"[skew] candidates: unfiltered=$nCand szfiltered=$nCandF")

    val out = minhashLshPairs(docs, 64, 8, 5, 0.8)
    val nOut = timed("full minhashLshPairs")(out.count())
    println(s"[skew] verified pairs(out)=$nOut")
    spark.stop()
  }
}
