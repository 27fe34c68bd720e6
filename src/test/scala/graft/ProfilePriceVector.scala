package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for round-13 verdict item 3: what does the pricing
  * statistic itself cost, single-τ vs the all-τ vector? Run with
  * Test/runMain graft.ProfilePriceVector. */
object ProfilePriceVector {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scale_sf1")
    val spark = GraftSession.local(32, "profile-price-vector")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), substring(col("text"), 1, 30).as("s"))
      .localCheckpoint()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[pv] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (i <- 1 to 3) {
      time(s"candidateStat t=4      rep$i") {
        graft.operators.EditBlock.candidateStat(docs, "doc_id", "s", 4)
          .collect()
      }
      time(s"candidateStatVector t<=4 rep$i") {
        graft.operators.EditBlock.candidateStatVector(docs, "doc_id", "s", 4)
          .collect()
      }
    }
    spark.stop()
  }
}
