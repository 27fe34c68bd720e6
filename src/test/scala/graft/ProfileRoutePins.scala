package graft

import org.apache.spark.sql.functions._

import graft.operators.EditBlock

/** Round-13 REGRESS pins for the edit family (round-12 verdict item 6 plus
  * the per-round exact-join pin item 5 keeps): per-fixture pricing vectors
  * (one candidateStatVector action each), the route decision at the catalog
  * budget, and optionally the REAL exact join isolated (now that the
  * catalog row reads the persisted pair artifact, this probe is where the
  * exact join's cost stays on record). Run with
  * Test/runMain graft.ProfileRoutePins [pins|exact] [dirs...]. */
object ProfileRoutePins {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("pins")
    val dirs = if (args.length > 1) args.drop(1).toSeq
      else Seq("scale_sf1", "scale_sf10", "scale_rich_small", "scale_rich_big")
    val spark = GraftSession.local(32, "profile-route-pins")
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (dir <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), substring(col("text"), 1, 30).as("s"))
      println(s"[rp] $dir docs=${docs.count()}")
      mode match {
        case "pins" =>
          val vec = timed(s"$dir pricing vector") {
            EditBlock.candidateStatVector(docs, "doc_id", "s", 4)
              .orderBy("t").collect()
          }
          vec.foreach { r =>
            println(s"[rp] $dir t=${r.getAs[Int]("t")} " +
              s"candidates=${r.getAs[Long]("candidates")} " +
              s"short_pairs=${r.getAs[Long]("short_pairs")} " +
              s"n_long=${r.getAs[Long]("n_long")}")
          }
          val d = EditBlock.priceRoute(docs, "doc_id", "s", 4, 500000000L)
          println(s"[rp] $dir ROUTE=${d.route} t_used=${d.tUsed} " +
            s"priced=${d.pricedCandidates} budget=${d.budget}")
        case "exact" =>
          val n = timed(s"$dir exact nearPairs t=4") {
            EditBlock.nearPairs(docs, "doc_id", "s", 4).count()
          }
          println(s"[rp] $dir exact pairs=$n")
        case "routed" =>
          val n = timed(s"$dir nearPairsRouted") {
            EditBlock.nearPairsRouted(docs, "doc_id", "s", 4,
              500000000L, 64).count()
          }
          println(s"[rp] $dir routed pairs=$n")
        case other => sys.error(s"unknown mode $other")
      }
    }
    spark.stop()
  }
}
