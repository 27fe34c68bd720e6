package graft

/** Dump the formatted physical plan of any catalog row against any fixture:
  * `SPARK_GRAFT_SF_DIR=<dir> sbt "Test/runMain graft.ExplainOne <q> [<q>…]"`.
  * The generic sibling of the per-row Profile*Plan tools — used for the
  * round-15 audit of the new TPC-H rows at the scale fixture. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "explain-one")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (name <- args) {
      println(s"===== $name @ $dir =====")
      queries.QueryCatalog.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
