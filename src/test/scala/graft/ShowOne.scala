package graft

/** Print a catalog query's result (test tooling; Test/runMain graft.ShowOne
  * <name> [n]). Complements TimeOne, which only times against a noop sink. */
object ShowOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "show-one")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    graft.queries.QueryCatalog.queries(args(0))(spark, dir)
      .show(n, truncate = false)
    spark.stop()
  }
}
