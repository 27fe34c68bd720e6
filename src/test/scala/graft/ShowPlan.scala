package graft

/** Scratch: print the executed plan of catalog queries (Test/runMain). */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "show-plan")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (name <- args) {
      println(s"===== $name")
      println(graft.queries.QueryCatalog.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
