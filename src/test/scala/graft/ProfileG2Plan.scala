package graft

object ProfileG2Plan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "g2-plan")
    spark.sparkContext.setLogLevel("ERROR")
    val df = queries.QueryCatalog.queries("g2_coshare")(spark, "/root/testdata/sf0.01")
    df.explain("formatted")
    spark.stop()
  }
}
