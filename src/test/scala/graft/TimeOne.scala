package graft
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "time-one")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$dir/documents.parquet").count()
    for (name <- args) {
      val t0 = System.nanoTime()
      graft.queries.QueryCatalog.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[t1] $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
