package graft

/** Scratch: PlanLint over the whole catalog (Test/runMain graft.LintAll). */
object LintAll {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "lint-all")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for ((name, fn) <- graft.queries.QueryCatalog.queries.toSeq.sortBy(_._1)) {
      val fs = try graft.plans.PlanLint.audit(fn(spark, dir))
        catch { case e: Throwable => println(s"$name ERROR $e"); Nil }
      fs.foreach(f => println(s"$name $f"))
    }
    spark.stop()
  }
}
