package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiler for the three queries BENCH_r03 showed regressing 4-7×
  * with no code change (s6_source_tagging 1.28→5.01 s, e7_distinct_keys
  * 0.47→2.95 s, e6_topk_per_group 0.38→2.70 s). Runs each in isolation in a
  * fresh warmed session, 3 repetitions, so bench-session effects (code-cache
  * pressure, GC debt from 85 earlier queries) are excluded from the
  * measurement. Not a spec — run with Test/runMain graft.ProfileRegress.
  */
object ProfileRegress {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    time("warm: events+lineitem scan")(
      Tables.events(spark, dir).count() + Tables.lineitem(spark, dir).count())
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s6_source_tagging", "e7_distinct_keys", "e6_topk_per_group")
    for (n <- names; i <- 1 to 3)
      time(s"$n run $i")(noop(SparkEntry.queries(n)(spark, dir)))
    spark.stop()
  }
}
