package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm shared codegen/IO paths once (parquet scan, window, hash agg) so
    // the first measured query doesn't absorb all JIT/compile cost
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      spark.read.parquet(s"$sfDir/events.parquet").limit(2000)
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("ts")))
        .groupBy("event_type").agg(count(lit(1)), sum("value"))
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      // a broken warm-up means every query below pays JIT/compile cost —
      // never let that skew round-over-round comparison silently
      System.err.println(s"[bench] WARM-UP FAILED (timings will run cold): $e")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: forces full materialization of every output column
      // (a bare count() lets Spark prune the projection work away)
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s")
      (name, dt, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // failed queries are listed explicitly so a fast-failing regression can
    // never masquerade as a speedup; the total is only comparable when empty
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
