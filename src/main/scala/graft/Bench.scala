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
    // min of two runs per query: BENCH_r03 showed three queries "regressing"
    // 4-7× that re-measured at normal speed in isolation (ProfileRegress) —
    // first-run codegen compile + transient machine load inside an 88-query
    // session. The min damps that noise; the first run still pays compile,
    // the second is the steady-state cost a cluster would see.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // optional arg (test tooling): comma-separated name prefixes to bench a
    // subset in isolation; the driver always runs with no args.
    val only = args.headOption.map(_.split(',').toSeq)
    def wanted(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => wanted(kv._1)).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink: forces full materialization of every output column
        // (a bare count() lets Spark prune the projection work away)
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val dt = times.map(_._1).min
      val ok = times.forall(_._2)
      System.err.println(f"[bench] $name%-24s $dt%8.2f s  (min of $reps)")
      (name, dt, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // failed queries are listed explicitly so a fast-failing regression can
    // never masquerade as a speedup; the total is only comparable when empty
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // the driver captures a log TAIL — BENCH_r03 lost the first ~23 per-query
    // timings to truncation. The file copy makes round-over-round comparison
    // lossless regardless of how much of stdout survives.
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write bench_out.json: $e")
    }
    spark.stop()
  }
}
