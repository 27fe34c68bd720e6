package graft

import org.apache.spark.sql.SparkSession

/** Round-12 verdict item 2: name the mechanism of the 100× IN-SWEEP residue
  * (g2_coshare 127–162 s in-sweep vs a 95.9 s isolated pin on the same
  * tree; j17/j18/j19 repeatedly flagged in-sweep, adjudicated back to
  * 1.8–2.3 s isolated).
  *
  * Design: one JVM per configuration, same heavy filler prefix (the rows
  * that precede g2 alphabetically in a real sweep and measured ≥60 s at
  * 100×), then the victim row:
  *   A in-sweep      — filler then victim, the Bench.timeOne hygiene
  *                     (unpersist + conditional GC) exactly as shipped;
  *   B in-sweep+reset — same, plus an aggressive between-rows reset
  *                     (clearCache, two full GCs, cleaner drain sleep);
  *   C isolated      — victim only (the REGRESS pin).
  * B≈C and A≫C names the mechanism "undrained JVM residue that an explicit
  * between-rows reset clears" (broadcast/shuffle references waiting on the
  * ContextCleaner, heap fragmentation); A≈B≫C points OFF-heap (codegen
  * cache, page cache, shuffle-dir filesystem) and needs a different probe.
  * Run one config per invocation (fresh JVM is the point):
  * Test/runMain graft.ProfileResidue <A|B|C> [victim] — dir scale_sf10. */
object ProfileResidue {

  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("A")
    val victim = args.drop(1).headOption.getOrElse("g2_coshare")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scale_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "2min"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the heavy 100× rows that run BEFORE g2_coshare in a sorted sweep
    val filler = Seq("e2_cc_incremental", "e3_lsh_ann", "g1_pagerank")

    def runRow(name: String): Double = {
      val g0 = gcMs
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // shipped Bench.timeOne hygiene
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      if (dt > 5.0) System.gc()
      println(f"[res] $mode $name $dt%.2f s (gc ${gcMs - g0} ms)")
      dt
    }

    def reset(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(2000); System.gc(); Thread.sleep(2000)
    }

    mode match {
      case "A" => filler.foreach(runRow); runRow(victim)
      case "B" => filler.foreach { n => runRow(n); reset() }; runRow(victim)
      case "C" => runRow(victim)
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
