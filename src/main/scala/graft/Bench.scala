package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Cumulative JVM GC time — per-query deltas go into bench_out.json so a
    * round-over-round "regression" caused by collector pressure (round-5:
    * ~30 s of driver-bench drift on queries with no code change) is
    * diagnosable from the committed artifact instead of needing a rerun. */
  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // safety net under the targeted post-row GC below: the cleaner's own
      // periodic GC defaults to 30 min — longer than an entire 100x leg
      .config("spark.cleaner.periodicGC.interval", "2min"))
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
    // min of N runs per query: BENCH_r03 showed three queries "regressing"
    // 4-7× that re-measured at normal speed in isolation (ProfileRegress) —
    // first-run codegen compile + transient machine load inside a 150-query
    // session. The min damps that noise; the first run still pays compile,
    // later runs are the steady-state cost a cluster would see.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // optional arg (test tooling): comma-separated name prefixes to bench a
    // subset in isolation; the driver always runs with no args.
    val only = args.headOption.map(_.split(',').toSeq)
    def wanted(name: String): Boolean =
      only.forall(_.exists(name.startsWith))

    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Long, Boolean) = {
      val g0 = gcMs
      val t0 = System.nanoTime()
      // noop sink: forces full materialization of every output column
      // (a bare count() lets Spark prune the projection work away)
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = ((System.nanoTime() - t0) / 1e9, gcMs - g0, ok)
      // each catalog row is an INDEPENDENT query: once its result is
      // written, the localCheckpoint blocks its plan pinned are dead, but
      // nothing in the session releases them (the operator cannot — the
      // caller's DataFrame was still live). ~150 rows of leaked blocks
      // accumulate until a late data-sized row OOMs on the residue (the
      // 100x probe: g1's END-OF-SESSION decile re-rep failed where its own
      // fresh-state reps passed). Released OUTSIDE the timed window:
      // cross-row warm state lives in /tmp parquet (signature stores,
      // quantizers), never in block-store references — every memo cache in
      // main source holds scalars only.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // Broadcast blocks (build-side hash relations, dim tables) are freed
      // only when the ContextCleaner processes their weak references; under
      // the sustained allocation pressure of a data-sized row the cleaner
      // lags by whole rows. That residue — not checkpoint blocks — is what
      // pushed g2_coshare over the 8 GB protocol heap in the combined 100x
      // leg after two 90 s e3_lsh_ann reps (its isolated leg passed; the
      // context died, instant-failing every later row). One explicit GC
      // after an expensive rep lets the cleaner drain before the next row;
      // cheap reps — the entire sf0.1 driver leg — never pay the ~0.1 s.
      if (dt._1 > 5.0) System.gc()
      // Round-13 residue bisect (ProfileResidue, one JVM per config): a GC
      // CALL is not a cleaner DRAIN — the weak-reference queue is processed
      // by the cleaner thread AFTER the GC, and the next data-sized row
      // re-pressures the heap before it finishes, so residue compounds
      // across the 100x top tier (g2_coshare: 124 s in-sweep under the
      // gc-only hygiene — one attempt died outright — vs 108 s with a
      // drained reset vs 103 s isolated on the same session). For rows
      // heavy enough to matter, pay ~4 s for the full drain: drop cached
      // plans, GC, give the cleaner wall time, GC the now-unreferenced
      // blocks. The sf0.1 leg (every row sub-2 s) never triggers this.
      if (dt._1 > 30.0) {
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(2000); System.gc()
      }
      dt
    }

    case class Res(name: String, runs: Vector[(Double, Long)], ok: Boolean) {
      def min: Double = runs.map(_._1).min
      // GC of the min-time rep — the steady-state number the min reports
      def gcOfMin: Long = runs.minBy(_._1)._2
    }
    // spec-only twins (no driver oracle — their gate is PartsuppOpsSpec)
    // bench alongside the catalog when the fixture carries their table:
    // the scale fixtures grow a partsupp; the driver testdata does not
    val extras: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      if (new java.io.File(s"$sfDir/partsupp.parquet").exists())
        Map(
          "ps1_min_cost_full" -> ((s: SparkSession, d: String) =>
            graft.queries.PartsuppOps.q2MinCostSupplier(s, d)),
          "ps2_excess_stock_full" -> ((s: SparkSession, d: String) =>
            graft.queries.PartsuppOps.q20ExcessStock(s, d)))
      else Map.empty
    val qmap = SparkEntry.queries ++ extras
    val catalog = qmap.toSeq.sortBy(_._1)
      .filter(kv => wanted(kv._1))
    var results = catalog.map { case (name, fn) =>
      val rs = (1 to reps).map(_ => timeOne(name, fn)).toVector
      val r = Res(name, rs.map(t => (t._1, t._2)), rs.forall(_._3))
      System.err.println(
        f"[bench] ${r.name}%-24s ${r.min}%8.2f s  (min of $reps, gc ${r.gcOfMin}%d ms)")
      r
    }
    // sub-2s rows get a THIRD rep (round-8 verdict: quantify the ±25%
    // ambient noise floor instead of narrating it): min-of-3 on the cheap
    // rows costs ~a minute of extra session time and, together with the
    // per-rep record in `rep_times` below, lets a cross-round diff tell
    // drift (all reps moved) from noise (one rep spiked) without a
    // ProfileRegress session.
    // an extra rep must carry its ok flag: a failed rep's (fast) elapsed
    // time in `runs` could become the reported min while the row stays out
    // of `failed` — the fast-failing-regression-as-speedup case the min
    // protocol exists to prevent. A failed extra rep flips the row to
    // failed instead of contributing a phantom time.
    def addRep(r: Res, t: (Double, Long, Boolean)): Res =
      if (t._3) r.copy(runs = r.runs :+ ((t._1, t._2)))
      else r.copy(ok = false)
    if (reps > 1) {
      results = results.map { r =>
        if (r.ok && r.min < 2.0)
          addRep(r, timeOne(r.name, qmap(r.name)))
        else r
      }
    }
    // the slowest decile gets ONE extra rep at the END of the session: the
    // round-5 driver bench inflated ~40% with no code change, concentrated
    // in a few expensive queries — a late re-measure after ambient load from
    // neighboring queries has passed gives the min a second chance to see
    // steady state (and the committed per-rep record shows the spread).
    // Deliberately NOT gated on reps > 1: the min-of-1 100× sweeps are
    // where in-sweep residue is worst (round-11 measured 1.4–1.9× between
    // in-sweep and isolated min-of-3 on the heaviest rows), so the flagged
    // decile must carry ≥2 reps even there — rep_times keeps both numbers,
    // making the in-sweep-vs-steady-state delta part of the artifact.
    // A heavy re-rep must START drained, not only end drained: the r16
    // 100× sweep OOMed the 8g protocol heap on g1_pagerank's END-OF-SESSION
    // decile re-rep — each preceding heavy re-rep drained after itself, but
    // the broadcast residue of the rows BETWEEN drains still accumulated,
    // and a data-sized row beginning on a dirty heap died mid-task. The
    // pre-drain costs ~4 s only on rows already known to run >30 s.
    def drainBefore(r: Res): Unit =
      if (r.min > 30.0) {
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(2000); System.gc()
      }
    if (results.nonEmpty) {
      val cutoff = results.map(_.min).sorted.reverse
        .take(math.max(1, results.size / 10)).last
      results = results.map { r =>
        if (r.min >= cutoff && r.ok) {
          drainBefore(r)
          val t = timeOne(r.name, qmap(r.name))
          System.err.println(
            f"[bench] ${r.name}%-24s ${t._1}%8.2f s  (decile re-rep)")
          addRep(r, t)
        } else r
      }
    }
    // prior-aware outlier re-rep (round-14 verdict): four min-of-1 join rows
    // cost an isolated-pin adjudication each, purely from in-sweep residue
    // (REGRESS_r14 join_rows_in_sweep_residue: j19 read 6.4× its isolated
    // time IN the sweep). When SPARK_GRAFT_BENCH_PRIOR names the prior
    // round's committed bench JSON, any row whose min exceeds 1.5× its
    // committed prior (and by >1 s absolute — cheap-row flutter is not an
    // outlier) gets ONE extra rep after the whole sweep has passed, when
    // neighboring-row pressure is gone. Rows STILL over after the re-rep
    // land in `outliers_vs_prior` in the output JSON — the adjudication
    // list is machine-made; rep_times carries both readings.
    val prior: Map[String, Double] = sys.env.get("SPARK_GRAFT_BENCH_PRIOR")
      .flatMap { p =>
        try {
          val txt = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(p)), "UTF-8")
          """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt).map { m =>
            """"([^"]+)":([0-9.eE+-]+)""".r.findAllMatchIn(m.group(1))
              .map(g => g.group(1) -> g.group(2).toDouble).toMap
          }
        } catch { case e: Throwable =>
          System.err.println(s"[bench] could not read prior bench $p: $e")
          None
        }
      }.getOrElse(Map.empty)
    // A parse miss (format drift, nested "queries") silently disables the
    // outlier pass — make that failure mode visible in the session log.
    if (sys.env.contains("SPARK_GRAFT_BENCH_PRIOR") && prior.isEmpty)
      System.err.println(
        "[bench] WARNING: SPARK_GRAFT_BENCH_PRIOR set but no prior timings " +
        "parsed — outlier re-rep pass is DISABLED this run")
    def overPrior(r: Res): Option[Double] =
      prior.get(r.name).filter(p => r.ok && r.min > p * 1.5 && r.min - p > 1.0)
    if (prior.nonEmpty) {
      results = results.map { r =>
        overPrior(r) match {
          case Some(p) =>
            drainBefore(r)
            val t = timeOne(r.name, qmap(r.name))
            System.err.println(
              f"[bench] ${r.name}%-24s ${t._1}%8.2f s  (outlier re-rep; prior $p%.2f)")
            addRep(r, t)
          case None => r
        }
      }
    }
    val outliers = results.flatMap(r => overPrior(r).map(p =>
        f""""${r.name}":{"prior":$p%.3f,"min":${r.min}%.3f}"""))
      .mkString("{", ",", "}")
    def jmap(f: Res => String): String =
      results.map(r => s"\"${r.name}\":${f(r)}").mkString("{", ",", "}")
    val qs = jmap(_.min.toString)
    val gc = jmap(_.gcOfMin.toString)
    val repCounts = jmap(_.runs.size.toString)
    // every rep on the record: the min is the headline, the spread is the
    // noise floor (a row whose reps read [0.5, 2.1, 0.5] was noise; one
    // reading [2.1, 2.0, 2.2] drifted)
    val repTimes = jmap(r =>
      r.runs.map(t => f"${t._1}%.3f").mkString("[", ",", "]"))
    // warm/cold split for the incremental rows: rep 1 pays the
    // build-if-missing cost of the persisted /tmp/graft_sigstore artifacts
    // (the stand-in for last night's close); the warm min is the true
    // incremental cost — both go on the record so the incremental claim is
    // a committed number, not an average of two different things.
    val inc = results.filter(r => r.name.contains("_incremental") && r.runs.size > 1)
      .map { r =>
        val cold = r.runs.head._1
        val warm = r.runs.tail.map(_._1).min
        s"\"${r.name}\":{\"cold\":$cold,\"warm\":$warm}"
      }.mkString("{", ",", "}")
    val failed = results.collect { case r if !r.ok => s"\"${r.name}\"" }
      .mkString("[", ",", "]")
    val total = results.map(_.min).sum
    // failed queries are listed explicitly so a fast-failing regression can
    // never masquerade as a speedup; the total is only comparable when empty
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"gc_ms":$gc,"reps":$repCounts,"rep_times":$repTimes,"incremental":$inc,"failed":$failed,"outliers_vs_prior":$outliers,"sf":"$sfDir"}"""
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
