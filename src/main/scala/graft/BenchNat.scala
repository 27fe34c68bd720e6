package graft

import org.apache.spark.sql.SparkSession

/** Natural-vocabulary scale-curve bench for the near-dup family
  * (SURVEY §11.1 / §12.3).
  *
  * The driver `documents` table draws from a closed 31-word vocabulary, which
  * is pathological for similarity operators: ~30% of ALL doc pairs share
  * ≥0.2 Jaccard, so candidate-bound operators go superlinear for corpus
  * reasons, not algorithmic ones. This main measures the same catalog
  * queries on zipf-10k-vocabulary corpora (`scripts/make_natural.py`) at two
  * scale points — 5k and 50k docs (10×) — and prints ONE JSON line with
  * per-query seconds at each point plus the 10× time ratio. On natural text
  * the LSH/simhash family should scale near-linearly (ratio ≈ 10× work on
  * 32 cores → wall ratio well under ~6×, per §12.3); the driver-corpus
  * blow-ups recorded in BENCH10 are the corpus, not the plan.
  *
  * Timing protocol matches [[Bench]]: min of 2 runs per query per corpus,
  * result fully consumed via a noop sink, and (round-16) the same
  * prior-aware outlier re-rep — when `SPARK_GRAFT_BENCH_PRIOR` names the
  * prior round's BENCH_NAT json, any leg whose min exceeds 1.5× its
  * committed prior (and by >1 s) gets ONE extra rep after the whole sweep,
  * and legs STILL over land in `outliers_vs_prior` — so all four bench
  * surfaces self-adjudicate in-sweep residue instead of costing manual
  * isolated pins. */
object BenchNat {
  // documents-only members of the dedup family (the incremental variants
  // maintain persisted stores keyed to the driver fixture and are excluded)
  private val family = Seq(
    "e1_dedup_exact", "e2_neardup_hash", "e2_minhash_lsh", "e2_simhash",
    "e2_simhash_md5", "e2_dup_ngrams", "e2_span_dedup", "e2_ngram_jaccard",
    "e2_containment", "e2_cc_clusters", "e2_dedup_report",
    "e2_edit_distance", "e2_edit_blocked",
    // round-12: the pricing row and the routed entry point — on natural
    // text the statistic prices the join near-linear and the route stays
    // "exact" at the requested t (the driver-corpus step-down in
    // BENCH100_r12 is the 31-word vocabulary, not the operator)
    "e2_edit_candidates", "e2_edit_routed")

  def main(args: Array[String]): Unit = {
    val small = sys.env.getOrElse("SPARK_GRAFT_NAT_SMALL", "/root/repo/scale_rich_small")
    val big = sys.env.getOrElse("SPARK_GRAFT_NAT_BIG", "/root/repo/scale_rich_big")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      // noop sink, same consumption protocol as Bench: a bare count()
      // lets Spark prune final projection/orderBy work, which would
      // understate per-query cost vs the BENCH10 artifacts
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def time(name: String, dir: String): Either[String, Vector[Double]] =
      try Right((1 to 2).map(_ => timeOnce(name, dir)).toVector)
      catch { case e: Throwable => Left(e.getClass.getSimpleName) }

    // prior legs from the previous round's committed BENCH_NAT json:
    // name -> (small_s, big_s)
    // legs parsed independently: a half-failed prior row
    // ('"small_s":12.3,"big_s":"OOMError"') still arms the re-rep for the
    // leg that did record a number
    val prior: Map[String, (Option[Double], Option[Double])] =
      sys.env.get("SPARK_GRAFT_BENCH_PRIOR").flatMap { p =>
        try {
          val txt = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(p)), "UTF-8")
          def num(s: String): Option[Double] =
            try Some(s.toDouble) catch { case _: NumberFormatException => None }
          Some(""""([^"]+)":\{"small_s":([0-9.eE+-]+|"[^"]*"),"big_s":([0-9.eE+-]+|"[^"]*")""".r
            .findAllMatchIn(txt)
            .map(m => m.group(1) -> (num(m.group(2)), num(m.group(3))))
            .toMap)
        } catch { case e: Throwable =>
          System.err.println(s"[benchnat] could not read prior bench $p: $e")
          None
        }
      }.getOrElse(Map.empty)
    if (sys.env.contains("SPARK_GRAFT_BENCH_PRIOR") && prior.isEmpty)
      System.err.println(
        "[benchnat] WARNING: SPARK_GRAFT_BENCH_PRIOR set but no prior " +
        "timings parsed — outlier re-rep pass is DISABLED this run")
    def over(min: Double, p: Double): Boolean = min > p * 1.5 && min - p > 1.0

    var rows = family.map(q => (q, time(q, small), time(q, big)))
    // post-sweep outlier re-rep (one extra timing on a leg whose min beats
    // its prior by the Bench rule, after neighboring-row pressure is gone);
    // a failed extra rep KEEPS the two valid sweep timings (the failure is
    // usually residue from neighboring rows — the very thing being
    // adjudicated) and is reported in rerep_failed rather than flipping a
    // measured leg to an error
    val rerepFailed = scala.collection.mutable.ArrayBuffer.empty[String]
    def rerep(q: String, leg: String, dir: String, runs: Vector[Double],
        p: Double): Either[String, Vector[Double]] =
      if (!over(runs.min, p)) Right(runs)
      else try {
        val t = timeOnce(q, dir)
        System.err.println(f"[benchnat] $q%-20s $t%8.2f s  (outlier re-rep; prior $p%.2f)")
        Right(runs :+ t)
      } catch { case e: Throwable =>
        System.err.println(
          s"[benchnat] $q $leg re-rep failed (${e.getClass.getSimpleName}); " +
          "keeping the sweep timings")
        rerepFailed += s""""$q.$leg":"${e.getClass.getSimpleName}""""
        Right(runs)
      }
    if (prior.nonEmpty) {
      rows = rows.map { case (q, s, b) =>
        val p = prior.get(q)
        val s2 = (s, p) match {
          case (Right(runs), Some((Some(ps), _))) => rerep(q, "small", small, runs, ps)
          case _ => s
        }
        val b2 = (b, p) match {
          case (Right(runs), Some((_, Some(pb)))) => rerep(q, "big", big, runs, pb)
          case _ => b
        }
        (q, s2, b2)
      }
    }
    val outliers = rows.flatMap { case (q, s, b) =>
      val so = for { runs <- s.toOption; (pso, _) <- prior.get(q); ps <- pso
        if over(runs.min, ps) } yield
        f""""$q.small":{"prior":$ps%.3f,"min":${runs.min}%.3f}"""
      val bo = for { runs <- b.toOption; (_, pbo) <- prior.get(q); pb <- pbo
        if over(runs.min, pb) } yield
        f""""$q.big":{"prior":$pb%.3f,"min":${runs.min}%.3f}"""
      so.toSeq ++ bo.toSeq
    }.mkString("{", ",", "}")
    def num(d: Double) = f"$d%.3f"
    val parts = rows.map { case (q, s, b) =>
      val ratio = for { sv <- s; bv <- b } yield bv.min / sv.min
      def leg(e: Either[String, Vector[Double]]) =
        e.fold(err => "\"" + err + "\"", runs => num(runs.min))
      def reps(e: Either[String, Vector[Double]]) =
        e.fold(_ => "[]", _.map(num).mkString("[", ",", "]"))
      s""""$q":{"small_s":${leg(s)},"big_s":${leg(b)},""" +
        s""""x10_ratio":${ratio.fold(_ => "null", num)},""" +
        s""""small_reps":${reps(s)},"big_reps":${reps(b)}}"""
    }
    val line = s"""{"metric":"natural_10x","unit":"sec","small":"$small","big":"$big","queries":{${parts.mkString(",")}},"outliers_vs_prior":$outliers,"rerep_failed":${rerepFailed.mkString("{", ",", "}")}}"""
    println(line)
    // lossless capture regardless of how much stdout the driver keeps
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_nat_out.json"), (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[benchnat] could not write bench_nat_out.json: $e")
    }
    spark.stop()
  }
}
