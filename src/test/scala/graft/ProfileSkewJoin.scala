package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler answering the round-6 verdict's item 6: when does j4's
  * MANUAL salting earn its complexity over AQE's zero-code skew-join split?
  * (Not a spec — run with Test/runMain graft.ProfileSkewJoin.)
  *
  * Fixture: a 20M-row fact table with one pathological key holding 40% of
  * all rows (the power-law hot key), joined to a 100k-row dimension.
  * Broadcast is disabled throughout — the scenario where skew matters is
  * precisely the one where the dimension is too large to broadcast, so a
  * broadcast plan would be measuring a different question.
  *
  * Variants, each min-of-2 warm:
  *   plain/off   — shuffle join, AQE skew handling disabled (the pathology)
  *   plain/aqe   — shuffle join, AQE skewJoin on (runtime partition split)
  *   salt/8,32   — operators.SkewOps.saltedEquiJoin (deterministic salt,
  *                 dimension replicated ×buckets)
  * Each is measured twice: bare join (noop sink) and join + aggregate on a
  * NON-join column — the shape j4 actually ships, and the one where AQE's
  * split must survive a downstream distribution requirement.
  */
object ProfileSkewJoin {

  def time[A](label: String)(f: => A): Double = {
    val t0 = System.nanoTime()
    f
    val dt = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[prof] $label%-34s $dt%8.2f s")
    dt
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-skewjoin")
    spark.sparkContext.setLogLevel("WARN")
    val conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val nFact = 20000000L
    val nHot = 8000000L
    val nDim = 100000L
    val fact = spark.range(nFact).select(
      when(col("id") < nHot, lit(7L))
        .otherwise(pmod(xxhash64(col("id")), lit(nDim))).as("k"),
      col("id").as("v")).localCheckpoint()
    val dim = spark.range(nDim).select(col("id").as("k"),
      pmod(col("id"), lit(97L)).as("grp"),
      (col("id") * 3).as("w")).localCheckpoint()

    def plain = fact.join(dim, "k").select(col("v"), col("grp"), col("w"))
    def salted(b: Int) = graft.operators.SkewOps
      .saltedEquiJoin(fact, dim, "k", col("v"), buckets = b)
      .select(col("v"), col("grp"), col("w"))
    def agg(df: DataFrame) =
      df.groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sv"))

    def skew(on: Boolean): Unit = {
      conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)
      // let AQE split even when a downstream requirement would veto it —
      // without this the join+agg variant silently keeps the skewed plan
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", on.toString)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("plain/skew-off", () => { skew(false); plain }),
      ("plain/aqe-skew", () => { skew(true); plain }),
      ("salt/8", () => { skew(false); salted(8) }),
      ("salt/32", () => { skew(false); salted(32) }))

    // warm codegen/shuffle paths
    noop(plain.limit(1000))
    val rows = variants.map { case (name, mk) =>
      val bare = (1 to 2).map(_ => time(s"$name bare-join")(noop(mk()))).min
      val agged = (1 to 2).map(_ => time(s"$name join+agg")(noop(agg(mk())))).min
      (name, bare, agged)
    }
    println("| variant | bare join s | join+agg s |")
    println("|---|---|---|")
    rows.foreach { case (n, b, a) => println(f"| $n | $b%.2f | $a%.2f |") }
    spark.stop()
  }
}
