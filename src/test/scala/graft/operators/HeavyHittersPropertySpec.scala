package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style invariants over seeded random streams (the battery
  * PropertySpec idiom): the operator must equal the naive groupBy-HAVING
  * answer on ANY input, under ANY partitioning; the merged summary's
  * undercount must respect the N/(k+1) mergeable-summaries bound (the fact
  * the streaming superset guarantee rests on).
  */
class HeavyHittersPropertySpec extends SparkSpec {

  import spark.implicits._

  private val rng = new scala.util.Random(4242)

  /** Zipf-ish stream: key i drawn with weight ~ 1/(i+1). */
  private def stream(n: Int, keys: Int): Seq[String] = {
    val weights = (0 until keys).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    Seq.fill(n) {
      val x = rng.nextDouble() * total
      s"k${cum.indexWhere(x <= _)}"
    }
  }

  test("equals the naive groupBy answer on random zipf streams and partitionings") {
    for (trial <- 1 to 5) {
      val data = stream(n = 2000 + trial * 500, keys = 40 + trial * 10)
      val f = Seq(0.01, 0.02, 0.05)(trial % 3)
      val df = data.toDF("k").repartition(1 + rng.nextInt(16))
      val got = HeavyHitters.heavyHitters(df, col("k"), f)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val counts = data.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val want = counts.filter(_._2 > f * data.size)
      assert(got == want,
        s"trial $trial (f=$f, n=${data.size}): got $got want $want")
    }
  }

  test("merged summaries respect the N/(k+1) undercount bound") {
    for (trial <- 1 to 5) {
      val k = 20 + trial * 10
      val batches = Seq.fill(4 + trial)(stream(500, 30 + trial * 5))
      val truth = batches.flatten.groupBy(identity)
        .map { case (key, v) => (key, v.size.toLong) }
      val n = batches.map(_.size).sum
      val merged = batches.foldLeft(Map.empty[String, Long]) { (acc, b) =>
        val summary = b.groupBy(identity)
          .map { case (key, v) => (key, v.size.toLong) }
        HeavyHitters.mergeSummaries(acc, summary, k)
      }
      assert(merged.size <= k, s"trial $trial: ${merged.size} > k=$k")
      val bound = n.toDouble / (k + 1)
      for ((key, true_n) <- truth) {
        val est = merged.getOrElse(key, 0L)
        assert(est <= true_n, s"trial $trial: overcount for $key")
        assert(true_n - est <= bound + 1e-9,
          s"trial $trial: $key undercount ${true_n - est} > bound $bound")
      }
    }
  }
}
