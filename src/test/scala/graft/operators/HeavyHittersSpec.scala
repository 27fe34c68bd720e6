package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  /** Zipf-ish fixture: keys "h0".."h4" hot (600..1000 rows each), 5000
    * unique cold keys — key cardinality ~ row count, the regime the
    * operator exists for.
    */
  private def fixture = {
    val hot = (0 until 5).flatMap(i => Seq.fill(600 + 100 * i)(s"h$i"))
    val cold = (0 until 5000).map(i => s"c$i")
    (hot ++ cold).toDF("k")
  }

  test("finds exactly the keys above threshold, with exact counts") {
    val total = 600 + 700 + 800 + 900 + 1000 + 5000 // 9000
    val got = HeavyHitters.heavyHitters(fixture, col("k"), 0.05)
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // threshold 0.05·9000 = 450: all five hot keys pass, every cold key fails
    assert(got.toSeq == Seq(("h0", 600L, total.toLong), ("h1", 700L, total.toLong),
      ("h2", 800L, total.toLong), ("h3", 900L, total.toLong),
      ("h4", 1000L, total.toLong)))
  }

  test("result is independent of input partitioning (MG nominates, exact pass decides)") {
    // the Misra-Gries candidate SET is partition-dependent; the confirmed
    // result must not be — superset guarantee + exact confirmation
    val runs = Seq(1, 3, 17).map { p =>
      HeavyHitters.heavyHitters(fixture.repartition(p), col("k"), 0.05)
        .orderBy("key").collect().map(_.toSeq).toSeq
    }
    assert(runs.distinct.size == 1,
      s"heavy-hitter results diverged across input partitionings: $runs")
  }

  test("a frequent NULL key is confirmed like any other group") {
    // review finding: null keys were counted into n_total but could never
    // join the candidate set — a frequent null was silently dropped,
    // diverging from the groupBy/HAVING baseline. Null must now surface as
    // a (null, n, total) row, and n_total must still count every row.
    val df = ((0 until 300).map(_ => null: String) ++
      Seq.fill(250)("h0") ++ (0 until 450).map(i => s"c$i")).toDF("k")
    val got = HeavyHitters.heavyHitters(df, col("k"), 0.2)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set((None, 300L, 1000L), (Some("h0"), 250L, 1000L)),
      s"null-key handling diverged from the groupBy baseline: $got")
  }

  test("a key just under threshold is rejected even when nominated") {
    // h0 at exactly the threshold boundary must be excluded (strict >)
    val df = (Seq.fill(50)("h0") ++ (0 until 950).map(i => s"c$i")).toDF("k")
    val got = HeavyHitters.heavyHitters(df, col("k"), 0.05)
      .collect().map(_.getString(0))
    assert(got.isEmpty, s"50/1000 = exactly 5% must fail strict >: ${got.toSeq}")
  }
}
