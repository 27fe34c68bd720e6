package graft.queries

import graft.SparkSpec
import graft.operators.Upsert
import org.apache.spark.sql.functions._

/** Semantic contracts for the round-4 curation/history operators that the
  * oracle rows alone can't pin: SCD-2 interval tiling, shard-assignment
  * totality, MAD robustness, and the bigram-LM zero-surprise identity.
  */
class CurationOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("scd2 intervals tile each key: contiguous, one current row, no row lost") {
    import spark.implicits._
    val changes = Seq(
      (1L, 10L, 100L, 1.0), (1L, 20L, 101L, 2.0), (1L, 30L, 102L, 3.0),
      (2L, 15L, 103L, 4.0),
      (3L, 10L, 104L, 5.0), (3L, 10L, 105L, 6.0) // same-ts tie → id order
    ).toDF("k", "v_from", "id", "v")
    val out = Upsert.scd2(changes, Seq("k"), Seq("v_from", "id"),
      validTo = "v_to").collect()
    assert(out.length == changes.count(), "scd2 must keep every change row")
    val byKey = out.groupBy(_.getLong(0))
    for ((k, rows) <- byKey) {
      val sorted = rows.sortBy(r => (r.getLong(1), r.getLong(2)))
      // exactly the last row per key is current (open-ended)
      assert(sorted.dropRight(1).forall(!_.isNullAt(4)), s"key $k: hole")
      assert(sorted.last.isNullAt(4), s"key $k: no current row")
      assert(sorted.map(_.getInt(5)).sum == 1, s"key $k: is_current count")
      // each interval ends where the next one starts (tiling, no overlap)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) == b.getLong(1),
            s"key $k: interval ${a.getLong(4)} != next from ${b.getLong(1)}")
        case _ =>
      }
    }
  }

  test("shuffle shards partition the corpus: every doc in exactly one shard") {
    val out = QueryCatalog.queries("e8_shuffle_shards")(spark, dir).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    val docs = graft.Tables.documents(spark, dir).count()
    assert(total == docs, s"shards hold $total of $docs docs")
    assert(out.map(_.getAs[Long]("shard")).distinct.length == out.length)
    // the hash spreads: no shard may hold more than 3x its fair share
    val fair = docs.toDouble / out.length
    assert(out.forall(_.getAs[Long]("n_docs") <= 3 * fair),
      "a shard is pathologically hot — the order hash is not spreading")
  }

  test("MAD gate flags a gross outlier that a mean/stddev fence would absorb") {
    import spark.implicits._
    // 99 well-behaved values + one 1e6 spike: median/MAD flags exactly the
    // spike; the spike itself cannot drag the threshold (robustness — the
    // property that distinguishes MAD from z-score)
    val vals = (1 to 99).map(i => ("a", 10.0 + (i % 7))) :+ (("a", 1e6))
    val df = vals.toDF("event_type", "value")
    val med = df.groupBy("event_type").agg(median(col("value")).as("med"))
    val dev = df.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type").agg(median(col("adev")).as("mad"))
    val n = dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("adev") > lit(3.0) * lit(1.4826) * col("mad"))
      .count()
    assert(n == 1, s"expected exactly the spike flagged, got $n")
  }

  test("bigram LM scores a deterministic corpus with zero surprise") {
    import spark.implicits._
    // a corpus whose every bigram is fully predictive (P(w2|w1)=1 for all
    // observed pairs) must yield NLL exactly 0 for every document
    val docs = Seq((0L, "a b c a b c a b c"), (1L, "a b c")).toDF("doc_id", "text")
    import graft.functions.TextFunctions.tokens
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "w1")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bg = tok.withColumn("w2", lead("w1", 1).over(w))
      .filter(col("w2").isNotNull).select("doc_id", "w1", "w2")
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val nll = bg.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .agg(sum(round(-log(col("c2").cast("double") / col("c1")) * 1e6, 0))
        .as("nll"))
      .collect()(0).getDouble(0)
    assert(nll == 0.0, s"fully predictive corpus must score NLL 0, got $nll")
  }
}
