package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.QueryCatalog

class PlanLintSpec extends SparkSpec {

  import spark.implicits._

  private def withNoBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("detects a cartesian product between non-broadcast sides") {
    withNoBroadcast {
      val a = (1 to 100).toDF("x")
      val b = (1 to 100).toDF("y")
      val f = PlanLint.audit(a.crossJoin(b))
      assert(f.exists(_.rule == "cartesian-product"), f.mkString("; "))
    }
  }

  test("detects the theta-join BNLJ fallback, not the tiny-broadcast cross") {
    val a = (1 to 100).toDF("x")
    val b = (1 to 100).toDF("y")
    val theta = PlanLint.audit(a.join(b, col("x") < col("y")))
    assert(theta.exists(_.rule == "theta-bnlj"), theta.mkString("; "))
    // the sanctioned pattern — condition-free cross against a broadcast
    // 1-row aggregate — must stay clean
    val total = b.agg(count(lit(1)).as("n"))
    val crossed = PlanLint.audit(a.crossJoin(broadcast(total)))
    assert(!crossed.exists(_.rule == "theta-bnlj"), crossed.mkString("; "))
  }

  test("detects a global window and a single-partition shuffle") {
    val df = (1 to 100).toDF("x")
    val gw = PlanLint.audit(
      df.withColumn("rn", row_number().over(Window.orderBy("x"))))
    assert(gw.exists(_.rule == "global-window"), gw.mkString("; "))
    val sp = PlanLint.audit(df.repartition(1))
    assert(sp.exists(_.rule == "single-partition-exchange"), sp.mkString("; "))
  }

  test("detects a repeated derived subtree; checkpointed fan-out and plain " +
      "self-joins stay clean") {
    val df = (1 to 100).map(i => (i % 7, i)).toDF("k", "v")
    // one aggregate fanned into two consumers without materialization: the
    // agg subtree executes once per consumer (its exchange differs per
    // consumer context only above the agg, so stage reuse cannot help)
    val agg = df.groupBy("k").agg(sum("v").as("s"))
    val fanned = agg.filter(col("s") > 10)
      .unionAll(agg.filter(col("s") <= 10))
    val f = PlanLint.audit(fanned)
    assert(f.exists(_.rule == "repeated-derived-subtree"), f.mkString("; "))
    // the fix the rule teaches: materialize once, fan out the checkpoint
    val ck = agg.localCheckpoint(true, graft.operators.Ckpt.SerLevel)
    val fixed = PlanLint.audit(
      ck.filter(col("s") > 10).unionAll(ck.filter(col("s") <= 10)))
    assert(!fixed.exists(_.rule == "repeated-derived-subtree"),
      fixed.mkString("; "))
    ck.unpersist()
    // a plain self-join repeats only scans — the normal relational shape
    val selfJoin = PlanLint.audit(
      df.as("a").join(df.as("b"), col("a.k") === col("b.k")))
    assert(!selfJoin.exists(_.rule == "repeated-derived-subtree"),
      selfJoin.mkString("; "))
  }

  test("flagship catalog plans audit clean") {
    val dir = "/root/testdata/sf0.001"
    // rows whose contract is "no scale anti-pattern anywhere": the flagship
    // agg, the broadcast star join, the bucketed join, dedup, and the LM
    // row (its 1-row total crossJoin must read as the sanctioned pattern)
    for (name <- Seq("q1_pricing_summary", "j1_star_join_revenue",
        "j16_bucketed_revenue", "e1_dedup_exact", "e4_unigram_logprob")) {
      val f = PlanLint.audit(QueryCatalog.queries(name)(spark, dir))
      assert(f.isEmpty, s"$name flagged: ${f.mkString("; ")}")
    }
  }
}
