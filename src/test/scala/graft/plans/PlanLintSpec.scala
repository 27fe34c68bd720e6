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
