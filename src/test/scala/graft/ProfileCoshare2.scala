package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.AnalyticsOps

/** Scratch: why is the g2 catalog row ~5× slower than ProfileCoshare's
  * equivalent query on the same fixture? Isolates each stage of the shipped
  * coshareTop(custSupp) pipeline. (Test/runMain graft.ProfileCoshare2) */
object ProfileCoshare2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale_sf1")
    val spark = GraftSession.local(32, "profile-coshare2")
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[g2b] $label: min ${ts.min}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val cs = AnalyticsOps.custSupp(spark, dir)
    timed("custSupp (repartition+dedup)")(noop(cs))

    val distinctCs = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
      .distinct()
    timed("custSupp via plain distinct")(noop(distinctCs))

    val capped = cs.withColumn("rn",
        row_number().over(Window.partitionBy("c").orderBy("sk")))
      .filter(col("rn") <= AnalyticsOps.CoshareCap).drop("rn")
    timed("capped posting list")(noop(capped))

    timed("full shipped row")(
      noop(AnalyticsOps.coshareTop(
        AnalyticsOps.cappedPostingArtifact(spark, dir,
          AnalyticsOps.CoshareCap), 1000L)))

    // same but cap window removed (join directly on cs)
    val noCap = cs.as("a").join(cs.as("b"),
        col("a.c") === col("b.c") && col("a.sk") < col("b.sk"))
      .select((shiftleft(col("a.sk"), 32) + col("b.sk")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("shared_customers"))
      .filter(col("shared_customers") >= 3)
      .select(shiftright(col("pk"), 32).as("supp_a"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("supp_b"),
        col("shared_customers"))
      .orderBy(col("shared_customers").desc, col("supp_a"), col("supp_b"))
      .limit(20)
    timed("no-cap join on custSupp")(noop(noCap))

    // capped via localCheckpoint so the self-join reads one materialization
    val cappedCk = capped.localCheckpoint()
    timed("full from checkpointed capped")(
      noop {
        val p = cappedCk.as("a").join(cappedCk.as("b"),
            col("a.c") === col("b.c") && col("a.sk") < col("b.sk"))
          .select((shiftleft(col("a.sk"), 32) + col("b.sk")).as("pk"))
          .groupBy("pk").agg(count(lit(1)).as("shared_customers"))
          .filter(col("shared_customers") >= 3)
          .select(shiftright(col("pk"), 32).as("supp_a"),
            col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("supp_b"),
            col("shared_customers"))
          .orderBy(col("shared_customers").desc, col("supp_a"), col("supp_b"))
          .limit(20)
        p
      })
    // NEGATIVE RESULT (round 8, kept for the record): a join-free
    // collect_set + pair-generator-expression plan (explode of packed-long
    // pairs straight into the aggregate) measured 13.8 s here vs 10.7 s for
    // the checkpointed join — at local[32] the 131M-row aggregation is the
    // floor regardless of how the pairs are produced, so the generator
    // expression was not shipped.
    spark.stop()
  }
}
