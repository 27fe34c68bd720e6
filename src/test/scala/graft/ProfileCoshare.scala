package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: g2_coshare superlinearity at 10× (Test/runMain) — the
  * supplier-pair group space grows ~100× (1000 → 10000 suppliers) while
  * pair rows grow 10×, so the map-side partial agg runs over a
  * near-input-cardinality key space. Head-to-head: default partial→final
  * vs explicit repartition-on-group-keys (colocated agg, no giant partial
  * tables), full query from parquet, min of 2.
  */
object ProfileCoshare {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale_sf1")
    val spark = GraftSession.local(32, "profile-coshare")
    spark.sparkContext.setLogLevel("ERROR")
    def timed(label: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[g2] $label: min ${ts.min}%.2f s  (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    def cs(s: SparkSession) = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
      .distinct()
    def pairs(s: SparkSession) = {
      val c = cs(s)
      c.as("a").join(c.as("b"),
          col("a.c") === col("b.c") && col("a.sk") < col("b.sk"))
        .select(col("a.sk").as("supp_a"), col("b.sk").as("supp_b"))
    }
    def top(df: DataFrame) = df
      .filter(col("shared_customers") >= 3)
      .orderBy(col("shared_customers").desc, col("supp_a"), col("supp_b"))
      .limit(20)

    def packed(s: SparkSession) = {
      val c = cs(s)
      c.as("a").join(c.as("b"),
          col("a.c") === col("b.c") && col("a.sk") < col("b.sk"))
        .select((shiftleft(col("a.sk"), 32) + col("b.sk")).as("pk"))
    }
    def topPacked(df: DataFrame) = df
      .filter(col("shared_customers") >= 3)
      .select(shiftright(col("pk"), 32).as("supp_a"),
        (col("pk") - shiftleft(shiftright(col("pk"), 32), 32)).as("supp_b"),
        col("shared_customers"))
      .orderBy(col("shared_customers").desc, col("supp_a"), col("supp_b"))
      .limit(20)

    timed("full: default agg")(
      top(pairs(spark).groupBy("supp_a", "supp_b")
        .agg(count(lit(1)).as("shared_customers"))).collect())

    timed("full: repartition agg")(
      top(pairs(spark).repartition(col("supp_a"), col("supp_b"))
        .groupBy("supp_a", "supp_b")
        .agg(count(lit(1)).as("shared_customers"))).collect())

    timed("full: packed-long agg")(
      topPacked(packed(spark).groupBy("pk")
        .agg(count(lit(1)).as("shared_customers"))).collect())

    timed("full: packed-long repartition agg")(
      topPacked(packed(spark).repartition(col("pk")).groupBy("pk")
        .agg(count(lit(1)).as("shared_customers"))).collect())
    spark.stop()
  }
}
