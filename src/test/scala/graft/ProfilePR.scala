package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch: isolate-measure PageRank variants (Test/runMain) — round-5
  * verdict: the driver bench read g1 at 10.84 s vs 2.87 s in the builder's
  * session; settle the checkpoint choice on measurements, not assumption.
  *
  * Variants:
  *  - plain      — current operator: re-derive e⋈deg lineage every round,
  *                 no checkpoints
  *  - rank_ckpt  — localCheckpoint the rank table each round (CC's pattern)
  *  - ed_hoist   — hoist the iteration-invariant e⋈deg join out of the loop
  *                 and localCheckpoint it once; each round is then ONE join
  *  - hoist_ckpt — both
  */
object ProfilePR {

  def variant(edges: DataFrame, iterations: Int, hoist: Boolean,
      ckptRound: Boolean): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    var r = deg.select(col("src").as("id"), lit(1000000L).as("rank"))
    if (!hoist) {
      for (_ <- 1 to iterations) {
        val contrib = edges.join(deg, "src")
          .join(r, col("src") === col("id"))
          .select(col("dst"), expr("rank div d").as("contrib"))
          .groupBy("dst").agg(sum("contrib").as("s"))
        r = deg.select(col("src").as("id"))
          .join(contrib, col("id") === col("dst"), "left")
          .select(col("id"),
            (lit(150000L) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
        if (ckptRound) r = r.localCheckpoint()
      }
    } else {
      val ed = edges.join(deg, "src")
        .select(col("src"), col("dst"), col("d")).localCheckpoint()
      val ids = ed.select(col("src").as("vid")).distinct().localCheckpoint()
      r = ids.select(col("vid").as("id"), lit(1000000L).as("rank"))
      for (_ <- 1 to iterations) {
        val contrib = ed.join(r, col("src") === col("id"))
          .select(col("dst"), expr("rank div d").as("contrib"))
          .groupBy("dst").agg(sum("contrib").as("s"))
        r = ids.select(col("vid").as("id"))
          .join(contrib, col("id") === col("dst"), "left")
          .select(col("id"),
            (lit(150000L) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
        if (ckptRound) r = r.localCheckpoint()
      }
    }
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-pr")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def pairs = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("s"))
      .distinct()
    def edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    // warm
    edges.write.format("noop").mode("overwrite").save()
    val variants = Seq(
      ("plain", false, false), ("rank_ckpt", false, true),
      ("ed_hoist", true, false), ("hoist_ckpt", true, true))
    for (rep <- 1 to 2; (name, hoist, ck) <- variants) {
      val t0 = System.nanoTime()
      variant(edges, 3, hoist, ck)
        .write.format("noop").mode("overwrite").save()
      println(f"[pr] rep$rep $name%-10s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // sanity: all variants agree with the shipped operator
    val base = graft.operators.PageRank.ranks(edges, 3)
      .orderBy("id").collect().toSeq
    for ((name, hoist, ck) <- variants) {
      val v = variant(edges, 3, hoist, ck).orderBy("id").collect().toSeq
      println(s"[pr] $name matches operator: ${v == base}")
    }
    spark.stop()
  }
}
