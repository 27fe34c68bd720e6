package graft
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch: compare plain vs persisted-edges PageRank (Test/runMain). */
object ProfilePR {
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
    for (mode <- Seq("plain", "persist", "plain", "persist")) {
      val t0 = System.nanoTime()
      val e = if (mode == "persist") edges.persist(StorageLevel.MEMORY_ONLY) else edges
      graft.operators.PageRank.ranks(e, 3)
        .write.format("noop").mode("overwrite").save()
      println(f"[pr] $mode ${(System.nanoTime()-t0)/1e9}%.2f s")
      if (mode == "persist") e.unpersist(blocking = true)
    }
    spark.stop()
  }
}
