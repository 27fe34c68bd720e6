package graft

import org.apache.spark.sql.functions._

/** A/B the j22 (Q11-shape) threshold gate: catalog form (per-part aggregate
  * consumed twice — once re-aggregated into the one-row scalar, once as the
  * join probe; AQE may or may not reuse the shuffle stage) vs an explicitly
  * checkpointed per-part table (one lineitem scan by construction). */
object ProfileJ22 {
  private def dec(c: String) = col(c).cast("decimal(18,6)")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-j22")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale_sf10")
    import graft.functions.Carriers.micros

    def pvPlain = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(micros(sum((dec("l_extendedprice") * (lit(1) - dec("l_discount")))
        .cast("decimal(28,12)"))).as("value_micros"))

    def gate(pv: org.apache.spark.sql.DataFrame) = {
      val total = pv.agg(sum("value_micros").as("total_micros"),
        count(lit(1)).as("n_parts"))
      pv.join(broadcast(total))
        .filter(col("value_micros").cast("decimal(38,0)") * col("n_parts") * 5 >
          col("total_micros").cast("decimal(38,0)") * 6)
        .select(col("l_partkey"), col("value_micros"))
        .orderBy(col("value_micros").desc, col("l_partkey"))
    }

    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"[j22] $tag rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    time("catalog (pv twice)") { gate(pvPlain) }
    time("checkpointed pv   ") {
      val pv = graft.operators.Ckpt.bounded(pvPlain)
      val out = gate(pv)
      out
    }
    spark.stop()
  }
}
