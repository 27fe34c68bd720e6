package graft
import org.apache.spark.sql.functions._
object ProfileSimKernel {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-sim")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/repo/scale_rich_big/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dKernel = docs.select(col("doc_id"),
      graft.expressions.SimhashSig(coalesce(col("text"), lit("")), false).as("sh64"))
      .repartition(col("doc_id"))
      .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
    val exploded = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitAggs = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"v_$b") }
    val votes = exploded.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val sh64e = (0 until 64).map { b =>
      when(col(s"v_$b") > 0, lit(1L << b)).otherwise(lit(0L)) }.reduce(_ + _)
    val dStaged = docs.select(col("doc_id")).join(votes, Seq("doc_id"), "left")
      .select(col("doc_id"), sh64e.as("sh64"))
      .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
    println(s"parts kernel=${dKernel.rdd.getNumPartitions} staged=${dStaged.rdd.getNumPartitions}")
    def run(tag: String, d: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = graft.functions.TextFunctions.simhashPairsFromSig(d, 3).count()
      println(s"$tag pairs=$n in ${(System.nanoTime()-t0)/1e9}s")
    }
    run("kernel", dKernel); run("staged", dStaged)
    run("kernel", dKernel); run("staged", dStaged)
    spark.stop()
  }
}
