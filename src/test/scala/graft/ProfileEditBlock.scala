package graft

import org.apache.spark.sql.functions._

import graft.operators.EditBlock

/** Scratch: where do e2_edit_blocked's 61 s at 10× go (Test/runMain)?
  * Segment-join fanout, pair multiplicity (same pair via several
  * segments), levenshtein count, output size — on the pathological
  * 31-word-vocabulary corpus. */
object ProfileEditBlock {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale_sf1")
    val spark = GraftSession.local(32, "profile-editblock")
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[eb] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val t = 4; val k = t + 1
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), substring(col("text"), 1, 30).as("s"))
    println(s"[eb] docs=${docs.count()}")

    // replicate nearPairs' internals to count stage cardinalities
    val par = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val s = docs.select(col("doc_id").as("id"), col("s"),
      length(col("s")).as("n")).filter(col("s").isNotNull)
      .repartition(par, col("id")).localCheckpoint()

    val si = explode(sequence(lit(0), lit(t))).as("si")
    def segStart(m: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (lit(1) + i * floor(m / k).cast("int") + least(i, m % k)).cast("int")
    def segLen(m: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (floor(m / k).cast("int") +
        when(i < m % k, lit(1)).otherwise(lit(0))).cast("int")

    val long = s.filter(col("n") > t)
    val idx = long.select(col("id").as("id_b"), col("s").as("s_b"),
        col("n").as("m"), si)
      .select(col("id_b"), col("s_b"), col("m"), col("si"),
        col("s_b").substr(segStart(col("m"), col("si")),
          segLen(col("m"), col("si"))).as("seg"))
      .filter(length(col("seg")) > 0)
    println(s"[eb] idx rows=${timed("idx count")(idx.count())}")

    val lens = long.select(col("n").as("m")).distinct()
    val probe = s.join(broadcast(lens), abs(col("n") - col("m")) <= t)
      .select(col("id").as("id_a"), col("s").as("s_a"), col("n"), col("m"), si)
      .withColumn("st", segStart(col("m"), col("si")))
      .withColumn("ln", segLen(col("m"), col("si")))
      .withColumn("lo", greatest(lit(1), col("st") - t))
      .withColumn("hi", least(col("n") - col("ln") + 1, col("st") + t))
      .filter(col("ln") > 0 && col("lo") <= col("hi"))
      .select(col("id_a"), col("s_a"), col("m"), col("si"), col("ln"),
        explode(sequence(col("lo"), col("hi"))).as("p"))
      .select(col("id_a"), col("s_a"), col("m"), col("si"),
        col("s_a").substr(col("p"), col("ln")).as("seg"))
    println(s"[eb] probe rows=${timed("probe count")(probe.count())}")

    val blocked = probe.join(idx, Seq("m", "si", "seg"))
      .filter(col("id_a") =!= col("id_b"))
    val nBlocked = timed("blocked join count")(blocked.count())
    val nPairs = timed("blocked distinct pairs")(blocked
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .distinct().count())
    println(s"[eb] blocked rows=$nBlocked distinctPairs=$nPairs mult=${nBlocked.toDouble / nPairs}")

    // hot segment keys
    val hot = idx.groupBy("m", "si", "seg").agg(count(lit(1)).as("nb"))
    hot.orderBy(col("nb").desc).limit(8).collect()
      .foreach(r => println(s"[eb]   hot idx key n=${r.getLong(3)}"))

    val out = timed("full nearPairs")(
      EditBlock.nearPairs(docs, "doc_id", "s", t).count())
    println(s"[eb] out pairs=$out")
    spark.stop()
  }
}
