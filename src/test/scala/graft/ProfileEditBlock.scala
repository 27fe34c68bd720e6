package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for e2_edit_blocked's stages (Test/runMain). */
object ProfileEditBlock {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "prof-editblock")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val t = 4
    val k = t + 1
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), substring(col("text"), 1, 30).as("s"))
    time("warm scan")(docs.count())

    val s = docs.select(col("doc_id").as("id"), col("s"),
      length(col("s")).as("n")).filter(col("s").isNotNull)
    val long = s.filter(col("n") > t)
    def segStart(m: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (lit(1) + i * floor(m / k).cast("int") + least(i, m % k)).cast("int")
    def segLen(m: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (floor(m / k).cast("int") + when(i < m % k, lit(1)).otherwise(lit(0))).cast("int")
    val si = explode(sequence(lit(0), lit(t))).as("si")
    val idx = long.select(col("id").as("id_b"), col("n").as("m"), si, col("s"))
      .select(col("id_b"), col("m"), col("si"),
        col("s").substr(segStart(col("m"), col("si")), segLen(col("m"), col("si"))).as("seg"))
      .filter(length(col("seg")) > 0)
    val lens = long.select(col("n").as("m")).distinct()
    val probe = s.join(broadcast(lens), abs(col("n") - col("m")) <= t)
      .select(col("id").as("id_a"), col("s"), col("n"), col("m"), si)
      .withColumn("st", segStart(col("m"), col("si")))
      .withColumn("ln", segLen(col("m"), col("si")))
      .withColumn("lo", greatest(lit(1), col("st") - t))
      .withColumn("hi", least(col("n") - col("ln") + 1, col("st") + t))
      .filter(col("ln") > 0 && col("lo") <= col("hi"))
      .select(col("id_a"), col("m"), col("si"),
        explode(expr("array_distinct(transform(sequence(lo, hi), " +
          "p -> substring(s, p, ln)))")).as("seg"))

    time("probe count")(println(probe.count()))
    time("idx count")(println(idx.count()))
    val raw = probe.join(idx, Seq("m", "si", "seg"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    time("raw join count")(println(raw.count()))
    val cand = raw.distinct()
    time("cand distinct count")(println(cand.count()))
    val strs = s.select(col("id"), col("s"))
    val rer = cand
      .join(strs.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(strs.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= t)
    time("rerank count")(println(rer.count()))
    time("full query")(graft.queries.QueryCatalog.queries("e2_edit_blocked")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
