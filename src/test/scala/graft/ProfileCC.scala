package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the connected-components loop (run by hand:
  * `sbt "Test/runMain graft.ProfileCC"`); not part of the suite. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-cc")
    val dir = "/root/testdata/sf0.1"
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    import graft.queries.QueryCatalog
    t("warm") { spark.read.parquet(s"$dir/documents.parquet").count() }
    t("full e2_cc_clusters") {
      QueryCatalog.queries("e2_cc_clusters")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // piecewise
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 500)
    val sh = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.shingles(col("text"), 5)).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs0 = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard", col("inter").cast("double")
        / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.3)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val e = t("edges checkpoint") { pairs0.localCheckpoint() }
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
    var labels = t("labels init") {
      sym.groupBy(col("a").as("id"))
        .agg(min(col("b")).as("nbr_min"))
        .select(col("id"), least(col("id"), col("nbr_min")).as("label"))
        .localCheckpoint()
    }
    var changed = 1L
    var it = 1
    while (changed > 0 && it < 25) {
      val next = t(s"round $it checkpoint") {
        val nbrMin = sym.join(labels, sym("a") === labels("id"))
          .groupBy(col("b").as("nid"))
          .agg(min("label").as("nbr_min"))
        labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
          .select(col("id"), col("label").as("old"),
            least(col("label"), coalesce(col("nbr_min"), col("label")))
              .as("label"))
          .localCheckpoint()
      }
      changed = t(s"round $it count") {
        next.filter(col("label") =!= col("old")).count()
      }
      labels = next.select("id", "label")
      it += 1
    }
    t("final sizes+join") {
      val sizes2 = labels.groupBy(col("label").as("l"))
        .agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes2, labels("label") === sizes2("l"))
        .select(col("id"), col("label"), col("cluster_size"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
