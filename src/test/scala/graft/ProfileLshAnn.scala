package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Scratch (round-17): stage-by-stage wall time of e3_lsh_ann at the scale
  * fixtures — the from-scratch row pinned ~97 s at 100× while the
  * identical candidate+re-rank pipeline served from the persisted index
  * (e3_lsh_store) runs 2.4 s, and the index BUILD with the compiled
  * vec_dot hashing runs ~4.5 s; this isolates where the remaining ~90 s
  * actually goes. */
object ProfileLshAnn {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale_sf1")
    val spark = GraftSession.local(32, "profile-lsh-ann")
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lshann] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val nQueries = 50
    def emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    def hashed = emb.withColumn("tb",
      explode(lshTableBuckets(col("v"), 8, 6, 64)))

    timed("hash corpus (noop)") {
      hashed.select("vec_id", "tb")
        .write.format("noop").mode("overwrite").save()
    }
    val q = hashed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("tb"))
    val candIds = broadcast(q)
      .join(hashed.select(col("vec_id"), col("tb")), Seq("tb"))
      .filter(col("q_id") =!= col("vec_id"))
      .select("q_id", "vec_id").dropDuplicates("q_id", "vec_id")
    val nCand = timed("candIds count")(candIds.count())
    println(s"[lshann] candidates=$nCand")
    timed("candIds (noop)") {
      candIds.write.format("noop").mode("overwrite").save()
    }
    timed("full lshAnnTopK (noop)") {
      graft.queries.QueryCatalog.queries("e3_lsh_ann")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    timed("full lshAnnTopK rep2 (noop)") {
      graft.queries.QueryCatalog.queries("e3_lsh_ann")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
