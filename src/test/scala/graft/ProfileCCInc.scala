package graft

import org.apache.spark.sql.functions._

/** Scratch: where do e2_cc_incremental's ~16 s at 10× go beyond the ~9 s
  * shared pair-finding? (Test/runMain graft.ProfileCCInc) */
object ProfileCCInc {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale_sf1")
    val spark = GraftSession.local(32, "profile-ccinc")
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccinc] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    import graft.queries.QueryCatalog
    // warm (build stores if missing)
    t("cold full row") {
      QueryCatalog.queries("e2_cc_incremental")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    t("warm full row") {
      QueryCatalog.queries("e2_cc_incremental")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    t("warm neardup row (pair finding)") {
      QueryCatalog.queries("e2_neardup_incremental")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
