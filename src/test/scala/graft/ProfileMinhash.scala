package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Scratch profiler for the e2_minhash_lsh critical path (not a spec —
  * run with Test/runMain graft.ProfileMinhash). */
object ProfileMinhash {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    // warm the scan
    time("warm: docs scan count")(docs.count())

    val shingled = docs.select(col("doc_id"), shingles(col("text"), 5).as("shset"))
      .filter(size(col("shset")) > 0)
    time("shingles only -> noop")(noop(shingled))
    val withSig = shingled.select(col("doc_id"), col("shset"),
      graft.expressions.MinHashSig(col("shset"), 64).as("mh"))
    time("shingles + kernel sig -> noop")(noop(withSig))
    val explodeSig = {
      val ex = shingled.select(col("doc_id"), explode(col("shset")).as("s"))
        .withColumn("h", xxhash64(col("s")))
      // constants identical to the kernel's
      def sm(seed: Long): Long = {
        var z = seed + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      val aggs = (0 until 64).map(i =>
        min(col("h") * (sm(2L * i) | 1L) + sm(2L * i + 1)).as(s"m$i"))
      ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    }
    time("shingles + explode sig -> noop")(noop(explodeSig))

    (1 to 2).foreach { i =>
      time(s"full minhashLshPairs run $i")(
        noop(minhashLshPairs(docs, 64, 8, 5, 0.8)))
    }

    // phase split: checkpoint vs downstream
    val base = time("phase: checkpoint(shset+mh)")(
      shingled.select(col("doc_id"), col("shset"),
        graft.expressions.MinHashSig(col("shset"), 64).as("mh"))
        .localCheckpoint())
    time("phase: banding+join+rerank")(noop {
      val bands = 8; val rows = 8
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          struct((0 until rows).map(r =>
            col("mh").getItem(b * rows + r).as(s"r$r")): _*).as("sig"))
      }
      val buckets = base.select(col("doc_id"), explode(array(bandCols: _*)).as("bucket"))
      val cand = buckets.as("a").join(buckets.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
      val setsA = base.select(col("doc_id").as("doc_a"), col("shset").as("sa"))
      val setsB = base.select(col("doc_id").as("doc_b"), col("shset").as("sb"))
      cand.join(setsA, "doc_a").join(setsB, "doc_b")
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("sa")) + size(col("sb")) - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    })
    spark.stop()
  }
}
