package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Scratch profiler for the e2_simhash critical path (not a spec — run with
  * Test/runMain graft.ProfileSimhash [plain]). Splits the vote aggregation
  * from the bucket join and counts candidates, to attribute superlinear
  * scaling between the two.
  */
object ProfileSimhash {
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
    time("warm: docs scan count")(docs.count())

    val hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      md5Hash60(_)
    val exploded = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), hashFn(col("t")).as("h"))
    time("token explode + md5 hash -> noop")(noop(exploded))
    val bitAggs = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"v_$b")
    }
    val votes = exploded.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    time("votes (64 sums) -> noop")(noop(votes))
    val sh64c = (0 until 64).map { b =>
      when(col(s"v_$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val d = time("checkpoint (doc_id, sh64)")(docs.select(col("doc_id"))
      .join(votes, Seq("doc_id"), "left")
      .select(col("doc_id"), sh64c.as("sh64"))
      .localCheckpoint())

    def complement48(k: Int) = k match {
      case 0 => shiftrightunsigned(col("sh64"), 16)
      case 3 => col("sh64").bitwiseAND(lit((1L << 48) - 1))
      case _ =>
        col("sh64").bitwiseAND(lit((1L << (16 * k)) - 1)).bitwiseOR(
          shiftleft(shiftrightunsigned(col("sh64"), 16 * (k + 1)), 16 * k))
    }
    val plain = args.contains("plain")
    val bandStructs =
      if (!plain) for { k <- 0 until 4; j <- 0 until 4 } yield
        struct(lit(k).as("k"),
          shiftright(col("sh64"), k * 16).bitwiseAND(0xFFFFL).as("chunk"),
          lit(j).as("j"),
          shiftrightunsigned(complement48(k), j * 12)
            .bitwiseAND(0xFFFL).as("sub"))
      else (0 until 4).map { k =>
        struct(lit(k).as("k"),
          shiftright(col("sh64"), k * 16).bitwiseAND(0xFFFFL).as("chunk"))
      }
    val buckets = d.select(col("doc_id"), col("sh64"),
      explode(array(bandStructs: _*)).as("bucket"))
    val joined = buckets.as("a").join(buckets.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh64").as("ha"), col("b.sh64").as("hb"))
    val nJoined = time("bucket join raw count")(joined.count())
    val cand = joined.dropDuplicates("doc_a", "doc_b")
    val nCand = time("distinct candidates count")(cand.count())
    val out = cand.withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= 3)
    val nOut = time("hamming<=3 result count")(out.count())
    System.err.println(s"[prof] joined=$nJoined cand=$nCand out=$nOut " +
      s"mode=${if (plain) "plain" else "sub-banded"}")
    spark.stop()
  }
}
