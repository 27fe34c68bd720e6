package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Ckpt.bounded]] — the block-granularity-bounded checkpoint that closed
  * the 100× probe's g1 OOM (disk-evicted serialized blocks re-inflate as
  * ONE whole buffer per task on re-read, so block size must be bounded, not
  * just the storage level).
  */
class CkptSpec extends SparkSpec {

  test("bounded re-lays-out a checkpoint whose blocks exceed the target") {
    import spark.implicits._
    // ~6 MB of serialized rows in ONE partition; a 64 KB target makes the
    // single fat block exceed 2x target by orders of magnitude
    val fat = (1 to 60000).toDF("i")
      .select(col("i"), concat_ws("", Seq.fill(10)(md5(col("i").cast("string"))): _*).as("pad"))
      .repartition(1)
    val re = Ckpt.bounded(fat, targetBytes = 64L << 10)
    assert(re.rdd.getNumPartitions > 1,
      s"fat single-block checkpoint not re-laid-out: ${re.rdd.getNumPartitions}")
    assert(re.count() == 60000L)
    re.unpersist()
  }

  test("bounded is a no-op when blocks are already under target") {
    import spark.implicits._
    val slim = (1 to 1000).toDF("i").repartition(4)
    val re = Ckpt.bounded(slim)
    assert(re.rdd.getNumPartitions == 4,
      s"under-target checkpoint was repartitioned: ${re.rdd.getNumPartitions}")
    assert(re.count() == 1000L)
    re.unpersist()
  }

  test("bounded preserves rows and values exactly across the re-layout") {
    import spark.implicits._
    val df = (1 to 50000).toDF("i")
      .select(col("i"), concat_ws("", Seq.fill(8)(sha2(col("i").cast("string"), 256)): _*).as("pad"))
      .repartition(2)
    val re = Ckpt.bounded(df, targetBytes = 64L << 10)
    val got = re.agg(sum("i"), count(lit(1))).head()
    assert(got.getLong(0) == 50000L * 50001L / 2 && got.getLong(1) == 50000L)
    re.unpersist()
  }
}
