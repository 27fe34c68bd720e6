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

  test("a size hint pre-partitions the FIRST materialization near target") {
    import spark.implicits._
    // without the hint this 1-partition table would first materialize as
    // one fat block (the re-inflation hazard the hint exists to avoid)
    val df = (1 to 20000).toDF("i").repartition(1)
    val re = Ckpt.bounded(df, targetBytes = 64L << 10,
      sizeHintBytes = 1L << 20)
    // 1 MiB hint * SerInflation / 64 KiB target = 48 partitions up front
    assert(re.rdd.getNumPartitions == 48,
      s"hinted pre-partitioning off: ${re.rdd.getNumPartitions}")
    assert(re.count() == 20000L)
    re.unpersist()
  }

  test("sourceBytes reads real file-relation sizes and skips placeholders") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val real = new java.io.File("/root/testdata/sf0.001/documents.parquet")
      .length
    val got = Ckpt.sourceBytes(docs.select(col("doc_id")))
    // parquet leaf stats are file bytes (within metadata slack)
    assert(got > 0 && got >= real / 2 && got <= real * 2,
      s"sourceBytes $got vs files $real")
    // a checkpointed-RDD leaf copies its origin's Catalyst ESTIMATE (for a
    // join-derived plan, a children-size product) — not a real size, so it
    // must contribute nothing
    val ck = docs.limit(10).localCheckpoint(true, Ckpt.SerLevel)
    assert(Ckpt.sourceBytes(ck) == 0L, "non-file leaf not skipped")
    ck.unpersist()
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
