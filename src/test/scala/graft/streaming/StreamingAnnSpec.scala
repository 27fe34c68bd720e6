package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.VectorOps

/** Parity contract for streaming IVF index maintenance: a posting store
  * fed micro-batch by micro-batch against the frozen trained quantizer
  * must equal the from-scratch batch assignment, and the served top-k must
  * be byte-identical to the batch e3_ivf_ann result. The two checks pin
  * the two layers (assign-and-append ingest, store-backed serving)
  * independently, so a regression localizes. */
class StreamingAnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val (nlist, trainIters, nQueries, k, nprobe) = (16, 2, 50, 3, 4)

  test("stream-fed posting store and served top-k equal the batch build") {
    val embRaw = Tables.embeddings(spark, dir).localCheckpoint()
    val maxId = embRaw.agg(max("vec_id")).head().getLong(0)
    val cuts = Seq(maxId / 3, 2 * maxId / 3, maxId + 1)
    // the same frozen quantizer artifact the batch e3_ivf_ann serves from
    val cents = VectorOps
      .persistedTrainedCentroids(spark, dir, nlist, trainIters)

    val inputDir = java.nio.file.Files
      .createTempDirectory("graft_stream_ann").toString
    val state = AnnStreaming.emptyState(embRaw)
    val q = AnnStreaming.runIvfIngestStream(spark, inputDir, embRaw.schema,
      state, cents)
    try {
      var lo = -1L
      for ((hi, i) <- cuts.zipWithIndex) {
        embRaw.filter(col("vec_id") > lo && col("vec_id") <= hi)
          .coalesce(1).write.mode("append").parquet(inputDir)
        q.processAllAvailable()
        lo = hi
        // the store grows by exactly the vectors seen so far
        val expect = embRaw.filter(col("vec_id") <= hi).count()
        assert(state.postings.count() == expect,
          s"posting store size diverged after micro-batch ${i + 1}")
      }

      // 1) posting store == one batch assignment of the whole corpus
      val batchAssign = VectorOps
        .nearestCentroid(VectorOps.prepEmb(embRaw), cents)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val streamAssign = state.postings.select("vec_id", "cluster")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamAssign == batchAssign)

      // 2) serving from the maintained store == the batch e3_ivf_ann plan
      val batchTopK = VectorOps.ivfAnnTopK(spark, dir, nQueries, k,
          nlist, nprobe, trainIters)
        .collect().map(_.toSeq).toSeq
      val servedTopK = AnnStreaming
        .serveTopK(state, cents, nQueries, k, nprobe)
        .collect().map(_.toSeq).toSeq
      assert(batchTopK.nonEmpty, "batch IVF produced no neighbors")
      assert(servedTopK == batchTopK)
    } finally q.stop()
  }

  test("stream-APPENDED on-disk store serves byte-identically to the batch-built store") {
    val embRaw = Tables.embeddings(spark, dir).localCheckpoint()
    val maxId = embRaw.agg(max("vec_id")).head().getLong(0)
    val cuts = Seq(maxId / 3, 2 * maxId / 3, maxId + 1)
    val cents = VectorOps
      .persistedTrainedCentroids(spark, dir, nlist, trainIters)
    val inputDir = java.nio.file.Files
      .createTempDirectory("graft_stream_annstore_in").toString
    val storePath = java.nio.file.Files
      .createTempDirectory("graft_stream_annstore").toString + "/store"
    val state = new AnnStreaming.StoreAppendState
    val q = AnnStreaming.runIvfStoreAppendStream(spark, inputDir,
      embRaw.schema, storePath, state, cents)
    try {
      var lo = -1L
      for (hi <- cuts) {
        embRaw.filter(col("vec_id") > lo && col("vec_id") <= hi)
          .coalesce(1).write.mode("append").parquet(inputDir)
        q.processAllAvailable()
        lo = hi
      }
      // the appended layout is the partitioned-store contract: hive-style
      // cluster= directories, never a rewrite of earlier files
      val parts = new java.io.File(storePath).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cluster="))
      assert(parts.length > 1, s"expected cluster= directories at $storePath")
      // serving the stream-appended store == serving the batch-built store
      // (same plan: VectorOps.serveFromStorePath), which VectorSpec already
      // holds byte-equal to the from-scratch e3_ivf_ann
      val queries = VectorOps.prepEmb(embRaw).filter(col("vec_id") < nQueries)
        .localCheckpoint()
      val batchStore = VectorOps.ivfStoreTopK(spark, dir, nQueries, k,
        nlist, nprobe, trainIters).collect().toSeq
      val streamed = VectorOps.serveFromStorePath(spark, storePath,
        queries, cents, k, nprobe).collect().toSeq
      assert(batchStore.nonEmpty)
      assert(streamed == batchStore,
        "stream-appended store served differently from the batch-built store")
    } finally q.stop()
  }

  test("the append stream enforces the same delivery guards as the heap ingest") {
    // the two ingest modes share checkBatchContract; this drives the
    // APPEND stream's wiring of it specifically, so moving the parquet
    // append above the guard (or dropping the guard) fails here even
    // though serving would hide the duplicate rows behind candidate dedup
    val embRaw = Tables.embeddings(spark, dir).localCheckpoint()
    val cents = VectorOps
      .persistedTrainedCentroids(spark, dir, nlist, trainIters)
    def freshStream() = {
      val inputDir = java.nio.file.Files
        .createTempDirectory("graft_annstore_guard_in").toString
      val storePath = java.nio.file.Files
        .createTempDirectory("graft_annstore_guard").toString + "/store"
      (inputDir, storePath,
        AnnStreaming.runIvfStoreAppendStream(spark, inputDir, embRaw.schema,
          storePath, new AnnStreaming.StoreAppendState, cents))
    }
    // (a) cross-batch redelivery
    val (in1, store1, q1) = freshStream()
    try {
      embRaw.filter(col("vec_id") < 100).coalesce(1)
        .write.mode("append").parquet(in1)
      q1.processAllAvailable()
      val before = spark.read.parquet(store1).count()
      embRaw.filter(col("vec_id") < 100).coalesce(1)
        .write.mode("append").parquet(in1)
      val e1 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
      assert(messages(e1).exists(_.contains("re-delivered micro-batch")))
      assert(spark.read.parquet(store1).count() == before,
        "the guard must fire BEFORE any rows append")
    } finally q1.stop()
    // (b) duplicate within one micro-batch
    val (in2, _, q2) = freshStream()
    try {
      val slice = embRaw.filter(col("vec_id") < 50)
      slice.unionAll(slice).coalesce(1).write.mode("append").parquet(in2)
      val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(messages(e2).exists(_.contains("duplicated vec_id within")))
    } finally q2.stop()
  }

  test("re-delivered micro-batches fail loudly instead of duplicating rows") {
    val embRaw = Tables.embeddings(spark, dir).localCheckpoint()
    val cents = VectorOps
      .persistedTrainedCentroids(spark, dir, nlist, trainIters)
    val inputDir = java.nio.file.Files
      .createTempDirectory("graft_stream_ann_dup").toString
    val state = AnnStreaming.emptyState(embRaw)
    val q = AnnStreaming.runIvfIngestStream(spark, inputDir, embRaw.schema,
      state, cents)
    try {
      embRaw.filter(col("vec_id") < 100)
        .coalesce(1).write.mode("append").parquet(inputDir)
      q.processAllAvailable()
      // the same id range lands again — the duplicated-postings scenario
      embRaw.filter(col("vec_id") < 100)
        .coalesce(1).write.mode("append").parquet(inputDir)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(messages(e).exists(_.contains("re-delivered micro-batch")),
        s"expected the redelivery guard, got: ${messages(e)}")
    } finally q.stop()
  }

  test("a vec_id duplicated WITHIN one micro-batch fails loudly too") {
    val embRaw = Tables.embeddings(spark, dir).localCheckpoint()
    val cents = VectorOps
      .persistedTrainedCentroids(spark, dir, nlist, trainIters)
    val inputDir = java.nio.file.Files
      .createTempDirectory("graft_stream_ann_intra").toString
    val state = AnnStreaming.emptyState(embRaw)
    val q = AnnStreaming.runIvfIngestStream(spark, inputDir, embRaw.schema,
      state, cents)
    try {
      // two landed copies coalesce into ONE micro-batch: the min-vs-max
      // guard alone cannot see this (min > maxSeen holds), so the
      // count-vs-distinct check must catch it
      val slice = embRaw.filter(col("vec_id") < 50)
      slice.unionAll(slice)
        .coalesce(1).write.mode("append").parquet(inputDir)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(messages(e).exists(_.contains("duplicated vec_id within")),
        s"expected the intra-batch duplicate guard, got: ${messages(e)}")
    } finally q.stop()
  }

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
}
