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
      // the appended layout is batchId-keyed (idempotent replay) with the
      // cluster partitioning one level down, so earlier batches' files are
      // never rewritten and DPP still prunes un-probed lists
      val batchDirs = new java.io.File(storePath).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
      assert(batchDirs.length == cuts.length,
        s"expected one ingest_batch= directory per micro-batch at $storePath")
      assert(batchDirs.forall(_.listFiles()
          .exists(f => f.isDirectory && f.getName.startsWith("cluster="))),
        "expected cluster= partition directories inside each batch landing")
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
    // the two ingest modes share StreamGuards.classify; this drives the
    // APPEND stream's wiring of it specifically, so moving the parquet
    // landing above the guard (or dropping the guard) fails here even
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
    // (a) cross-batch SOURCE redelivery (same ids again under a new
    // batchId): skipped idempotently — the store must not grow and the
    // stream must keep running (an at-least-once feed is a healthy
    // deployment, not an outage)
    val (in1, store1, q1) = freshStream()
    try {
      embRaw.filter(col("vec_id") < 100).coalesce(1)
        .write.mode("append").parquet(in1)
      q1.processAllAvailable()
      val before = spark.read.parquet(store1)
        .drop("ingest_batch").collect().map(_.toString).sorted.toSeq
      embRaw.filter(col("vec_id") < 100).coalesce(1)
        .write.mode("append").parquet(in1)
      q1.processAllAvailable()
      val after = spark.read.parquet(store1)
        .drop("ingest_batch").collect().map(_.toString).sorted.toSeq
      assert(after == before,
        "a fully-redelivered batch must skip, leaving the store unchanged")
      // and the stream still absorbs fresh data afterwards
      embRaw.filter(col("vec_id") >= 100 && col("vec_id") < 150).coalesce(1)
        .write.mode("append").parquet(in1)
      q1.processAllAvailable()
      assert(spark.read.parquet(store1).count() > before.size,
        "the stream must keep absorbing after an idempotent skip")
    } finally q1.stop()
    // (b) duplicate within one micro-batch still fails loudly
    val (in2, _, q2) = freshStream()
    try {
      val slice = embRaw.filter(col("vec_id") < 50)
      slice.unionAll(slice).coalesce(1).write.mode("append").parquet(in2)
      val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(messages(e2).exists(_.contains("duplicated vec_id within")))
    } finally q2.stop()
    // (c) genuinely NEW ids below the high-water mark are disorder, not a
    // redelivery — still fatal (absorbing them is fine for ANN, but the
    // shared contract keeps the dedup family's pair-loss scenario out)
    val (in3, _, q3) = freshStream()
    try {
      embRaw.filter(col("vec_id") >= 100 && col("vec_id") < 200).coalesce(1)
        .write.mode("append").parquet(in3)
      q3.processAllAvailable()
      embRaw.filter(col("vec_id") < 100).coalesce(1)
        .write.mode("append").parquet(in3)
      val e3 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
      }
      assert(messages(e3).exists(_.contains("out-of-order micro-batch")),
        s"expected the disorder guard, got: ${messages(e3)}")
    } finally q3.stop()
  }

  test("re-delivered micro-batches skip idempotently instead of duplicating rows") {
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
      val before = state.postings.count()
      // the same id range lands again — the duplicated-postings scenario:
      // the heap index must not grow, and the stream must stay alive
      embRaw.filter(col("vec_id") < 100)
        .coalesce(1).write.mode("append").parquet(inputDir)
      q.processAllAvailable()
      assert(state.postings.count() == before,
        "a fully-redelivered batch must skip, leaving the index unchanged")
      // genuinely new ids BELOW the high-water mark remain fatal
      embRaw.filter(col("vec_id") >= 200 && col("vec_id") < 300)
        .coalesce(1).write.mode("append").parquet(inputDir)
      q.processAllAvailable()
      embRaw.filter(col("vec_id") >= 100 && col("vec_id") < 200)
        .coalesce(1).write.mode("append").parquet(inputDir)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(messages(e).exists(_.contains("out-of-order micro-batch")),
        s"expected the disorder guard, got: ${messages(e)}")
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
