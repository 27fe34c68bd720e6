package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.VectorOps

/** The committed-batch manifest (round-12 verdict stretch item): the
  * manifest is the posting store's visibility authority — landings commit
  * by entering it, torn directories are invisible by rule rather than by
  * dot-prefix naming, and consolidation becomes ONE atomic manifest swap
  * (a concurrent reader's only legal row count is the full total,
  * strictly stronger than the legacy park window's whole-batch subsets).
  * Serving stays on the identical DPP-pruned plan: the manifest filter is
  * an `isin` on the ingest_batch partition column, pruned at planning. */
class StreamingManifestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val (nlist, trainIters, nQueries, k, nprobe) = (16, 2, 50, 3, 4)

  private def freshPaths(tag: String): (String, String) = {
    val in = java.nio.file.Files
      .createTempDirectory(s"graft_manifest_${tag}_in").toString
    val store = java.nio.file.Files
      .createTempDirectory(s"graft_manifest_$tag").toString + "/store"
    (in, store)
  }

  test("manifest bootstrap: landings commit via the manifest, torn dirs are invisible") {
    val embRaw = Tables.embeddings(spark, dir).localCheckpoint()
    val cents = VectorOps
      .persistedTrainedCentroids(spark, dir, nlist, trainIters)
    val (in, store) = freshPaths("boot")
    val q = AnnStreaming.runIvfStoreAppendStream(spark, in, embRaw.schema,
      store, new AnnStreaming.StoreAppendState, cents)
    try {
      def land(lo: Long, hi: Long): Unit = {
        embRaw.filter(col("vec_id") >= lo && col("vec_id") < hi)
          .coalesce(1).write.mode("append").parquet(in)
        q.processAllAvailable()
      }
      land(0, 100); land(100, 200)
      val queries = VectorOps.prepEmb(embRaw).filter(col("vec_id") < nQueries)
        .localCheckpoint()
      val servedLegacy = VectorOps.serveFromStorePath(spark, store,
        queries, cents, k, nprobe).collect().toSeq
      assert(AnnStreaming.enableManifest(spark, store) == Set(0L, 1L))
      // serving parity across the mode switch
      assert(VectorOps.serveFromStorePath(spark, store, queries, cents, k,
        nprobe).collect().toSeq == servedLegacy)
      // a landing under the manifest commits by entering it
      land(200, 300)
      assert(AnnStreaming.manifest(spark, store).get == Set(0L, 1L, 2L))
      assert(AnnStreaming.readStore(spark, store).count() == 300L)
      val served300 = VectorOps.serveFromStorePath(spark, store,
        queries, cents, k, nprobe).collect().toSeq
      // torn landing: a full posting directory that never reached the
      // manifest — raw reads see it, every engine path ignores it
      VectorOps.assignWithVectors(
          VectorOps.prepEmb(embRaw.filter(
            col("vec_id") >= 300 && col("vec_id") < 350)), cents)
        .select(col("vec_id"), col("v"), col("nrm"), col("cluster"))
        .write.partitionBy("cluster")
        .parquet(s"$store/ingest_batch=77")
      assert(spark.read.parquet(store).count() > 300L,
        "the planted torn dir must be on disk (raw reads see it)")
      assert(AnnStreaming.readStore(spark, store).count() == 300L,
        "an un-manifested landing must be invisible to readStore")
      assert(VectorOps.serveFromStorePath(spark, store, queries, cents, k,
        nprobe).collect().toSeq == served300,
        "serving must not change under a torn directory")
      assert(AnnStreaming.stateFromStore(spark, store).maxSeenId == 299L,
        "the high-water mark must not read torn rows")
      // recovery leaves a tokenless un-manifested real dir alone (it is a
      // replayable in-flight landing, not garbage it can prove committed)
      AnnStreaming.recoverConsolidation(spark, store)
      assert(new java.io.File(store, "ingest_batch=77").isDirectory)
      new org.apache.hadoop.fs.Path(s"$store/ingest_batch=77")
        .getFileSystem(spark.sessionState.newHadoopConf())
        .delete(new org.apache.hadoop.fs.Path(s"$store/ingest_batch=77"), true)
      // and the stream keeps absorbing
      land(300, 350)
      assert(AnnStreaming.readStore(spark, store).count() == 350L)
    } finally q.stop()
  }

  test("manifested consolidation: one atomic swap — a concurrent reader only ever sees the full store") {
    val embRaw = Tables.embeddings(spark, dir).localCheckpoint()
    val cents = VectorOps
      .persistedTrainedCentroids(spark, dir, nlist, trainIters)
    val (in, store) = freshPaths("fold")
    val q = AnnStreaming.runIvfStoreAppendStream(spark, in, embRaw.schema,
      store, new AnnStreaming.StoreAppendState, cents)
    try {
      def land(lo: Long, hi: Long): Unit = {
        embRaw.filter(col("vec_id") >= lo && col("vec_id") < hi)
          .coalesce(1).write.mode("append").parquet(in)
        q.processAllAvailable()
      }
      land(0, 100); land(100, 200); land(200, 300)
      AnnStreaming.enableManifest(spark, store)
      val total = 300L
      val queries = VectorOps.prepEmb(embRaw).filter(col("vec_id") < nQueries)
        .localCheckpoint()
      val servedBefore = VectorOps.serveFromStorePath(spark, store,
        queries, cents, k, nprobe).collect().toSeq
      val contentBefore = AnnStreaming.readStore(spark, store)
        .collect().map(_.toString).sorted.toSeq

      // the reader's ONLY legal count is the total — the fold must never
      // expose a missing-batches intermediate (transient listing errors in
      // the post-swap cleanup window are retried, as a re-planning reader
      // would)
      val wrong = new java.util.concurrent.atomic.AtomicLong(-1L)
      val okReads = new java.util.concurrent.atomic.AtomicLong(0L)
      val stopReader = new java.util.concurrent.atomic.AtomicBoolean(false)
      val reader = new Thread(() => {
        while (!stopReader.get()) {
          try {
            val n = AnnStreaming.readStore(spark, store).count()
            if (n == total) okReads.incrementAndGet()
            else wrong.compareAndSet(-1L, n)
          } catch { case _: Throwable => () }
        }
      })
      reader.start()
      val stats = try AnnStreaming.consolidateStore(spark, store)
        finally { stopReader.set(true); reader.join(30000) }
      assert(!stats.skipped && stats.rows == 200L, s"$stats")
      assert(wrong.get() == -1L,
        s"a concurrent reader saw a partial store: ${wrong.get()} rows")
      assert(okReads.get() >= 1L, "the concurrent reader never completed")
      assert(AnnStreaming.manifest(spark, store).get == Set(-2L, 2L))
      val names = new java.io.File(store).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
        .map(_.getName).sorted.toSeq
      assert(names == Seq("ingest_batch=-2", "ingest_batch=2"), s"$names")
      assert(AnnStreaming.readStore(spark, store)
        .collect().map(_.toString).sorted.toSeq == contentBefore)
      assert(VectorOps.serveFromStorePath(spark, store, queries, cents, k,
        nprobe).collect().toSeq == servedBefore)
      // keeps absorbing; a second fold walks the consolidated id down
      land(300, 400); land(400, 450)
      assert(!AnnStreaming.consolidateStore(spark, store).skipped)
      assert(AnnStreaming.manifest(spark, store).get == Set(-3L, 4L),
        "the second fold must use a fresh consolidated id")
      assert(AnnStreaming.readStore(spark, store).count() == 450L)
    } finally q.stop()
  }

  test("a landing that commits mid-fold keeps its manifest entry (delta swap)") {
    // the fold's swap is a delta against a FRESH manifest read: a batch
    // that lands (and manifests) while the fold is staging must survive
    // the cutover — an entry-snapshot swap would silently drop it
    val embRaw = Tables.embeddings(spark, dir).localCheckpoint()
    val cents = VectorOps
      .persistedTrainedCentroids(spark, dir, nlist, trainIters)
    val (in, store) = freshPaths("midfold")
    val q = AnnStreaming.runIvfStoreAppendStream(spark, in, embRaw.schema,
      store, new AnnStreaming.StoreAppendState, cents)
    try {
      def land(lo: Long, hi: Long): Unit = {
        embRaw.filter(col("vec_id") >= lo && col("vec_id") < hi)
          .coalesce(1).write.mode("append").parquet(in)
        q.processAllAvailable()
      }
      land(0, 100); land(100, 200); land(200, 300)
      AnnStreaming.enableManifest(spark, store)
      var landedInWindow = false
      AnnStreaming.consolidateCrashpoint = s =>
        if (s == "verified" && !landedInWindow) {
          landedInWindow = true
          land(300, 400) // lands AND manifests inside the fold window
        }
      val stats = try AnnStreaming.consolidateStore(spark, store)
        finally AnnStreaming.consolidateCrashpoint = _ => ()
      assert(landedInWindow && !stats.skipped && stats.rows == 200L)
      assert(AnnStreaming.manifest(spark, store).get == Set(-2L, 2L, 3L),
        "the mid-fold landing must keep its manifest entry across the swap")
      assert(AnnStreaming.readStore(spark, store).count() == 400L,
        "the mid-fold landing or a folded batch was lost")
      land(400, 450)
      assert(AnnStreaming.readStore(spark, store).count() == 450L)
    } finally {
      AnnStreaming.consolidateCrashpoint = _ => ()
      q.stop()
    }
  }

  test("retainSources: the pre-fold snapshot stays readable until the vacuum") {
    // snapshot retention: with retainSources the fold swaps the manifest
    // but leaves the source dirs in place — invisible to every NEW reader,
    // still readable by a scan that planned against the pre-swap manifest
    // (the table-format retention posture). The vacuum IS
    // recoverConsolidation, which deletes exactly the fold's recorded
    // sources.
    val embRaw = Tables.embeddings(spark, dir).localCheckpoint()
    val cents = VectorOps
      .persistedTrainedCentroids(spark, dir, nlist, trainIters)
    val (in, store) = freshPaths("retain")
    val q = AnnStreaming.runIvfStoreAppendStream(spark, in, embRaw.schema,
      store, new AnnStreaming.StoreAppendState, cents)
    try {
      def land(lo: Long, hi: Long): Unit = {
        embRaw.filter(col("vec_id") >= lo && col("vec_id") < hi)
          .coalesce(1).write.mode("append").parquet(in)
        q.processAllAvailable()
      }
      land(0, 100); land(100, 200); land(200, 300)
      AnnStreaming.enableManifest(spark, store)
      val stats = AnnStreaming.consolidateStore(spark, store,
        retainSources = true)
      assert(!stats.skipped && stats.rows == 200L)
      assert(AnnStreaming.manifest(spark, store).get == Set(-2L, 2L))
      assert(AnnStreaming.readStore(spark, store).count() == 300L)
      // the retained snapshot: source dirs still on disk and readable by
      // an old-manifest scan, while new readers never see them
      for (id <- Seq(0L, 1L))
        assert(new java.io.File(store, s"ingest_batch=$id").isDirectory,
          s"retained source ingest_batch=$id must stay on disk")
      val oldSnapshot = spark.read.option("basePath", store)
        .parquet(s"$store/ingest_batch=0", s"$store/ingest_batch=1")
      assert(oldSnapshot.count() == 200L,
        "a pre-swap reader's files must remain readable until the vacuum")
      // the vacuum deletes exactly the fold's recorded sources
      AnnStreaming.recoverConsolidation(spark, store)
      val onDisk = new java.io.File(store).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
        .map(_.getName.stripPrefix("ingest_batch=").toLong).toSet
      assert(onDisk == Set(-2L, 2L),
        s"the vacuum must remove the retained sources, left: $onDisk")
      assert(AnnStreaming.readStore(spark, store).count() == 300L)
      land(300, 350)
      assert(AnnStreaming.readStore(spark, store).count() == 350L)
    } finally q.stop()
  }

  test("manifested fold crash shapes all recover to zero loss and identical serving") {
    val embRaw = Tables.embeddings(spark, dir).localCheckpoint()
    val cents = VectorOps
      .persistedTrainedCentroids(spark, dir, nlist, trainIters)
    val (in, store) = freshPaths("crash")
    val q = AnnStreaming.runIvfStoreAppendStream(spark, in, embRaw.schema,
      store, new AnnStreaming.StoreAppendState, cents)
    try {
      def land(lo: Long, hi: Long): Unit = {
        embRaw.filter(col("vec_id") >= lo && col("vec_id") < hi)
          .coalesce(1).write.mode("append").parquet(in)
        q.processAllAvailable()
      }
      land(0, 100); land(100, 200); land(200, 300)
      AnnStreaming.enableManifest(spark, store)
      assert(!AnnStreaming.consolidateStore(spark, store).skipped)
      var hi = 300L
      val queries = VectorOps.prepEmb(embRaw).filter(col("vec_id") < nQueries)
        .localCheckpoint()
      // pre-swap crash shapes leave the OLD manifest and roll the fold
      // away; post-swap shapes ("manifested", first park) keep the NEW one
      // and finish its cleanup — a post-swap crash commits the fold, so
      // each iteration re-creates a foldable state (>= 2 non-newest ids)
      // by landing fresh batches
      val killAt = Seq("verified", "placed", "manifested", "parked:")
      for (step <- killAt) {
        while (AnnStreaming.manifest(spark, store).get.size < 3) {
          land(hi, hi + 50); hi += 50
        }
        val total = hi
        val servedBefore = VectorOps.serveFromStorePath(spark, store,
          queries, cents, k, nprobe).collect().toSeq
        AnnStreaming.consolidateCrashpoint = s =>
          if (s.startsWith(step)) throw new RuntimeException(
            s"injected crash at $s")
        val e = intercept[RuntimeException] {
          AnnStreaming.consolidateStore(spark, store)
        }
        AnnStreaming.consolidateCrashpoint = _ => ()
        assert(e.getMessage.contains("injected crash"))
        AnnStreaming.recoverConsolidation(spark, store)
        assert(AnnStreaming.readStore(spark, store).count() == total,
          s"row loss after a crash at '$step'")
        assert(VectorOps.serveFromStorePath(spark, store, queries, cents,
          k, nprobe).collect().toSeq == servedBefore,
          s"serving diverged after a crash at '$step'")
        // no loss and no leak: on-disk dirs == manifested ids
        val ids = AnnStreaming.manifest(spark, store).get
        val onDisk = new java.io.File(store).listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
          .map(_.getName.stripPrefix("ingest_batch=").toLong).toSet
        assert(onDisk == ids,
          s"dirs ($onDisk) must equal the manifest ($ids) after '$step'")
      }
      // after the final post-swap recovery the fold is live; the stream
      // keeps absorbing on the recovered layout
      val before = AnnStreaming.readStore(spark, store).count()
      land(hi, hi + 50)
      assert(AnnStreaming.readStore(spark, store).count() == before + 50)
    } finally {
      AnnStreaming.consolidateCrashpoint = _ => ()
      q.stop()
    }
  }
}
