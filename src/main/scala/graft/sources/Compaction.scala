package graft.sources

import java.io.File

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance operation every streaming sink in
  * this engine eventually needs (`foreachBatch` appends, the IVF posting
  * store, the battery landing stream all land one-or-more files PER
  * micro-batch; at 100 TB a day of micro-batches is millions of kilobyte
  * files, and scan planning + footer reads start dominating query time).
  *
  * Spark-first shape: `coalesce`, never `repartition` — merging input
  * splits into fewer write tasks is a local concatenation with NO shuffle
  * (each output task reads a disjoint set of input files), which is what
  * makes compaction affordable to run continuously. The target file count
  * derives from the directory's on-disk bytes, so re-compacting an
  * already-compact directory is a cheap no-op (filesystem metadata only —
  * no Spark job on the skip path). Merged files compress better than
  * fragmented ones, so one pass can land above a shrunken byte total's
  * ideal count — repeated passes strictly reduce the file count and reach
  * the skip fixpoint within a pass or two; the spec pins that convergence.
  * A hive-partitioned directory (the `partitionBy` posting store) is
  * compacted per leaf partition, preserving the layout and its pruning.
  *
  * Single-writer protocol, CHECKED not assumed: the swap re-lists the
  * directory and ABORTS (original untouched) if any file appeared,
  * disappeared, or changed size since the rewrite snapshotted it — a
  * concurrent appender (a live foreachBatch sink) makes the pass fail
  * loudly instead of silently deleting the freshly-appended batch. The
  * check runs twice: before the park, and again ON THE PARKED copy (which
  * can no longer change), so an append racing the first check is caught
  * and the park rolled back rather than deleted. Residual window: an
  * append that starts AFTER the park recreates the directory path, makes
  * the swap rename fail, and leaves the parked copy at `.old` plus the
  * stray append at the original path — an exception with both copies on
  * disk, never a silent loss. Pause the sink or re-run between batches.
  *
  * Crash-safety: the rewrite lands in a hidden sibling
  * `.<dir>.compact.tmp` (dot-prefixed — Spark's file index ignores it, so
  * partitioned parents never see swap state as a phantom partition), is
  * row-count-verified against the source, and replaces the original via two
  * renames (original parked at `.<dir>.compact.old` until the swap
  * completes, then deleted). A failure before the swap leaves the original
  * untouched; a failure between the renames leaves `.old` intact for manual
  * recovery — never a state with zero copies. (On an object store the
  * second rename is a manifest commit in a table format; the local-fs
  * rename stands in for it, same protocol.)
  */
object Compaction {

  /** `rows` is the swap-verified row count, or -1 on the skip path (which
    * deliberately runs no Spark job). */
  final case class CompactionStats(filesBefore: Long, bytesBefore: Long,
      filesAfter: Long, bytesAfter: Long, rows: Long, skipped: Boolean)

  /** Compact the parquet directory `dir` toward `targetBytes` per file,
    * recursing into hive-style partition subdirectories (each leaf is
    * compacted independently; stats aggregate across leaves).
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val leaves = leafDirs(new File(dir))
    val stats = leaves.map(d => compactLeaf(spark, d.getPath, targetBytes))
    stats.foldLeft(CompactionStats(0, 0, 0, 0, -1, skipped = true)) {
      (a, b) => CompactionStats(
        a.filesBefore + b.filesBefore, a.bytesBefore + b.bytesBefore,
        a.filesAfter + b.filesAfter, a.bytesAfter + b.bytesAfter,
        if (a.rows < 0 && b.rows < 0) -1 else math.max(a.rows, 0) + math.max(b.rows, 0),
        a.skipped && b.skipped)
    }
  }

  private def compactLeaf(spark: SparkSession, dir: String,
      targetBytes: Long): CompactionStats = {
    val snap0 = snapshot(dir)
    val (files0, bytes0) = (snap0.size.toLong, snap0.values.sum)
    val want = math.max(1L, (bytes0 + targetBytes - 1) / targetBytes)
    if (files0 <= want)
      return CompactionStats(files0, bytes0, files0, bytes0, -1, skipped = true)
    // dot-prefixed siblings: Spark's file index ignores hidden entries, so
    // a mid-pass reader of a partitioned parent never sees the swap state
    // as a phantom partition
    val f = new File(dir)
    val tmp = new File(f.getParentFile, s".${f.getName}.compact.tmp").getPath
    val old = new File(f.getParentFile, s".${f.getName}.compact.old").getPath
    LocalFs.deleteRecursively(new File(tmp))
    val src = spark.read.parquet(dir)
    src.coalesce(want.toInt).write.mode("overwrite").parquet(tmp)
    // verify BEFORE the swap: a short write must never replace good data
    val rowsBefore = src.count()
    val rowsAfter = spark.read.parquet(tmp).count()
    if (rowsAfter != rowsBefore) {
      LocalFs.deleteRecursively(new File(tmp))
      throw new IllegalStateException(
        s"compaction of $dir dropped rows ($rowsBefore -> $rowsAfter); " +
          "original left untouched")
    }
    // single-writer check: any concurrent append/replace since the snapshot
    // aborts the swap — the alternative is silently deleting those rows
    if (snapshot(dir) != snap0) {
      LocalFs.deleteRecursively(new File(tmp))
      throw new IllegalStateException(
        s"$dir changed during compaction (concurrent writer?); " +
          "aborted before the swap — original intact, re-run when quiesced")
    }
    LocalFs.deleteRecursively(new File(old))
    if (!new File(dir).renameTo(new File(old)))
      throw new IllegalStateException(s"could not park $dir for swap")
    // re-verify AFTER the park (review finding): a concurrent append landing
    // between the pre-park comparison and the rename above would otherwise
    // ride into `.old` and be deleted with it. Once parked, the directory
    // can no longer change under us, so this comparison is race-free; on
    // mismatch the park rolls back and the original keeps serving.
    if (snapshot(old) != snap0) {
      if (!new File(old).renameTo(new File(dir)))
        throw new IllegalStateException(
          s"$dir changed during compaction AND the park rollback failed; " +
            s"all rows are intact at $old — restore it manually")
      LocalFs.deleteRecursively(new File(tmp))
      throw new IllegalStateException(
        s"$dir changed between the pre-swap check and the park (concurrent " +
          "writer?); park rolled back, original intact — re-run when quiesced")
    }
    if (!new File(tmp).renameTo(new File(dir))) {
      // roll the park back so the source keeps serving
      new File(old).renameTo(new File(dir))
      throw new IllegalStateException(s"could not swap $tmp into $dir")
    }
    LocalFs.deleteRecursively(new File(old))
    val snap1 = snapshot(dir)
    CompactionStats(files0, bytes0, snap1.size.toLong, snap1.values.sum,
      rowsAfter, skipped = false)
  }

  /** name → size of the directory's parquet files (filesystem metadata
    * only); the concurrency check compares two of these. */
  private def snapshot(dir: String): Map[String, Long] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length).toMap

  /** The directories that directly hold parquet files: `dir` itself, or its
    * hive-partition leaves (`k=v` subdirectories, recursively). */
  private def leafDirs(dir: File): Seq[File] = {
    val children = Option(dir.listFiles()).getOrElse(Array.empty[File])
    val subdirs = children.filter(f => f.isDirectory && f.getName.contains("="))
    if (subdirs.isEmpty) Seq(dir)
    else subdirs.toSeq.flatMap(leafDirs)
  }
}
