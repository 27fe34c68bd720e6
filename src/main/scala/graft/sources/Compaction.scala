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
  * already-compact directory is a no-op. (Merged files compress better than
  * fragmented ones, so one pass can land above a shrunken byte total's
  * ideal count — repeated passes strictly reduce the file count and reach
  * the skip fixpoint within a pass or two; the spec pins that convergence.)
  *
  * Crash-safety: the rewrite lands in a sibling `<dir>.compact.tmp`, is
  * row-count-verified against the source, and replaces the original via two
  * renames (original parked at `<dir>.compact.old` until the swap
  * completes, then deleted). A failure before the swap leaves the original
  * untouched; a failure between the renames leaves `.old` intact for manual
  * recovery — never a state with zero copies. (On an object store the
  * second rename is a manifest commit in a table format; the local-fs
  * rename stands in for it, same protocol.)
  */
object Compaction {

  final case class CompactionStats(filesBefore: Long, bytesBefore: Long,
      filesAfter: Long, bytesAfter: Long, rows: Long, skipped: Boolean)

  /** Compact the parquet directory `dir` toward `targetBytes` per file.
    * Returns before/after stats; `skipped = true` when the directory is
    * already at-or-under the target file count.
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val (files0, bytes0) = dirStats(dir)
    val want = math.max(1L, (bytes0 + targetBytes - 1) / targetBytes)
    if (files0 <= want) {
      val rows = spark.read.parquet(dir).count()
      return CompactionStats(files0, bytes0, files0, bytes0, rows, skipped = true)
    }
    val tmp = s"$dir.compact.tmp"
    val old = s"$dir.compact.old"
    deleteRecursively(new File(tmp))
    val src = spark.read.parquet(dir)
    src.coalesce(want.toInt).write.mode("overwrite").parquet(tmp)
    // verify BEFORE the swap: a short write must never replace good data
    val rowsBefore = src.count()
    val rowsAfter = spark.read.parquet(tmp).count()
    if (rowsAfter != rowsBefore) {
      deleteRecursively(new File(tmp))
      throw new IllegalStateException(
        s"compaction of $dir dropped rows ($rowsBefore -> $rowsAfter); " +
          "original left untouched")
    }
    deleteRecursively(new File(old))
    if (!new File(dir).renameTo(new File(old)))
      throw new IllegalStateException(s"could not park $dir for swap")
    if (!new File(tmp).renameTo(new File(dir))) {
      // roll the park back so the source keeps serving
      new File(old).renameTo(new File(dir))
      throw new IllegalStateException(s"could not swap $tmp into $dir")
    }
    deleteRecursively(new File(old))
    val (files1, bytes1) = dirStats(dir)
    CompactionStats(files0, bytes0, files1, bytes1, rowsAfter, skipped = false)
  }

  /** (parquet file count, total bytes) of a directory, filesystem metadata
    * only. */
  private def dirStats(dir: String): (Long, Long) = {
    val fs = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    (fs.length.toLong, fs.map(_.length).sum)
  }

  private def deleteRecursively(f: File): Unit = if (f.exists()) {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }
}
