package graft.sources

import java.io.File

import graft.SparkSpec

class CompactionSpec extends SparkSpec {

  import spark.implicits._

  private def fragmented(n: Int, rowsPerFile: Int): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact").toString + "/t"
    for (i <- 0 until n)
      (0 until rowsPerFile).map(j => (i.toLong, s"v${i}_$j"))
        .toDF("part", "v").coalesce(1).write.mode("append").parquet(dir)
    dir
  }

  private def parquetFiles(dir: String): Seq[File] =
    new File(dir).listFiles.toSeq
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("compaction merges small files, preserves every row, and is idempotent") {
    val dir = fragmented(40, 50) // 40 tiny files, 2000 rows
    val before = spark.read.parquet(dir)
      .collect().map(_.toSeq).toSet
    val totalBytes = parquetFiles(dir).map(_.length).sum

    // target ~quarter of the data per file -> ~4 files
    val s = Compaction.compactParquet(spark, dir, targetBytes = totalBytes / 4)
    assert(!s.skipped && s.filesBefore == 40 && s.rows == 2000)
    assert(s.filesAfter <= 5, s"still fragmented: $s")
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet == before,
      "compaction changed the data")
    // no leftover swap state
    assert(!new File(s"$dir.compact.tmp").exists())
    assert(!new File(s"$dir.compact.old").exists())

    // converges: merged files compress better, so a repeat pass may shave
    // the count once more — but each pass strictly reduces files and the
    // skip fixpoint arrives within a couple of passes, data intact
    var last = s
    var passes = 0
    while (!last.skipped && passes < 3) {
      val next = Compaction.compactParquet(spark, dir, targetBytes = totalBytes / 4)
      assert(next.skipped || next.filesAfter < last.filesAfter,
        s"non-skipping pass failed to reduce files: $next after $last")
      last = next; passes += 1
    }
    assert(last.skipped, s"compaction did not converge in $passes passes: $last")
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet == before,
      "convergence passes changed the data")
  }

  test("an already-compact directory is left untouched") {
    val dir = fragmented(1, 100)
    val names = parquetFiles(dir).map(_.getName).toSet
    val s = Compaction.compactParquet(spark, dir) // default 128 MB target
    assert(s.skipped && s.filesBefore == 1 && s.rows == 100)
    assert(parquetFiles(dir).map(_.getName).toSet == names,
      "no-op compaction rewrote files")
  }
}
