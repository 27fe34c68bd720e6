package graft.battery

import graft.SparkSpec

/** Parity contract for continuous battery ingestion: files fed one at a
  * time through the landing-directory stream must leave exactly the
  * collated per-cycle feature table the batch re-run-and-collate loop
  * produces over the same files — structural parity, since both paths run
  * the identical Normalize → Features.all → withCellId code. */
class StreamingBatterySpec extends SparkSpec {

  private val fixtures = Seq(
    "src/test/resources/arbin_small.csv",
    "src/test/resources/neware_small.csv")

  test("stream-fed collated features equal the batch collate over the same files") {
    val rawDir = java.nio.file.Files
      .createTempDirectory("graft_battery_raw").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_battery_out").toString
    val q = StreamingIngest.run(spark, rawDir, outDir)
    try {
      // land the vendor exports one at a time — two different dialects
      // (Arbin comma/A/Ah vs Neware semicolon/mV/mAh), so the per-file
      // probing path is exercised per micro-batch. Landing follows the
      // class-doc contract: copy to a temp name the *.csv glob ignores,
      // then an atomic same-filesystem rename into place — the source can
      // never list a half-copied file.
      for (f <- fixtures) {
        val src = java.nio.file.Paths.get(f)
        val tmp = java.nio.file.Paths.get(rawDir,
          src.getFileName.toString + ".tmp")
        java.nio.file.Files.copy(src, tmp)
        java.nio.file.Files.move(tmp,
          java.nio.file.Paths.get(rawDir, src.getFileName.toString),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        q.processAllAvailable()
      }

      val streamed = spark.read
        .parquet(s"$outDir/features_collated.parquet")
        .collect().map(_.toSeq).toSet
      val batch = fixtures.map(f =>
          StreamingIngest.featuresForFile(spark, f, ratedAh = 3.0, dV = 0.05))
        .reduce(_.unionByName(_))
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch)
      // both cells landed under their own id
      val cells = streamed.map(_.head)
      assert(cells == Set("arbin_small", "neware_small"))

      // a re-delivered file must NOT duplicate its feature rows: a second
      // stream (fresh landing dir + fresh source log, same sink — the
      // restart-after-lost-checkpoint scenario) re-lists arbin_small.csv,
      // finds its cell already committed, and skips it
      val rawDir2 = java.nio.file.Files
        .createTempDirectory("graft_battery_raw2").toString
      val q2 = StreamingIngest.run(spark, rawDir2, outDir)
      try {
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(fixtures.head),
          java.nio.file.Paths.get(rawDir2, "arbin_small.csv"))
        q2.processAllAvailable()
      } finally q2.stop()
      val after = spark.read
        .parquet(s"$outDir/features_collated.parquet")
        .collect().map(_.toSeq)
      assert(after.length == after.toSet.size && after.toSet == streamed,
        "re-delivery duplicated feature rows")
    } finally q.stop()
  }
}
