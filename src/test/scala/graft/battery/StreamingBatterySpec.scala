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
      // probing path is exercised per micro-batch
      for (f <- fixtures) {
        val src = java.nio.file.Paths.get(f)
        java.nio.file.Files.copy(src,
          java.nio.file.Paths.get(rawDir, src.getFileName.toString))
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
    } finally q.stop()
  }
}
