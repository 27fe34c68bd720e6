package graft

import org.apache.spark.sql.functions._

/** Scratch cross-engine check for the routed row's two-branch oracle
  * (round-12 ADVICE: the old SQL modeled only the exact branch). Dumps the
  * catalog row's oracle SQL text, a small corpus engineered to ROUTE
  * (capped), and Spark's nearPairsRouted result on it, for a DuckDB replay
  * driven by scripts — run with Test/runMain graft.ProfileRoutedOracle. */
object ProfileRoutedOracle {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "profile-routed-oracle")
    import spark.implicits._
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/routed_sql.txt"),
      SparkEntry.oracleSql("e2_edit_routed")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the EditBlockSpec step-down corpus: prices cheaper at tighter t
    val fam = (0 until 12).flatMap(g => (0 until 5).map(j =>
      (g * 10L + j, s"shared prefix block $g suffix $j"))).toDF("doc_id", "text")
    fam.coalesce(1).write.mode("overwrite")
      .parquet("/tmp/routed_fixture.parquet")
    def total(t: Int): Long = graft.operators.EditBlock.candidateStat(
        fam.select(col("doc_id"), col("text").as("s")), "doc_id", "s", t)
      .select(col("candidates") + col("short_pairs")).head().getLong(0)
    val budget = (total(4) + total(2)) / 2
    println(s"[ro] budget=$budget totals t4=${total(4)} t2=${total(2)}")
    graft.operators.EditBlock.nearPairsRouted(
        fam.select(col("doc_id"), substring(col("text"), 1, 30).as("s")),
        "doc_id", "s", t = 4, candidateBudget = budget, perDocBudget = 64)
      .orderBy("id_a", "id_b")
      .coalesce(1).write.mode("overwrite")
      .parquet("/tmp/routed_capped_spark.parquet")
    // and with a BINDING per-doc cap (8 < the 59 partners every doc has)
    graft.operators.EditBlock.nearPairsRouted(
        fam.select(col("doc_id"), substring(col("text"), 1, 30).as("s")),
        "doc_id", "s", t = 4, candidateBudget = budget, perDocBudget = 8)
      .orderBy("id_a", "id_b")
      .coalesce(1).write.mode("overwrite")
      .parquet("/tmp/routed_capped8_spark.parquet")
    spark.stop()
  }
}
