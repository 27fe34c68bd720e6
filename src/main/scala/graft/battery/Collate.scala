package graft.battery

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-cell collation (/root/reference/step13_collate.py).
  *
  * The reference globs per-cell CSVs, derives `cell_id` from the filename, and
  * concatenates by column name with NaN-fill. Spark-first: one multi-path scan
  * (parallel across files), `input_file_name()` → `cell_id`, and
  * `unionByName(allowMissingColumns = true)` for heterogeneous schemas.
  */
object Collate {

  /** Read every `*_features_full.csv` under `dir` as one collated table. */
  def featuresFromDir(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(s"$dir/*_features_full.csv")
      .withColumn("cell_id",
        regexp_extract(input_file_name(), "([^/]+)_features_full\\.csv", 1))
    // cell_id first (/root/reference/step13_collate.py:16-17)
    df.select(("cell_id" +: df.columns.filter(_ != "cell_id").toSeq).map(col): _*)
  }

  /** Union-by-name with missing-column NULL fill (pandas concat semantics,
    * /root/reference/step13_collate.py:30,46). */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Stack already-loaded per-cell frames, tagging each with its cell id; a
    * frame with an all-null/empty cell_id column gets the literal id
    * (/root/reference/step13_collate.py:8-15). */
  def withCellId(df: DataFrame, cellId: String): DataFrame =
    if (!df.columns.contains("cell_id"))
      df.withColumn("cell_id", lit(cellId))
    else
      df.withColumn("cell_id",
        when(col("cell_id").isNull || col("cell_id") === "", lit(cellId))
          .otherwise(col("cell_id")))
}
