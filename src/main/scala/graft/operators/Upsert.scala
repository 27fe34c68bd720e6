package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert (SCD-1 merge): apply an updates table onto a base table —
  * update rows whose keys match, insert the rest, keep everything else.
  *
  * One-shuffle formulation: union both sides tagged by precedence and keep
  * the highest-precedence row per key with a window keeper — the same
  * single hash-partition pass at any scale (no join, no broadcast
  * requirement on either side). Both inputs must share the key columns;
  * non-key columns are aligned by name (missing ones null-fill). Contract:
  * each side carries at most one row per key (the standard MERGE
  * precondition — pre-dedup updates otherwise), and an update row replaces
  * the base row wholesale (columns absent from the updates frame become
  * null, SCD-1 style).
  */
object Upsert {

  /** Versioned (CDC-style) merge: keep, per key, the row with the highest
    * `version` tuple across both sides — last-write-wins by a total order
    * carried in the data (ts + a unique tiebreaker), not by which side a row
    * arrived on. Unlike [[apply]], neither side needs the one-row-per-key
    * precondition, and the result is independent of how the change feed was
    * split into batches — exactly the property a foreachBatch streaming sink
    * needs for its final state to equal the batch twin. Same one-shuffle
    * union + window-keeper shape as [[apply]]; NULL keys pass through
    * unmerged (SQL MERGE semantics).
    */
  def byVersion(base: DataFrame, updates: DataFrame, keys: Seq[String],
                version: Seq[String]): DataFrame = {
    require(keys.nonEmpty && version.nonEmpty)
    val tagged = base.unionByName(updates, allowMissingColumns = true)
    val hasNullKey = keys.map(col(_).isNull).reduce(_ || _)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(version.map(col(_).desc): _*)
    tagged.filter(!hasNullKey)
      .withColumn("_ups_rn", row_number().over(w))
      .filter(col("_ups_rn") === 1)
      .drop("_ups_rn")
      .unionByName(tagged.filter(hasNullKey))
  }

  /** SCD-2 history build: turn a change feed into validity intervals. Every
    * change row becomes a version row whose interval runs from its own
    * version value to the NEXT change's (`lead` over the key, ordered by the
    * version tuple), open-ended (NULL) for the current row — the standard
    * dimension-history shape reference pipelines rebuild nightly. One key
    * shuffle (the window), no join, no state: at 100 TB this is a single
    * hash-partition pass, and an incremental rebuild only re-windows keys
    * present in the new batch. `version.head` must be the interval-bearing
    * column (a timestamp carrier); later columns only break ties.
    */
  def scd2(changes: DataFrame, keys: Seq[String], version: Seq[String],
           validTo: String = "valid_to"): DataFrame = {
    require(keys.nonEmpty && version.nonEmpty)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(version.map(col(_).asc): _*)
    changes
      .withColumn(validTo, lead(col(version.head), 1).over(w))
      .withColumn("is_current", col(validTo).isNull.cast("int"))
  }

  def apply(base: DataFrame, updates: DataFrame,
            keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty)
    val tagged = base.withColumn("_ups_pri", lit(0))
      .unionByName(updates.withColumn("_ups_pri", lit(1)),
        allowMissingColumns = true)
    // SQL MERGE semantics: a NULL key never matches, so NULL-key rows from
    // either side pass through untouched (a window partition would lump
    // them into one group and silently "merge" them)
    val hasNullKey = keys.map(col(_).isNull).reduce(_ || _)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ups_pri").desc)
    val merged = tagged.filter(!hasNullKey)
      .withColumn("_ups_rn", row_number().over(w))
      .filter(col("_ups_rn") === 1)
      .drop("_ups_rn")
    merged.unionByName(tagged.filter(hasNullKey))
      .drop("_ups_pri")
  }
}
