package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: match fact rows whose point column falls inside
  * `[start, end)` of an interval table.
  *
  * The naive formulation is a pure theta join — a broadcast nested loop at
  * best, a cartesian product at worst. This is the chunk-bucketed form that
  * scales: both sides map to fixed-width time chunks (an interval explodes
  * into every chunk it overlaps — cheap while intervals are much shorter
  * than the data's time span), the join runs as an EQUI join on the chunk
  * key with the range predicate as a residual filter, and one hot chunk
  * spreads no worse than its own data. Chunk width trades replication
  * (long intervals × narrow chunks) against residual filtering (wide
  * chunks); pick it near the typical interval length.
  */
object RangeJoin {

  /** @param facts     fact table with a long point column `pointCol`
    * @param intervals interval table with long `startCol` / `endCol`
    *                  (end exclusive)
    * @param chunk     chunk width in the same units as the point column
    */
  def bucketed(facts: DataFrame, intervals: DataFrame, pointCol: String,
               startCol: String, endCol: String, chunk: Long): DataFrame = {
    require(chunk > 0)
    val f = facts.withColumn("_rj_chunk", expr(s"$pointCol div $chunk"))
    // empty/inverted intervals can match nothing under [start, end), but a
    // descending sequence() would silently explode them into junk chunk
    // rows — drop them up front
    val iv = intervals.filter(col(endCol) > col(startCol))
      .withColumn("_rj_chunk",
        explode(sequence(expr(s"$startCol div $chunk"),
          expr(s"($endCol - 1) div $chunk"))))
    f.join(iv, Seq("_rj_chunk"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_rj_chunk")
  }
}
