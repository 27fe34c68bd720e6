package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSpec

/** a24_gini's folded rank sum must equal the row_number spelling it
  * replaced. The fold rests on one identity — Σ rank·x is invariant to tie
  * order, so a distinct value with count c and m strictly-smaller rows
  * contributes x·(c·m + c(c+1)/2) — and this spec pins it on a synthetic
  * set with heavy ties, negative values, and a group with a single row
  * (the shapes that break rank arithmetic off-by-ones). */
class GiniFoldSpec extends SparkSpec {

  test("folded Σi·x ≡ ranked Σi·x, gini identical") {
    import spark.implicits._
    val rows = Seq(
      // (group, id, xm): heavy ties in g1, all-distinct g2, singleton g3
      ("g1", 1L, 5L), ("g1", 2L, 5L), ("g1", 3L, 5L), ("g1", 4L, 2L),
      ("g1", 5L, 9L), ("g1", 6L, 2L), ("g1", 7L, -3L), ("g1", 8L, 5L),
      ("g2", 1L, 10L), ("g2", 2L, 30L), ("g2", 3L, 20L), ("g2", 4L, 40L),
      ("g3", 9L, 7L))
    val df = rows.toDF("event_type", "event_id", "xm")

    val wRank = Window.partitionBy("event_type")
      .orderBy(col("xm"), col("event_id"))
    val ranked = df
      .withColumn("i", row_number().over(wRank).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("xm").as("sx"),
        sum(col("i").cast("decimal(38,0)") * col("xm")).as("six"))

    val wCum = Window.partitionBy("event_type").orderBy("xm")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cD = col("c").cast("decimal(38,0)")
    val folded = df.groupBy("event_type", "xm")
      .agg(count(lit(1)).as("c"))
      .withColumn("m", coalesce(sum("c").over(wCum), lit(0L)))
      .groupBy("event_type")
      .agg(sum("c").as("n"), sum(col("xm") * col("c")).as("sx"),
        sum(col("xm").cast("decimal(38,0)") *
          (cD * col("m").cast("decimal(38,0)") +
            expr("(c * (c + 1)) div 2").cast("decimal(38,0)")))
          .as("six"))

    def fin(t: org.apache.spark.sql.DataFrame) = t
      .select(col("event_type"), col("n"),
        col("sx").cast(DoubleType).as("sxd"),
        col("six").cast(DoubleType).as("sixd"))
      .orderBy("event_type").collect().toSeq.map(_.toSeq)
    assert(fin(folded) == fin(ranked))
  }
}
