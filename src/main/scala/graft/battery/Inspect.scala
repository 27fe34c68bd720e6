package graft.battery

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Console inspection helpers (S9: /root/reference/step1_read.py:4-6,
  * step3_segment.py:9-11): dtypes, head/tail, and a per-group sample —
  * bounded collects only, safe on any table size.
  */
object Inspect {

  /** dtypes + first/last n rows (tail = reverse-ordered limit, no full sort
    * materialized driver-side). */
  def headTail(df: DataFrame, orderCol: String, n: Int = 4): String = {
    val head = df.orderBy(col(orderCol).asc_nulls_last).limit(n).collect()
    val tail = df.orderBy(col(orderCol).desc_nulls_last).limit(n).collect().reverse
    val types = df.schema.map(f => s"${f.name}: ${f.dataType.simpleString}")
      .mkString("\n")
    val cols = df.columns.mkString(" | ")
    def render(rows: Array[org.apache.spark.sql.Row]): String =
      rows.map(_.toSeq.map(v => if (v == null) "" else v.toString)
        .mkString(" | ")).mkString("\n")
    s"$types\n\nhead($n):\n$cols\n${render(head)}\n\ntail($n):\n$cols\n${render(tail)}"
  }

  /** First `perGroup` rows of each group (reference prints 3 samples per
    * cycle) — window rank, not a driver-side loop. */
  def groupSample(df: DataFrame, keys: Seq[String], orderCol: String,
                  perGroup: Int = 3): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).asc_nulls_last)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perGroup)
      .drop("__rn")
  }

  /** S8 stand-in: the plotted series (capacity & CE vs cycle) as a sink
    * table — plotting itself is a client concern
    * (/root/reference/pipeline.py:245-257). */
  def plotData(features: DataFrame): DataFrame =
    features.select("cycle_index", "Q_dis_Ah", "CE").orderBy("cycle_index")
}
