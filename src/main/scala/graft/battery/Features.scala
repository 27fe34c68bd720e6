package graft.battery

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.operators.GridInterpolate

/** Per-cycle feature extractors (reference §2a.5, /root/reference/pipeline.py:157-228).
  *
  * All extractors are grouped aggregations keyed by `keys` (by default just
  * `cycle_index`; pass `Seq("cell_id", "cycle_index")` for collated multi-cell
  * tables — the same plans then scale out by cell). Row order inside a group is
  * explicit everywhere: `(timestamp, row_seq)` — pandas gets it implicitly from
  * the global sort (/root/reference/pipeline.py:148), Spark must not
  * (SURVEY.md §4 "semantic trap").
  *
  * Scale notes: every extractor is a single shuffle on `keys` (hash partition);
  * per-group state is bounded by cycle length (~10³ rows), so window frames and
  * the dQ/dV per-group array are safe at any table size. The four extractors
  * share the shuffle key, so Spark reuses the exchange when they are combined.
  */
object Features {

  private val dis: Column = col("step_type").cast("string").contains("DIS")

  private def ordered(keys: Seq[String]) =
    Window.partitionBy(keys.map(col): _*)
      .orderBy(col(Canonical.TimestampCol), col(Canonical.RowSeq))

  private def whole(keys: Seq[String]) =
    ordered(keys).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

  /** A1–A3: capacity, coulombic efficiency, normalized capacity
    * (/root/reference/pipeline.py:157-166).
    *
    * "Last non-null in time order" (pandas `dropna().iloc[-1]`) becomes
    * `max_by(value, rn-if-non-null)`: rows with a null value get a null
    * ordering key, which `max_by` skips.
    */
  def capacityCe(canonical: DataFrame, keys: Seq[String] = Seq("cycle_index")): DataFrame = {
    val cellKeys = keys.dropRight(1) // everything but cycle_index
    val rn = row_number().over(ordered(keys))
    def lastNonNull(c: String): Column =
      max_by(col(c), when(col(c).isNotNull, col("rn")))
    val perCycle = canonical
      .withColumn("rn", rn)
      .groupBy(keys.map(col): _*)
      .agg(
        lastNonNull("discharge_ah").as("Q_dis_Ah"),
        lastNonNull("charge_ah").as("Q_chg_Ah"))
      .withColumn("CE",
        when(col("Q_chg_Ah").isNull || col("Q_chg_Ah") === 0, lit(null).cast(DoubleType))
          .otherwise(col("Q_dis_Ah") / col("Q_chg_Ah")))
    // q_norm = Q_dis / Q_dis(first cycle) (/root/reference/pipeline.py:165) —
    // running first over cycle order; per-cell cardinality = #cycles (bounded).
    val wFirst = Window.partitionBy(cellKeys.map(col): _*)
      .orderBy(col("cycle_index"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perCycle.withColumn("q_norm", col("Q_dis_Ah") / first(col("Q_dis_Ah")).over(wFirst))
  }

  /** A4: discharge energy per cycle, trapezoidal ∫V·I dt
    * (/root/reference/pipeline.py:169-181). Exact trapezoid identity:
    * Σ (p_i + p_{i-1})/2 · (t_i − t_{i-1}) over time-ordered discharge rows.
    * NULL when <2 discharge rows (np.trapz precondition) or when any power /
    * time value is null (NaN poisons np.trapz).
    */
  def energy(canonical: DataFrame, keys: Seq[String] = Seq("cycle_index")): DataFrame = {
    val d = canonical.filter(dis)
      .withColumn("t", col(Canonical.TimestampCol).cast(DoubleType))
      .withColumn("p", col("voltage_v") * col("current_a"))
    val w = ordered(keys)
    val seg = (col("p") + lag("p", 1).over(w)) / 2 * (col("t") - lag("t", 1).over(w))
    d.withColumn("seg", seg)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("p").isNull || col("t").isNull, 1).otherwise(0)).as("n_bad"),
        sum("seg").as("e_ws"))
      .select(
        keys.map(col) :+
          when(col("n") < 2 || col("n_bad") > 0, lit(null).cast(DoubleType))
            .otherwise(abs(col("e_ws")) / 3600.0).as("E_dis_Wh"): _*)
  }

  /** A5: internal resistance at C/2 via neighbor-row ΔV/ΔI
    * (/root/reference/pipeline.py:184-203). The reference slices the
    * discharge subframe by *global row labels* around the row whose |I| is
    * closest to 0.5·rated (first occurrence on ties). Labels are positions in
    * the time-sorted frame, so per-cycle `row_number` + rn-range conditional
    * medians reproduce it exactly; `w` generalizes the ±1 window
    * (/root/reference/pipeline.py:191 "widen for real data").
    */
  def irC2(canonical: DataFrame, ratedAh: Double,
           keys: Seq[String] = Seq("cycle_index"), w: Int = 1): DataFrame = {
    val target = 0.5 * ratedAh
    val d = canonical
      .withColumn("rn", row_number().over(ordered(keys)))
      .filter(dis)
    val metric = abs(abs(col("current_a")) - target)
    // first-on-ties idxmin ≙ min_by(rn, (metric, rn)); null metric rows skipped
    val tidx = min_by(col("rn"), when(metric.isNotNull, struct(metric, col("rn"))))
      .over(whole(keys))
    val dd = d.withColumn("tidx", tidx)
    val pre = col("rn").between(col("tidx") - w, col("tidx") - 1)
    val post = col("rn").between(col("tidx"), col("tidx") + w)
    dd.groupBy(keys.map(col): _*)
      .agg(
        median(when(pre, col("voltage_v"))).as("pre_v"),
        median(when(post, col("voltage_v"))).as("post_v"),
        median(when(pre, col("current_a"))).as("pre_i"),
        median(when(post, col("current_a"))).as("post_i"))
      .select(
        keys.map(col) :+ {
          val dV = col("post_v") - col("pre_v")
          val dI = col("post_i") - col("pre_i")
          when(dI.isNull || dI === 0 || dV.isNull, lit(null).cast(DoubleType))
            .otherwise(abs(dV / dI)).as("IR_C2_ohm")
        }: _*)
  }

  /** A6+A7: dQ/dV peak voltage and shift vs first valid cycle
    * (/root/reference/pipeline.py:206-228). The per-cycle kernel (sort by V,
    * resample Q onto a fixed-ΔV grid by linear interpolation, central-difference
    * gradient, argmax) is the engine's one custom aggregation — per-group
    * arrays are bounded by cycle length, computed via collect_list + a compact
    * Scala kernel ([[graft.operators.GridInterpolate]]).
    */
  def dqdvPeak(canonical: DataFrame, dV: Double = 0.05,
               keys: Seq[String] = Seq("cycle_index")): DataFrame = {
    val cellKeys = keys.dropRight(1)
    val d = canonical.filter(dis)
      .filter(col("voltage_v").isNotNull && col("discharge_ah").isNotNull)
    val qmin = min(col("discharge_ah")).over(
      Window.partitionBy(keys.map(col): _*))
    val peaks = d
      .withColumn("q", col("discharge_ah") - qmin)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col("voltage_v").as("v"), col("q").as("q")))).as("pairs"))
      .withColumn("dQdV_peak_V", GridInterpolate.peakUdf(lit(dV),
        expr("transform(pairs, x -> x.v)"), expr("transform(pairs, x -> x.q)")))
      .drop("pairs")
    // A7: running reference = first non-null peak in cycle order
    // (/root/reference/pipeline.py:221-227)
    val wRef = Window.partitionBy(cellKeys.map(col): _*)
      .orderBy(col("cycle_index"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    peaks.withColumn("vref",
        first(col("dQdV_peak_V"), ignoreNulls = true).over(wRef))
      .withColumn("dQdV_shift_mV",
        when(col("dQdV_peak_V").isNotNull && col("vref").isNotNull,
          (col("dQdV_peak_V") - col("vref")) * 1000.0))
      .drop("vref")
  }

  /** Assemble the full per-cycle feature table via separate extractors +
    * key-partitioned joins (/root/reference/pipeline.py:294-296). Prefer
    * [[all]], which fuses everything into one pass; this form exists for
    * à-la-carte composition and as the semantic reference for tests.
    */
  def allJoined(canonical: DataFrame, ratedAh: Double, dV: Double = 0.05,
                keys: Seq[String] = Seq("cycle_index")): DataFrame = {
    val k = keys
    capacityCe(canonical, k)
      .join(energy(canonical, k), k, "left")
      .join(irC2(canonical, ratedAh, k), k, "left")
      .join(dqdvPeak(canonical, dV, k), k, "left")
  }

  /** The full per-cycle feature table in ONE shuffle + ONE aggregation pass.
    *
    * The reference makes four sequential per-cycle passes over the frame
    * (/root/reference/pipeline.py:283-296); here every per-row input the four
    * features need (row number, target-row index, previous-discharge power/
    * time, shifted capacity) comes from windows over the SAME key
    * partitioning, so Spark plans a single exchange, one window stage, and
    * one hash aggregate — no joins over the big table at all. The per-cycle
    * q_norm / vref windows then run over the tiny aggregated table.
    *
    * "Previous discharge row" across charge-row gaps is the running
    * last-non-null window (pandas gets it by slicing the discharge subframe).
    */
  def all(canonical: DataFrame, ratedAh: Double, dV: Double = 0.05,
          keys: Seq[String] = Seq("cycle_index"), w: Int = 1): DataFrame = {
    val cellKeys = keys.dropRight(1)
    val target = 0.5 * ratedAh
    val wOrd = ordered(keys)
    val wAll = whole(keys)
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)

    val isDis = dis
    val t = col(Canonical.TimestampCol).cast(DoubleType)
    val p = col("voltage_v") * col("current_a")
    val metric = abs(abs(col("current_a")) - target)

    // pandas groupby drops NaN keys; Spark would keep a null-key group whose
    // row sorts FIRST in wFirst (nulls-first asc) and silently become the
    // q_norm / vref anchor for the whole cell. Drop such rows up front —
    // every window below partitions by the same keys, so no other group sees
    // them.
    val keyed = canonical.filter(keys.map(col(_).isNotNull).reduce(_ && _))

    val rowed = keyed
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("tidx",
        min_by(when(isDis, col("rn")),
          when(isDis && metric.isNotNull, struct(metric, col("rn")))).over(wAll))
      .withColumn("prev_p", last(when(isDis, p), ignoreNulls = true).over(wPrev))
      .withColumn("prev_t", last(when(isDis, t), ignoreNulls = true).over(wPrev))
      .withColumn("qshift",
        col("discharge_ah") - min(when(isDis && col("voltage_v").isNotNull,
          col("discharge_ah"))).over(wAll))

    val pre = isDis && col("rn").between(col("tidx") - w, col("tidx") - 1)
    val post = isDis && col("rn").between(col("tidx"), col("tidx") + w)
    val seg = when(isDis && col("prev_p").isNotNull,
      (p + col("prev_p")) / 2 * (t - col("prev_t")))

    val perCycle = rowed.groupBy(keys.map(col): _*).agg(
      // A1: last non-null in time order
      max_by(col("discharge_ah"),
        when(col("discharge_ah").isNotNull, col("rn"))).as("Q_dis_Ah"),
      max_by(col("charge_ah"),
        when(col("charge_ah").isNotNull, col("rn"))).as("Q_chg_Ah"),
      // A4 inputs
      sum(when(isDis, 1).otherwise(0)).as("n_dis"),
      sum(when(isDis && (p.isNull || t.isNull), 1).otherwise(0)).as("n_bad"),
      sum(seg).as("e_ws"),
      // A5 inputs
      median(when(pre, col("voltage_v"))).as("pre_v"),
      median(when(post, col("voltage_v"))).as("post_v"),
      median(when(pre, col("current_a"))).as("pre_i"),
      median(when(post, col("current_a"))).as("post_i"),
      // A6 input: V-sorted (voltage, shifted capacity) pairs of discharge rows
      sort_array(collect_list(when(isDis && col("voltage_v").isNotNull &&
        col("qshift").isNotNull,
        struct(col("voltage_v").as("v"), col("qshift").as("q"))))).as("pairs"))

    val wFirst = Window.partitionBy(cellKeys.map(col): _*)
      .orderBy(col("cycle_index"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val dVc = col("post_v") - col("pre_v")
    val dIc = col("post_i") - col("pre_i")
    perCycle
      .withColumn("CE",
        when(col("Q_chg_Ah").isNull || col("Q_chg_Ah") === 0,
          lit(null).cast(DoubleType))
          .otherwise(col("Q_dis_Ah") / col("Q_chg_Ah")))
      .withColumn("q_norm", col("Q_dis_Ah") / first(col("Q_dis_Ah")).over(wFirst))
      .withColumn("E_dis_Wh",
        when(col("n_dis") < 2 || col("n_bad") > 0, lit(null).cast(DoubleType))
          .otherwise(abs(col("e_ws")) / 3600.0))
      .withColumn("IR_C2_ohm",
        when(dIc.isNull || dIc === 0 || dVc.isNull, lit(null).cast(DoubleType))
          .otherwise(abs(dVc / dIc)))
      .withColumn("dQdV_peak_V", GridInterpolate.peakUdf(lit(dV),
        expr("transform(pairs, x -> x.v)"), expr("transform(pairs, x -> x.q)")))
      .withColumn("vref",
        first(col("dQdV_peak_V"), ignoreNulls = true).over(wFirst))
      .withColumn("dQdV_shift_mV",
        when(col("dQdV_peak_V").isNotNull && col("vref").isNotNull,
          (col("dQdV_peak_V") - col("vref")) * 1000.0))
      .select((keys ++ Seq("Q_dis_Ah", "Q_chg_Ah", "CE", "q_norm", "E_dis_Wh",
        "IR_C2_ohm", "dQdV_peak_V", "dQdV_shift_mV")).map(col): _*)
  }
}
