package graft.battery

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Vendor CSV → canonical time-series normalizer.
  *
  * Re-expresses the reference's `normalize()` (/root/reference/pipeline.py:16-151)
  * as one declarative Spark plan: header-map renames are metadata-only, casts are
  * lenient (`errors="coerce"` ≙ non-ANSI cast → NULL), and the one genuinely
  * eager step — the discharge-sign heuristic, which needs a data-dependent
  * scalar (/root/reference/pipeline.py:131-135) — is a single tiny aggregate.
  *
  * Scale note: the delimiter probe reads one line driver-side; everything else
  * is a distributed scan. No global sort is materialized — downstream windows
  * order by (timestamp, row_seq) inside each cycle partition instead
  * (SURVEY.md §7.4 risk 1).
  */
object Normalize {

  /** Arbin header map (/root/reference/pipeline.py:29-46). */
  val arbinMap: Seq[(String, String)] = Seq(
    "Date_Time" -> "timestamp",
    "Date Time" -> "timestamp",
    "Cycle_Index" -> "cycle_index",
    "Step_Index" -> "step_index",
    "Step_Name" -> "step_type",
    "Current(A)" -> "current_a",
    "Current(mA)" -> "current_mA",
    "Voltage(V)" -> "voltage_v",
    "Voltage(mV)" -> "voltage_mV",
    "Temperature(C)" -> "temp_c",
    "Charge_Capacity(Ah)" -> "charge_ah",
    "Charge_Capacity(mAh)" -> "charge_mAh",
    "Discharge_Capacity(Ah)" -> "discharge_ah",
    "Discharge_Capacity(mAh)" -> "discharge_mAh",
    "Test Time (s)" -> "test_time_s",
    "Test_Time(s)" -> "test_time_s")

  /** Neware header map (/root/reference/pipeline.py:47-67). */
  val newareMap: Seq[(String, String)] = Seq(
    "Record Time" -> "timestamp",
    "Cycle" -> "cycle_index",
    "Step" -> "step_index",
    "Mode" -> "step_type",
    "Status" -> "step_type",
    "Current(A)" -> "current_a",
    "Current(mA)" -> "current_mA",
    "Voltage(V)" -> "voltage_v",
    "Voltage(mV)" -> "voltage_mV",
    "NTC" -> "temp_c",
    "Temperature(℃)" -> "temp_c",
    "CapCharge(Ah)" -> "charge_ah",
    "CapDischarge(Ah)" -> "discharge_ah",
    "CHARGE_Ah" -> "charge_ah",
    "DISCHARGE_Ah" -> "discharge_ah",
    "Capacity Charge(mAh)" -> "charge_mAh",
    "Capacity Discharge(mAh)" -> "discharge_mAh",
    "Time(s)" -> "test_time_s",
    "Test Time(s)" -> "test_time_s")

  /** Step-type label normalization (/root/reference/pipeline.py:110-115) —
    * exact-match replace, unknown labels pass through uppercased. */
  val stepTypeMap: Seq[(String, String)] = Seq(
    "CC CHARGE" -> "CC_CHG", "CCC" -> "CC_CHG", "CHG" -> "CC_CHG",
    "CV CHARGE" -> "CV", "CV" -> "CV",
    "CC DISCHARGE" -> "CC_DIS", "CCD" -> "CC_DIS", "DCHG" -> "CC_DIS",
    "REST" -> "REST", "PAUSE" -> "REST", "IDLE" -> "REST")

  private val cycleCandidates = Seq("Cycle_Index", "Cycle", "cycle", "CycleIndex")
  private val stepCandidates = Seq("Step_Index", "Step", "StepIndex", "Index")

  /** Choose the delimiter the way the reference does
    * (/root/reference/pipeline.py:19-23): pandas first comma-parses and
    * retries with `;` only when the parse RAISES — which the C parser does
    * when some row has MORE comma-fields than the header (e.g. EU exports
    * with decimal commas under a `;` structure). We probe the header line
    * driver-side, and when it chooses `,`, run a distributed raggedness
    * check that early-exits on the first offending line (lines containing
    * quotes are skipped — the C parser doesn't count quoted delimiters).
    * The check is one text scan in the clean case; correctness parity with
    * the reference's raise-then-retry is worth it at CSV-ingest sizes. */
  def probeDelimiter(spark: SparkSession, path: String): String = {
    val lines = spark.read.textFile(path)
    val first = lines.head(1).headOption.getOrElse("")
    if (first.count(_ == ';') > first.count(_ == ',')) ";"
    // Header chose comma: pandas would raise on any mid-file row with more
    // comma-fields than the header and retry with `;` — and that retry
    // (almost) always SUCCEEDS, because under sep=';' a line without extra
    // semicolons is a single field, never ragged. So raggedness anywhere in
    // the body must flip the delimiter here too. The scan early-exits on
    // the first offending line; clean files pay one line-split pass.
    // Quoted lines are skipped (the C parser doesn't count quoted
    // delimiters; vendor cycler exports are unquoted).
    else {
      // raggedness ⇔ a line has MORE comma-fields than the header ⇔ its
      // comma count ≥ the header's field count. Single allocation-free char
      // scan per line (a per-line split() measured ~3 s on a 500k-row file)
      val nHeader = first.split(",", -1).length
      val ragged = !lines.filter { l =>
        var commas = 0
        var quoted = false
        var i = 0
        while (i < l.length) {
          val c = l.charAt(i)
          if (c == '"') quoted = true
          else if (c == ',') commas += 1
          i += 1
        }
        !quoted && commas >= nHeader
      }.isEmpty
      if (ragged) ";" else ","
    }
  }

  /** Lenient numeric cast: junk → NULL, and NaN literals → NULL
    * (engine policy: NaN is normalized to NULL at ingest, SURVEY.md §7.4). */
  private def num(c: Column): Column = {
    val d = c.cast(DoubleType)
    when(isnan(d), lit(null).cast(DoubleType)).otherwise(d)
  }

  private def softRename(df: DataFrame, mapping: Seq[(String, String)]): DataFrame =
    mapping.foldLeft(df) { case (acc, (from, to)) =>
      if (acc.columns.contains(from) && !acc.columns.contains(to))
        acc.withColumnRenamed(from, to)
      else acc
    }

  /** Canonical numeric targets — columns that, after header-mapping, are
    * always numeric. Used to type the CSV scan directly (permissive mode
    * nulls malformed fields — same `errors="coerce"` semantics, without an
    * all-strings intermediate). */
  private val numericTargets = Set("cycle_index", "step_index", "current_a",
    "current_mA", "voltage_v", "voltage_mV", "temp_c", "charge_ah",
    "charge_mAh", "discharge_ah", "discharge_mAh", "test_time_s")

  /** Normalize a raw vendor CSV into the canonical table. The result carries
    * the 9 canonical columns plus `row_seq` (deterministic order tiebreak). */
  def apply(spark: SparkSession, csvPath: String): DataFrame = {
    val sep = probeDelimiter(spark, csvPath)
    // type the scan from the header: headers whose mapped target is numeric
    // parse as double at read time (faster than string→cast, same NULL-on-
    // junk semantics); everything else stays string
    val header = spark.read.option("header", "true").option("sep", sep)
      .csv(csvPath).schema.fieldNames
    val mapping = (arbinMap ++ newareMap ++
      cycleCandidates.map(_ -> "cycle_index") ++
      stepCandidates.map(_ -> "step_index")).toMap
    val schema = org.apache.spark.sql.types.StructType(header.map { h =>
      val tgt = mapping.getOrElse(h.trim, h.trim)
      val dt = if (numericTargets.contains(tgt)) DoubleType
        else org.apache.spark.sql.types.StringType
      org.apache.spark.sql.types.StructField(h, dt)
    })
    val raw = spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(csvPath)
    fromRaw(withScanRowSeq(raw))
  }

  /** Scan-deterministic global row number in file order.
    *
    * A bare `monotonically_increasing_id()` encodes the partition INDEX, so
    * its order silently changes if anything re-splits or repartitions the
    * scan. This derivation is anchored to scan metadata instead: rows are
    * numbered by (file path, block start, row-within-block), where the
    * within-block position is reconstructed from the per-block minimum of the
    * monotonic id (ids are consecutive inside a scan partition and a block is
    * a contiguous run of one partition). Block offsets roll up via a prefix
    * sum over the tiny one-row-per-block table (the single-partition window
    * there holds ~1 row per 128 MB of input), and the data-sized side joins
    * the offsets by broadcast — the big table itself is never shuffled.
    * Must be applied directly to the scan frame, where `_metadata` resolves.
    *
    * COHERENCE CONTRACT: the scan executes twice — eagerly here (to collect
    * the per-block offset table) and lazily in the returned frame — and
    * row_seq is only correct if both plan identical file splits. That holds
    * because the offsets are keyed by (file, block start) and within-block
    * ids are re-anchored per block, BUT it assumes (a) the input files do
    * not change on disk between this call and the downstream action, and
    * (b) scan-split confs (`spark.sql.files.maxPartitionBytes`,
    * `openCostInBytes`) are not mutated in between — a block that exists in
    * one execution and not the other yields null offsets (loud, not silent:
    * `element_at` misses produce null row_seq, and the canonical cast
    * pipeline nulls propagate to QC). Callers that cannot pin (a)/(b) should
    * checkpoint the returned frame before mutating session state.
    */
  def withScanRowSeq(raw: DataFrame): DataFrame = {
    val tagged = raw
      .withColumn("_g_file", col("_metadata.file_path"))
      .withColumn("_g_block", col("_metadata.file_block_start"))
      .withColumn("_g_mid", monotonically_increasing_id())
    // one row per scan split — tiny. The scan underneath is column-pruned to
    // metadata + the id, so this pass only line-splits the file.
    val blocks = tagged.groupBy("_g_file", "_g_block")
      .agg(count(lit(1)).as("_g_n"), min("_g_mid").as("_g_mid0"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy { case (f, b, _, _) => (f, b) }
    val offsets = blocks.scanLeft(0L) { case (acc, (_, _, n, _)) => acc + n }
    val key = concat_ws("#", col("_g_file"), col("_g_block"))
    val offMap = typedLit(blocks.zip(offsets).map {
      case ((f, b, _, mid0), off) => s"$f#$b" -> (off - mid0)
    }.toMap)
    // row_seq = blockOffset + (mid - blockMinMid), folded into one literal
    // map lookup — no join, no extra exchange, stays in the scan's codegen
    // stage. The driver-side collect is one row per ~128 MB split (the same
    // magnitude as the driver's file listing), so it holds at cluster scale.
    tagged
      .withColumn(Canonical.RowSeq, element_at(offMap, key) + col("_g_mid"))
      .drop("_g_file", "_g_block", "_g_mid")
  }

  /** Normalization proper, starting from an all-string raw frame (so the same
    * logic serves CSV files and test fixtures). */
  def fromRaw(raw0: DataFrame): DataFrame = {
    // column-name whitespace trim (/root/reference/pipeline.py:26)
    var df = raw0.toDF(raw0.columns.toIndexedSeq.map(_.trim): _*)
    // file scans arrive with a scan-deterministic row_seq (withScanRowSeq);
    // fixture frames (single-partition local relations) fall back to the
    // monotonic id, which is deterministic there
    df = if (df.columns.contains(Canonical.RowSeq)) df
      else df.withColumn(Canonical.RowSeq, monotonically_increasing_id())
    df = softRename(softRename(df, arbinMap), newareMap)

    // timestamp (/root/reference/pipeline.py:79-85)
    df =
      if (df.columns.contains("timestamp"))
        df.withColumn("timestamp", to_timestamp(col("timestamp")))
      else if (df.columns.contains("test_time_s"))
        df.withColumn("timestamp", timestamp_seconds(num(col("test_time_s"))))
      else
        throw new IllegalArgumentException(
          "No timestamp-like column found (expected Date_Time/Record Time or Test Time (s)).")

    // cycle & step indices with candidate fallback (/root/reference/pipeline.py:88-99)
    def resolveIndex(target: String, candidates: Seq[String]): DataFrame = {
      val d = if (!df.columns.contains(target))
        candidates.find(df.columns.contains)
          .map(c => df.withColumnRenamed(c, target))
          .getOrElse(df.withColumn(target, lit(null)))
      else df
      d.withColumn(target, num(col(target)).cast(LongType))
    }
    df = resolveIndex("cycle_index", cycleCandidates)
    df = resolveIndex("step_index", stepCandidates)

    // step type, with current-sign fallback (/root/reference/pipeline.py:102-115)
    if (!df.columns.contains("step_type")) {
      val curCol =
        if (df.columns.contains("current_a")) Some("current_a")
        else if (df.columns.contains("current_mA")) Some("current_mA")
        else None
      df = curCol match {
        case Some(c) =>
          val cur = num(col(c))
          df.withColumn("step_type",
            when(cur < 0, "CC_DIS").when(cur > 0, "CC_CHG").otherwise("REST"))
        case None => df.withColumn("step_type", lit("REST"))
      }
    }
    val upperStep = upper(col("step_type").cast("string"))
    df = df.withColumn("step_type",
      stepTypeMap.foldLeft(when(lit(false), lit(null).cast("string"))) {
        case (acc, (k, v)) => acc.when(upperStep === k, v)
      }.otherwise(upperStep))

    // unit conversions mA/mV/mAh → A/V/Ah (/root/reference/pipeline.py:118-125)
    def convert(target: String, milli: String): Unit =
      if (!df.columns.contains(target) && df.columns.contains(milli))
        df = df.withColumn(target, num(col(milli)) / 1000.0)
    convert("current_a", "current_mA")
    convert("voltage_v", "voltage_mV")
    convert("charge_ah", "charge_mAh")
    convert("discharge_ah", "discharge_mAh")

    if (df.columns.contains("temp_c"))
      df = df.withColumn("temp_c", num(col("temp_c")))

    // canonical projection + required-column check (/root/reference/pipeline.py:138-145)
    for (c <- Canonical.columns if !df.columns.contains(c)) {
      if (c == "temp_c") df = df.withColumn("temp_c", lit(null).cast(DoubleType))
      else throw new IllegalArgumentException(
        s"Missing required column after normalization: $c")
    }
    df = df.select((Canonical.columns :+ Canonical.RowSeq).map(col): _*)
      .withColumn("current_a", num(col("current_a")))
      .withColumn("voltage_v", num(col("voltage_v")))
      .withColumn("charge_ah", num(col("charge_ah")))
      .withColumn("discharge_ah", num(col("discharge_ah")))

    // discharge-negative sign convention (/root/reference/pipeline.py:131-135):
    // needs a data-dependent scalar → one small aggregate action. The agg
    // plan prunes to (step_type, current_a), so the CSV parser materializes
    // only those fields; the flip itself is a lazy projection.
    val dis = col("step_type").contains("DIS")
    val frac = df.filter(dis)
      .agg(avg(when(col("current_a") > 0, 1.0).otherwise(0.0)))
      .head().getAs[Any](0)
    val flip = frac match {
      case d: java.lang.Double => d > 0.8
      case _ => false // no discharge rows, or all-null currents
    }
    if (flip) df = df.withColumn("current_a", -col("current_a"))
    df
  }

  /** Parquet sink for the canonical table (/root/reference/pipeline.py:149-150).
    * Partitioned writes happen at the caller's choice; order is carried by
    * (timestamp, row_seq), not by file layout. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
