package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured-Streaming surface over `events` (SURVEY.md §2b E7).
  *
  * The transforms are batch/stream-agnostic `DataFrame => DataFrame`
  * functions: the batch catalog queries (StreamShaped) and the streaming
  * runner below apply the SAME code, so the DuckDB oracle that validates the
  * batch result validates the streaming semantics too (modulo late-data
  * drops, which have no batch oracle — SURVEY.md §7.4 risk 8).
  *
  * Inputs are expected to carry a µs `ts_utc` TimestampType column
  * ([[graft.Tables.events]]).
  */
object EventsStreaming {

  /** Tumbling 1-hour aggregate: (hour, event_type) → count + exact sum,
    * emitted as hash-stable BIGINT micros ([[graft.functions.Carriers]]). */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Carriers.micros(
          sum(col("value").cast("decimal(18,6)"))).as("total_value_micros"))
      .select(expr("unix_micros(window.start) div 3600000000").as("hour_id"),
        col("event_type"), col("n"), col("total_value_micros"))

  /** Sliding 1-hour windows every 15 min: each event lands in 4 overlapping
    * windows (the distinct semantics vs tumbling — one row contributes to
    * slide/length windows). Window identity is its start in 15-min slots. */
  def slidingQuarters(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts_utc"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(expr("unix_micros(window.start) div 900000000").as("slot_id"),
        col("event_type"), col("n"))

  /** Session windows (30-min inactivity gap): one row per (user, session)
    * with its event count — the single stateful aggregation, so it runs AS IS
    * under `readStream` (see [[runSession]]); [[sessionStats]] adds the
    * per-user rollup, which streaming can't chain (one stateful agg per
    * query) but batch composes freely. */
  def sessionEvents(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts_utc"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        expr("unix_micros(session_window.start)").as("session_start_us"),
        col("n_events"))

  /** Per-user session stats (batch rollup over [[sessionEvents]]). */
  def sessionStats(events: DataFrame): DataFrame =
    sessionEvents(events)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max("n_events").as("max_session_events"),
        sum("n_events").as("total_events"))

  /** Distinct event types per user. The batch spelling is ONE aggregate
    * (partial count-distinct folds map-side, a single key exchange); the
    * former dropDuplicates-then-groupBy form paid a second shuffle for no
    * semantic gain here — that two-step shape lives on only in
    * [[runDedupStream]], where `dropDuplicatesWithinWatermark` is the
    * load-bearing streaming-state operator. */
  def distinctKeyCounts(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(count_distinct(col("event_type")).as("n_types"))

  /** Custom per-key state (E7 / SURVEY.md §2a.10): a running per-user
    * accumulator maintained with flatMapGroupsWithState — count, sum, and
    * last-seen ns timestamp survive across micro-batches; each batch emits
    * the updated snapshot per touched user. Works identically in batch mode
    * (full group, empty initial state). */
  case class UserAcc(n: Long, total: Double, lastTs: Long)
  case class UserSnapshot(user_id: Long, n_events: Long, total_value: Double,
                          last_ts: Long)

  def runningUserState(events: DataFrame): Dataset[UserSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"),
        col("ts").cast("long"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserAcc, UserSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, rows, state) =>
          var acc = state.getOption.getOrElse(UserAcc(0L, 0.0, Long.MinValue))
          var touched = false
          rows.foreach { case (_, v, ts) =>
            acc = UserAcc(acc.n + 1, acc.total + v, math.max(acc.lastTs, ts))
            touched = true
          }
          if (touched) {
            state.update(acc)
            Iterator.single(UserSnapshot(user, acc.n, acc.total, acc.lastTs))
          } else Iterator.empty
      }
  }

  /** Stream-stream interval join shape (purchase ⋈ views of the same user in
    * the preceding hour): the equi-key (`user_id`) keeps it a hash join with
    * a residual time predicate — state shuffles on the key, and the time
    * bound is exactly what lets streaming state expire (each view is held at
    * most 1 h past the watermark). Batch and stream run this same function.
    * µs integer time math so the DuckDB oracle replays it exactly. */
  def recentViewPairs(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts_utc").as("v_ts"),
        col("event_id").as("view_id"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_utc").as("p_ts"),
        col("event_id").as("purchase_id"))
    p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") < col("p_ts"))
      .select(col("purchase_id"), col("user_id"), col("view_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
  }

  /** Streaming runner for [[recentViewPairs]]: one file source branched into
    * two watermarked sides, joined stream-stream with the interval
    * condition, appended to a memory sink. */
  def runStreamJoin(spark: SparkSession, dir: String,
                    queryName: String): StreamingQuery = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(Tables.normalizeEventTs)
      .withWatermark("ts_utc", "1 hour")
    recentViewPairs(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
  }

  /** LEFT OUTER variant of [[recentViewPairs]]: purchases with NO view in
    * the preceding hour survive with null view columns — the streaming
    * "unmatched after timeout" semantics (nulls emit only once the
    * watermark passes the interval bound, which is exactly when state for
    * that purchase can be dropped). Batch and stream share this function. */
  def recentViewPairsLeft(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts_utc").as("v_ts"),
        col("event_id").as("view_id"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_utc").as("p_ts"),
        col("event_id").as("purchase_id"))
    p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") < col("p_ts"), "left_outer")
      .select(col("purchase_id"), col("user_id"), col("view_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
  }

  /** Streaming runner for [[recentViewPairsLeft]]: both branches carry the
    * source watermark (outer joins require it on the non-preserved side so
    * unmatched rows can be declared dead and emitted with nulls). Note the
    * inherent tail behavior: purchases younger than watermark − interval at
    * end-of-stream stay in state and never emit — the parity spec compares
    * the watermark-closed region. */
  def runStreamLeftJoin(spark: SparkSession, dir: String,
                        queryName: String): StreamingQuery = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(Tables.normalizeEventTs)
      .withWatermark("ts_utc", "1 hour")
    recentViewPairsLeft(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
  }

  /** Three-stage funnel chains: every (view → click ≤6 h → purchase ≤12 h
    * after that click) triple per user — TWO CHAINED stream-stream interval
    * joins (Spark 4 cascades append-mode time-interval joins; each stage's
    * buffered state expires as the watermark clears its interval bound).
    * Batch and stream share this function. Deliberately keeper-less ("all
    * chains"): the per-view FIRST-click keeper (w4_funnel) is an
    * aggregation that would gate every emission on watermark finality —
    * at scale you run this chain in the stream and the keeper in the
    * downstream batch hop (or foreachBatch). */
  def funnelChains(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts_utc").as("v_ts"),
        col("event_id").as("view_id"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_utc").as("c_ts"),
        col("event_id").as("click_id"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_utc").as("p_ts"),
        col("event_id").as("purchase_id"))
    // after the first join BOTH v_ts and c_ts would carry the event-time
    // marker and the second stateful join refuses ("at most one event time
    // column per stream") — demote v_ts to a plain µs long so c_ts stays
    // the sole event-time column driving stage-2 state expiry
    val vc = v.join(c, col("v_user") === col("c_user") &&
        col("c_ts") > col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 6 HOURS"))
      .select(col("c_user"), col("c_ts"), col("view_id"), col("click_id"),
        unix_micros(col("v_ts")).as("v_us"))
    vc.join(p, col("c_user") === col("user_id") &&
        col("p_ts") > col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 12 HOURS"))
      .select(col("view_id"), col("user_id"), col("click_id"),
        col("purchase_id"),
        (unix_micros(col("p_ts")) - col("v_us")).as("funnel_us"))
  }

  /** Streaming runner for [[funnelChains]]: one watermarked file source
    * branched three ways through the chained interval joins. */
  def runFunnelStream(spark: SparkSession, dir: String,
                      queryName: String): StreamingQuery = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(Tables.normalizeEventTs)
      .withWatermark("ts_utc", "1 hour")
    funnelChains(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
  }

  /** Streaming key-dedup: watermark + dropDuplicatesWithinWatermark — the
    * real streaming form of [[distinctKeyCounts]]; late duplicates beyond the
    * watermark are dropped by state expiry at scale. */
  def runDedupStream(spark: SparkSession, dir: String,
                     queryName: String): StreamingQuery = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(Tables.normalizeEventTs)
      .withWatermark("ts_utc", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type")
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
  }

  /** Latest event per (user, event_type), ordered by (ts, event_id) — the
    * batch twin of the foreachBatch merge sink's final state. */
  def latestPerKey(events: DataFrame): DataFrame =
    events
      .groupBy("user_id", "event_type")
      .agg(max_by(struct(col("ts"), col("event_id"), col("value")),
        struct(col("ts"), col("event_id"))).as("r"))
      .select(col("user_id"), col("event_type"), col("r.ts").as("ts"),
        col("r.event_id").as("event_id"), col("r.value").as("value"))

  /** foreachBatch MERGE sink — the operational pattern for maintaining a
    * keyed serving table from a change stream: each micro-batch is merged
    * into the running target with [[graft.operators.Upsert.byVersion]]
    * (last-write-wins by (ts, event_id)), so the final state is independent
    * of how the feed was split into batches and equals [[latestPerKey]] of
    * everything processed — for non-NULL keys: byVersion passes NULL-key
    * rows through unmerged per SQL MERGE semantics, while latestPerKey's
    * groupBy would lump them into one group, so a feed carrying NULL keys
    * accumulates those rows rather than collapsing them. The target lives in a temp view here (a
    * Delta/Iceberg MERGE slots into the same callback at scale);
    * localCheckpoint truncates the per-batch lineage chain exactly like the
    * CC fixpoint loop does. */
  def runForeachBatchUpsert(spark: SparkSession, dir: String,
                            viewName: String): StreamingQuery = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val cols = Seq("user_id", "event_type", "ts", "event_id", "value")
    var target = spark.read.parquet(s"$dir/events.parquet")
      .transform(Tables.normalizeEventTs)
      .select(cols.map(col): _*).limit(0).localCheckpoint(true, graft.operators.Ckpt.SerLevel)
    target.createOrReplaceTempView(viewName)
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(Tables.normalizeEventTs)
      .select(cols.map(col): _*)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val prev = target
        target = graft.operators.Upsert.byVersion(prev, batch,
          keys = Seq("user_id", "event_type"),
          version = Seq("ts", "event_id")).localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        // the new checkpoint is eager, so the previous snapshot can be
        // released — without this, every micro-batch pins one more full
        // copy of the serving table in the block store (unbounded growth
        // over a long-running stream)
        prev.unpersist()
        target.createOrReplaceTempView(viewName)
      }
      .start()
  }

  /** Streaming runner for [[runningUserState]]: file source →
    * flatMapGroupsWithState (Append, no timeout) → memory sink. Each
    * micro-batch appends the touched users' updated snapshots; the LATEST
    * snapshot per user equals the batch aggregate over everything processed
    * (StreamingSpec pins the parity). */
  def runUserStateStream(spark: SparkSession, dir: String,
                         queryName: String): StreamingQuery = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(Tables.normalizeEventTs)
    runningUserState(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
  }

  /** Streaming runner: file source → watermarked tumbling agg → memory sink.
    * Returns the started query; callers drive it with processAllAvailable().
    */
  def runTumbling(spark: SparkSession, dir: String,
                  queryName: String): StreamingQuery =
    runWindowed(spark, dir, queryName, tumblingHourly)

  /** Streaming runner for the sliding-window aggregate. */
  def runSliding(spark: SparkSession, dir: String,
                 queryName: String): StreamingQuery =
    runWindowed(spark, dir, queryName, slidingQuarters)

  /** Streaming runner for the session-window aggregate (watermarked
    * session_window state; sessions merge as events arrive). */
  def runSession(spark: SparkSession, dir: String,
                 queryName: String): StreamingQuery =
    runWindowed(spark, dir, queryName, sessionEvents)

  private def runWindowed(spark: SparkSession, dir: String, queryName: String,
                          transform: DataFrame => DataFrame): StreamingQuery = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the streaming file source wants a directory; glob-filter to the events
    // table within it
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(Tables.normalizeEventTs)
      .withWatermark("ts_utc", "1 hour")
    transform(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
  }
}
