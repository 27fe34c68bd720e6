package graft.queries

import graft.Tables
import graft.streaming.EventsStreaming

/** Batch-equivalent forms of the streaming surface (E7) plus the
  * merge/history family (M2-M5: CDC merge, SCD-2, snapshot diff,
  * incremental re-aggregation) and the training-data shaping ops (E8:
  * splits, packing, sampling, shards, rebalance, Z-order, chunking; E5:
  * JSON/complex-type/permissive parsing). Each streaming twin applies the
  * exact transform used by [[graft.streaming.EventsStreaming]] to the batch
  * `events` table, so the DuckDB oracle validates the shared semantics.
  */
object StreamShaped {

  /** Two-phase distributed prefix-sum packing (see the e8_pack_bins entry).
    * `chunkDocs` bounds the largest window partition; tests shrink it to
    * force multi-chunk offsets on small data. */
  def packBins(documents: org.apache.spark.sql.DataFrame,
               chunkDocs: Long = 8192L,
               binChars: Long = 4096L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val d = documents
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("chunk", expr(s"doc_id div $chunkDocs")) // exact at any id width
    val offsets = d.groupBy("lang", "chunk")
      .agg(sum("n_chars").as("chunk_chars"))
      .withColumn("off", coalesce(
        sum("chunk_chars").over(Window.partitionBy("lang").orderBy("chunk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("lang", "chunk", "off")
    val wLocal = Window.partitionBy("lang", "chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(offsets, Seq("lang", "chunk"))
      .withColumn("cum", col("off") + sum("n_chars").over(wLocal))
      .withColumn("bin", floor((col("cum") - col("n_chars")) / binChars))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
      .orderBy("lang", "bin")
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("e7_tumbling_hourly",
      (s, dir) => EventsStreaming.tumblingHourly(Tables.events(s, dir))
        .orderBy("hour_id", "event_type"),
      Some(s"""SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hour_id,
        event_type, count(*) AS n,
        ${graft.functions.Carriers.microsSql("sum(CAST(value AS DECIMAL(18,6)))")} AS total_value_micros
        FROM events GROUP BY 1, 2 ORDER BY hour_id, event_type""")),

    // sliding windows: an event at µs-slot q contributes to the 4 hour-long
    // windows starting at slots q-3..q (window length / slide = 4); the
    // oracle replays that membership with an explicit 0..3 offset unnest.
    // No slot_id sign guard and floor division (`//`) on the oracle side:
    // Spark's window starts are exact slide multiples (startTime = 0), so
    // `unix_micros(start) div slide` is an exact quotient, and DuckDB's `//`
    // floors — the two agree for any timestamp domain, pre-1970 included.
    QueryDef("e7_sliding_quarters",
      (s, dir) => EventsStreaming.slidingQuarters(Tables.events(s, dir))
        .orderBy("slot_id", "event_type"),
      Some("""SELECT (epoch_us(ts) // 900000000) - k AS slot_id,
          event_type, count(*) AS n
        FROM events, LATERAL (SELECT unnest(generate_series(0, 3)) AS k) t
        GROUP BY 1, 2 ORDER BY slot_id, event_type""")),

    // session_window(gap=30min): a new session starts when the gap from the
    // previous event is >= the gap duration
    QueryDef("e7_session_stats",
      (s, dir) => EventsStreaming.sessionStats(Tables.events(s, dir))
        .orderBy("user_id"),
      Some("""WITH o AS (SELECT user_id, ts,
          CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        FROM events),
        si AS (SELECT user_id, sum(brk) OVER (
          PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM o),
        g AS (SELECT user_id, sid, count(*) AS n_events
          FROM si GROUP BY user_id, sid)
        SELECT user_id, count(*) AS n_sessions,
          max(n_events) AS max_session_events, CAST(sum(n_events) AS BIGINT) AS total_events
        FROM g GROUP BY user_id ORDER BY user_id""")),

    QueryDef("e7_distinct_keys",
      (s, dir) => EventsStreaming.distinctKeyCounts(Tables.events(s, dir))
        .orderBy("user_id"),
      Some("""SELECT user_id, count(DISTINCT event_type) AS n_types
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // E7e: the stream-stream interval join's batch twin (purchase ⋈ views of
    // the same user within the preceding hour). The streaming runner
    // (EventsStreaming.runStreamJoin) executes this same function with
    // watermarks on both sides; StreamingSpec pins stream/batch parity.
    QueryDef("e7_stream_join",
      (s, dir) => EventsStreaming.recentViewPairs(Tables.events(s, dir))
        .orderBy("purchase_id", "view_id"),
      Some("""SELECT p.event_id AS purchase_id, p.user_id,
          v.event_id AS view_id, epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        FROM events p JOIN events v ON p.user_id = v.user_id
          AND epoch_us(v.ts) >= epoch_us(p.ts) - 3600000000
          AND epoch_us(v.ts) < epoch_us(p.ts)
        WHERE p.event_type = 'purchase' AND v.event_type = 'view'
        ORDER BY purchase_id, view_id""")),

    // E7g: stream-stream LEFT OUTER interval join — purchases with no view
    // in the preceding hour survive with null view columns (the streaming
    // "timed-out unmatched" row, emitted when the watermark passes the
    // interval bound — the same instant the buffered state can be freed).
    // Batch twin under driver check; the streaming runner + watermark-closed
    // parity spec live in EventsStreaming/StreamingSpec. The null-extending
    // side rides the SAME user_id hash join as the inner form — outer-ness
    // costs no extra shuffle at any scale.
    QueryDef("e7_stream_left_join",
      (s, dir) => EventsStreaming.recentViewPairsLeft(Tables.events(s, dir))
        .orderBy("purchase_id", "view_id"),
      Some("""SELECT p.event_id AS purchase_id, p.user_id,
          v.event_id AS view_id, epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        FROM events p LEFT JOIN events v ON p.user_id = v.user_id
          AND v.event_type = 'view'
          AND epoch_us(v.ts) >= epoch_us(p.ts) - 3600000000
          AND epoch_us(v.ts) < epoch_us(p.ts)
        WHERE p.event_type = 'purchase'
        ORDER BY purchase_id, view_id""")),

    // E7h: CHAINED stream-stream interval joins — the keeper-less funnel
    // (all view→click≤6h→purchase≤12h chains) whose real-time twin cascades
    // two append-mode interval joins in one streaming query
    // (EventsStreaming.funnelChains; watermark-closed parity in
    // StreamingSpec). w4_funnel adds the per-view first-click keeper on
    // top; this row pins the join-chain semantics the stream runs.
    QueryDef("e7_funnel_chains",
      (s, dir) => EventsStreaming.funnelChains(Tables.events(s, dir))
        .orderBy("view_id", "click_id", "purchase_id"),
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
            epoch_us(ts) AS ts_us FROM events)
        SELECT v.event_id AS view_id, v.user_id, c.event_id AS click_id,
          p.event_id AS purchase_id, p.ts_us - v.ts_us AS funnel_us
        FROM e v
        JOIN e c ON v.user_id = c.user_id
          AND v.event_type = 'view' AND c.event_type = 'click'
          AND c.ts_us > v.ts_us AND c.ts_us <= v.ts_us + 21600000000
        JOIN e p ON c.user_id = p.user_id AND p.event_type = 'purchase'
          AND p.ts_us > c.ts_us AND p.ts_us <= c.ts_us + 43200000000
        ORDER BY view_id, click_id, purchase_id""")),

    // E7f: the flatMapGroupsWithState custom-state path under driver check —
    // runningUserState's batch twin (per-user running count/sum/last-seen
    // snapshot; in batch each group emits exactly its final snapshot).
    // `value` is quantized to integer micros BEFORE the accumulator, so the
    // per-user total is exact integer arithmetic inside a double (< 2⁵³) —
    // independent of the arbitrary row order flatMapGroupsWithState hands
    // the group iterator, and of engine summation order. ts stays raw ns in
    // the state (max is order-free) and exits as µs for oracle parity.
    QueryDef("e7_user_state",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.events(s, dir).select(col("user_id"),
          round(col("value") * 1e6, 0).as("value"), col("ts"))
        EventsStreaming.runningUserState(ev)
          .select(col("user_id"), col("n_events"),
            col("total_value").cast("long").as("total_micros"),
            expr("last_ts div 1000").as("last_ts_us"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_events,
          CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS BIGINT)
            AS total_micros,
          epoch_us(max(ts)) AS last_ts_us
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // M2: versioned CDC merge — last-write-wins by (ts, event_id) across an
    // arbitrarily split change feed (here: even event_ids as the base table,
    // odd as the update stream). Unlike m1's SCD-1 upsert, precedence comes
    // from a version tuple IN the data, so the result is independent of how
    // the feed was batched — the property the foreachBatch streaming sink
    // relies on (EventsStreaming.runForeachBatchUpsert runs this same
    // operator per micro-batch; StreamingSpec pins the parity). One key
    // shuffle, no join.
    QueryDef("m2_cdc_merge",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        // µs version column on BOTH sides: DuckDB reads parquet ns
        // timestamps at µs precision, so ns ordering would let the keeper
        // diverge on sub-µs ties the oracle cannot see
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            expr("ts div 1000").as("ts_us"), col("event_id"), col("value"))
        graft.operators.Upsert.byVersion(
            e.filter(col("event_id") % 2 === 0),
            e.filter(col("event_id") % 2 === 1),
            keys = Seq("user_id", "event_type"),
            version = Seq("ts_us", "event_id"))
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
        FROM (SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type
            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events) t
        WHERE rn = 1 ORDER BY user_id, event_type""")),

    // M6: delete-aware CDC apply — the change feed carries an op column
    // (every 7th event stands in for a DELETE tombstone); the final state
    // keeps, per key, the LATEST version's row — unless that latest op is
    // the tombstone, in which case the key vanishes entirely. Same
    // one-shuffle window-keeper shape as m2; the tombstone filter is one
    // predicate after the keeper (deletes must win by recency, not by
    // presence — an older delete followed by a newer upsert resurrects).
    QueryDef("m6_cdc_deletes",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        val feed = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            expr("ts div 1000").as("ts_us"), col("event_id"), col("value"),
            when(col("event_id") % 7 === 0, "D").otherwise("U").as("op"))
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts_us").desc, col("event_id").desc)
        feed.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("op") =!= "D")
          .select("user_id", "event_type", "ts_us", "event_id", "value")
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, ts_us, event_id, value
        FROM (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
            value,
            CASE WHEN event_id % 7 = 0 THEN 'D' ELSE 'U' END AS op,
            row_number() OVER (PARTITION BY user_id, event_type
              ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1 AND op <> 'D'
        ORDER BY user_id, event_type""")),

    // M3: SCD-2 history build — m2 keeps only the latest version per key;
    // this keeps EVERY version as a validity interval [valid_from, valid_to)
    // with an open-ended current row, the standard dimension-history rebuild.
    // Versions ride the same µs carrier as m2 (DuckDB reads parquet ns
    // timestamps at µs precision). The 'purchase' filter keeps the driver
    // dump proportionate; the operator itself is filter-free. One key
    // shuffle (the lead window), no join — see Upsert.scd2.
    QueryDef("m3_scd2",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val changes = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), expr("ts div 1000").as("valid_from_us"),
            col("event_id"), col("value"))
        graft.operators.Upsert.scd2(changes, keys = Seq("user_id"),
            version = Seq("valid_from_us", "event_id"), validTo = "valid_to_us")
          .orderBy("user_id", "valid_from_us", "event_id")
      },
      Some("""SELECT user_id, epoch_us(ts) AS valid_from_us, event_id, value,
          lead(epoch_us(ts)) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS valid_to_us,
          CAST(lead(epoch_us(ts)) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) IS NULL AS INT) AS is_current
        FROM events WHERE event_type = 'purchase'
        ORDER BY user_id, valid_from_us, event_id""")),

    // M4: snapshot diff (data reconciliation) — given two keyed versions of
    // a table, classify every key as added / removed / changed / unchanged
    // and count which columns drifted: the audit an ingestion pipeline runs
    // before promoting a new snapshot. Column comparison is NULL-SAFE
    // (<=> — a null→null value must read unchanged, not changed; plain =
    // would three-value its way into the wrong bucket). One full-outer hash
    // join on the key + a 4-row agg: at 100 TB both snapshots bucket by the
    // key and the join is co-partitioned, zero extra shuffles. Deterministic
    // derived snapshots (mod filters + a doubled value band) stand in for
    // two real versions.
    QueryDef("m4_snapshot_diff",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val e = Tables.events(s, dir)
          .select("event_id", "event_type", "value")
        val base = e.filter(col("event_id") % 11 =!= 0)
        val curr = e.filter(col("event_id") % 13 =!= 0)
          .withColumn("value", when(col("event_id") % 5 === 0,
            col("value") * 2).otherwise(col("value")))
        val b = base.select(col("event_id").as("bk"),
          col("event_type").as("bt"), col("value").as("bv"))
        val c = curr.select(col("event_id").as("ck"),
          col("event_type").as("ct"), col("value").as("cv"))
        val vdiff = !(col("bv") <=> col("cv"))
        val tdiff = !(col("bt") <=> col("ct"))
        val both = col("bk").isNotNull && col("ck").isNotNull
        b.join(c, col("bk") === col("ck"), "full_outer")
          .select(
            when(col("bk").isNull, "added")
              .when(col("ck").isNull, "removed")
              .when(vdiff || tdiff, "changed")
              .otherwise("unchanged").as("status"),
            (both && vdiff).cast("long").as("vd"),
            (both && tdiff).cast("long").as("td"))
          .groupBy("status")
          .agg(count(lit(1)).as("n"), sum("vd").as("n_value_diff"),
            sum("td").as("n_type_diff"))
          .orderBy("status")
      },
      Some("""WITH base AS (SELECT event_id, event_type, value FROM events
          WHERE event_id % 11 <> 0),
        curr AS (SELECT event_id, event_type,
            CASE WHEN event_id % 5 = 0 THEN value * 2 ELSE value END AS value
          FROM events WHERE event_id % 13 <> 0),
        d AS (SELECT
            CASE WHEN b.event_id IS NULL THEN 'added'
              WHEN c.event_id IS NULL THEN 'removed'
              WHEN b.value IS DISTINCT FROM c.value
                OR b.event_type IS DISTINCT FROM c.event_type THEN 'changed'
              ELSE 'unchanged' END AS status,
            CASE WHEN b.event_id IS NOT NULL AND c.event_id IS NOT NULL
              AND b.value IS DISTINCT FROM c.value THEN 1 ELSE 0 END AS vd,
            CASE WHEN b.event_id IS NOT NULL AND c.event_id IS NOT NULL
              AND b.event_type IS DISTINCT FROM c.event_type THEN 1 ELSE 0 END
              AS td
          FROM base b FULL OUTER JOIN curr c ON b.event_id = c.event_id)
        SELECT status, count(*) AS n,
          CAST(sum(vd) AS BIGINT) AS n_value_diff,
          CAST(sum(td) AS BIGINT) AS n_type_diff
        FROM d GROUP BY status ORDER BY status""")),

    // M5: incremental re-aggregation — merge YESTERDAY'S rollup (already
    // count/sum per key) with today's raw delta by aggregating the delta to
    // the same partial shape and summing the partials: count ← Σcount,
    // sum ← Σsum. The daily-rollup pattern that lets a 100 TB table update
    // its aggregate from the day's slice only, never re-scanning history.
    // The oracle computes the FULL aggregate from scratch — the hash match
    // is the proof that merge(partial(A), partial(B)) = agg(A ∪ B).
    QueryDef("m5_incremental_agg",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val e = Tables.events(s, dir).select(col("event_id"), col("user_id"),
          round(col("value") * 1e6, 0).cast("long").as("vu"))
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id").agg(count(col("vu")).as("n"),
            sum("vu").as("total_micros"))
        partial(e.filter(col("event_id") % 2 === 0))   // yesterday's rollup
          .unionByName(partial(e.filter(col("event_id") % 2 === 1))) // delta
          .groupBy("user_id")
          .agg(sum("n").as("n"), sum("total_micros").as("total_micros"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(CAST(round(value * 1e6) AS BIGINT)) AS n,
          CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
            AS total_micros
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // E8a: deterministic train/val/test hash split (Knuth multiplicative
    // hash — exact 64-bit integer arithmetic, portable to any SQL engine;
    // the scalable, reproducible alternative to TABLESAMPLE)
    QueryDef("e8_hash_split",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val h = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
        val split = when(pmod(h, lit(100L)) < 80, "train")
          .when(pmod(h, lit(100L)) < 90, "val").otherwise("test")
        Tables.documents(s, dir)
          .withColumn("split", split)
          .groupBy("split")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"),
            min("doc_id").as("first_doc"))
          .orderBy("split")
      },
      Some("""SELECT split, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars,
        min(doc_id) AS first_doc FROM (
          SELECT doc_id, n_chars,
            CASE WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
                 WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
                 ELSE 'test' END AS split
          FROM documents) t
        GROUP BY split ORDER BY split""")),

    // E8j: deterministic round-robin source INTERLEAVE — the training-order
    // step that alternates sources so no batch window sees one source only.
    // The global position is CLOSED-FORM (pos = within-source rank × 20 +
    // source index), so no global window/sort ever runs: one per-source
    // rank window, then map-side arithmetic — the trick that makes a
    // deterministic global training order embarrassingly parallel. The
    // catalog row emits the first 3 rounds as the verifiable sample.
    QueryDef("e8_interleave",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        val wSrc = Window.partitionBy("source").orderBy("doc_id")
        Tables.documents(s, dir)
          .withColumn("rk", row_number().over(wSrc).cast("long") - 1)
          .withColumn("src_idx",
            expr("CAST(substring(source, 4) AS BIGINT)"))
          .withColumn("pos", col("rk") * 20 + col("src_idx"))
          .filter(col("pos") < 60)
          .select(col("pos"), col("source"), col("doc_id"))
          .orderBy("pos")
      },
      Some("""SELECT (rk - 1) * 20 + CAST(substring(source, 4) AS BIGINT)
            AS pos, source, doc_id
        FROM (SELECT source, doc_id, row_number() OVER (
            PARTITION BY source ORDER BY doc_id) AS rk FROM documents) t
        WHERE (rk - 1) * 20 + CAST(substring(source, 4) AS BIGINT) < 60
        ORDER BY pos""")),

    // E8i: fixed-size deterministic per-group sample — exactly k docs per
    // language, chosen by a salted content-independent hash order (the
    // "give me k examples per language for eval" op; e8_stratified_sample
    // is its fraction-based sibling and cannot pin an exact count). The
    // rank<=k window prunes inside the shuffle via WindowGroupLimit, so at
    // 100 TB each map task forwards at most k rows per group it sees.
    QueryDef("e8_group_sample",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        val h = pmod(col("doc_id") * lit(2654435761L) + lit(777L),
          lit(4294967296L))
        val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
        Tables.documents(s, dir)
          .withColumn("h", h)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("lang"), col("rk").cast("long").as("rk"),
            col("doc_id"), col("n_chars"))
          .orderBy("lang", "rk")
      },
      Some("""SELECT lang, rk, doc_id, n_chars FROM (
          SELECT lang, doc_id, n_chars, row_number() OVER (
            PARTITION BY lang
            ORDER BY (doc_id * 2654435761 + 777) % 4294967296, doc_id) AS rk
          FROM documents) t
        WHERE rk <= 5 ORDER BY lang, rk""")),

    // E8b: greedy sequence packing — assign docs (in deterministic order) to
    // ~4096-char training bins per language via a running sum; the shape of
    // packing tokenized documents into fixed context windows.
    //
    // Two-phase distributed prefix sum, NOT one window partition per
    // language (which would force a whole language's corpus through a single
    // task): docs are sliced into bounded doc_id chunks, per-(lang, chunk)
    // subtotals roll up to cumulative chunk offsets on the tiny subtotal
    // table (one row per chunk), and the final running sum is local to a
    // (lang, chunk) partition plus its broadcast-scale offset. The subtotal
    // join key equals the local window's partition key, so the plan reuses
    // one (lang, chunk) exchange.
    QueryDef("e8_pack_bins",
      (s, dir) => packBins(Tables.documents(s, dir)),
      Some("""SELECT lang, bin, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
        FROM (SELECT lang, doc_id, n_chars,
          CAST(floor((sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars)
            / 4096) AS BIGINT) AS bin
          FROM documents) t
        GROUP BY lang, bin ORDER BY lang, bin""")),

    // E8c: deterministic STRATIFIED sampling — per-stratum rates via a
    // portable md5-derived hash threshold (same md5Hash60 family as the
    // simhash companion, so DuckDB replays it bit-for-bit). Fully map-side:
    // no shuffle, no TABLESAMPLE nondeterminism, reproducible across runs
    // and engines, and the per-stratum keep rate is exact in expectation at
    // any scale. Salting the hash input with the stratum decorrelates
    // sampling decisions across strata for ids that repeat.
    QueryDef("e8_stratified_sample",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val h = graft.functions.TextFunctions.md5Hash60(
          concat(col("lang"), lit(":"), col("doc_id").cast("string")))
        val permille = when(col("lang") === "en", 500L).otherwise(200L)
        Tables.documents(s, dir)
          .withColumn("bucket", h % 1000)
          .filter(col("bucket") < permille)
          .select(col("doc_id"), col("lang"), col("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang, h % 1000 AS bucket FROM (
          SELECT doc_id, lang,
            ${graft.functions.TextFunctions.md5Hash60Sql(
              "lang || ':' || CAST(doc_id AS VARCHAR)")} AS h
          FROM documents) t
        WHERE h % 1000 < CASE WHEN lang = 'en' THEN 500 ELSE 200 END
        ORDER BY doc_id""")),

    // E8g: QUALITY-WEIGHTED sampling — per-row keep-probability derived from
    // a quality proxy (here doc length, clamped to [0.1, 1.0]), the
    // importance-resampling step data-mixing pipelines run when upweighting
    // high-quality sources. Same portable md5-derived uniform as
    // e8_stratified_sample (distinct salt so the two samples are
    // independent); entirely map-side — the sample decision is a row-local
    // predicate, no shuffle at any corpus size, and re-running yields the
    // identical sample (reproducibility is the point vs rand()).
    QueryDef("e8_weighted_sample",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val h = graft.functions.TextFunctions.md5Hash60(
          concat(lit("ws:"), col("doc_id").cast("string")))
        Tables.documents(s, dir)
          .withColumn("p_permille",
            least(lit(1000L), greatest(lit(100L), col("n_chars"))))
          .withColumn("bucket", h % 1000)
          .filter(col("bucket") < col("p_permille"))
          .select(col("doc_id"), col("p_permille"), col("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, p_permille, h % 1000 AS bucket FROM (
          SELECT doc_id, least(1000, greatest(100, n_chars)) AS p_permille,
            ${graft.functions.TextFunctions.md5Hash60Sql(
              "'ws:' || CAST(doc_id AS VARCHAR)")} AS h
          FROM documents) t
        WHERE h % 1000 < p_permille ORDER BY doc_id""")),

    // E8h: MIXTURE REBALANCE — downsample every language to the smallest
    // language's size (the "equalize domains" step of training-data mixing):
    // phase 1 is a tiny per-source count aggregate (partial-agg, ~1 row per
    // source), phase 2 broadcasts the derived per-source keep rate back and
    // samples with the portable salted hash — so the actual row decision is
    // map-side and reproducible, and NOTHING corpus-sized shuffles. Emitted
    // as the per-source audit summary (total, rate, kept) the pipeline
    // would log.
    QueryDef("e8_mix_rebalance",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.documents(s, dir)
        // per-lang counts feed both the min target and the rate table:
        // materialize the ~1-row-per-lang aggregate once or the corpus
        // count scan runs twice
        val counts = d.groupBy("lang").agg(count(lit(1)).as("n_total"))
          .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        val target = counts.agg(min("n_total").as("m"))
        val rates = counts.crossJoin(broadcast(target))
          .withColumn("rate_permille", floor(lit(1000) * col("m") / col("n_total")))
          .select("lang", "n_total", "rate_permille")
        val h = graft.functions.TextFunctions.md5Hash60(
          concat(lit("mix:"), col("doc_id").cast("string")))
        d.join(broadcast(rates), "lang")
          .filter(h % 1000 < col("rate_permille"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"))
          .join(rates, "lang")
          .select(col("lang"), col("n_total"), col("rate_permille"),
            col("n_kept"))
          .orderBy("lang")
      },
      Some(s"""WITH counts AS (SELECT lang, count(*) AS n_total
          FROM documents GROUP BY lang),
        rates AS (SELECT lang, n_total,
            CAST(floor(1000.0 * (SELECT min(n_total) FROM counts) / n_total)
              AS BIGINT) AS rate_permille
          FROM counts),
        kept AS (SELECT d.lang, count(*) AS n_kept
          FROM documents d JOIN rates r ON d.lang = r.lang
          WHERE ${graft.functions.TextFunctions.md5Hash60Sql(
            "'mix:' || CAST(doc_id AS VARCHAR)")} % 1000 < r.rate_permille
          GROUP BY d.lang)
        SELECT lang, n_total, rate_permille, n_kept
        FROM rates JOIN kept USING (lang) ORDER BY lang""")),

    // E8d: Z-ORDER layout — the multi-column data-clustering write a 100 TB
    // table runs so range predicates on EITHER key prune files (Delta/Iceberg
    // OPTIMIZE ZORDER). The curve math is the operator: interleave the low
    // 16 bits of both keys so near points on (partkey, suppkey) are near on
    // the 1-D z line; at scale the z column feeds
    // repartitionByRange(z).sortWithinPartitions(z) before the parquet write
    // (boundary sampling makes the partition split nondeterministic, so the
    // driver row checks the deterministic curve + bucket histogram instead).
    // The interleave is the branch-free magic-shift spread (each key's 16
    // bits spread to even positions in 4 shift-mask steps), NOT a 16-round
    // higher-order-function loop: HOF lambdas evaluate interpreted, and the
    // measured loop form cost 10.5 s at sf0.1 vs 1.3 s for this spelling —
    // pure integer shifts that stay inside whole-stage codegen and that
    // DuckDB replays with the same operators.
    QueryDef("e8_zorder",
      (s, dir) => {
        import org.apache.spark.sql.Column
        import org.apache.spark.sql.functions._
        def spread(c: Column): Column = {
          val s1 = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x00FF00FFL))
          val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
          val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
          (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
        }
        Tables.lineitem(s, dir)
          .select((col("l_partkey") % 65536).as("x"),
            (col("l_suppkey") % 65536).as("y"))
          .withColumn("z",
            spread(col("x")).bitwiseOR(shiftleft(spread(col("y")), 1)))
          .groupBy((col("z") / 4096L).cast("long").as("z_bucket"))
          .agg(count(lit(1)).as("n"), min("z").as("z_min"), max("z").as("z_max"))
          .orderBy("z_bucket")
      },
      Some("""WITH k AS (SELECT l_partkey % 65536 AS x, l_suppkey % 65536 AS y
          FROM lineitem),
        sx AS (SELECT x, y, (x | (x << 8)) & 16711935 AS a1,
                            (y | (y << 8)) & 16711935 AS b1 FROM k),
        s2 AS (SELECT (a1 | (a1 << 4)) & 252645135 AS a2,
                      (b1 | (b1 << 4)) & 252645135 AS b2 FROM sx),
        s3 AS (SELECT (a2 | (a2 << 2)) & 858993459 AS a3,
                      (b2 | (b2 << 2)) & 858993459 AS b3 FROM s2),
        s4 AS (SELECT (a3 | (a3 << 1)) & 1431655765 AS a4,
                      (b3 | (b3 << 1)) & 1431655765 AS b4 FROM s3)
        SELECT CAST(floor(z / 4096.0) AS BIGINT) AS z_bucket,
          count(*) AS n, min(z) AS z_min, max(z) AS z_max
        FROM (SELECT a4 | (b4 << 1) AS z FROM s4) t
        GROUP BY 1 ORDER BY 1""")),

    // E8e: overlapping chunk spans — splitting long documents into
    // fixed-size windows with overlap (512-char chunks, 384 stride) before
    // embedding/tokenization. Pure per-row explosion (map-side, no shuffle);
    // span math is exact integers so the oracle replays it literally.
    QueryDef("e8_chunk_spans",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.documents(s, dir)
          .filter(col("n_chars") > 0)
          .select(col("doc_id"), col("n_chars"),
            explode(sequence(lit(0L), col("n_chars") - 1, lit(384L)))
              .as("start"))
          .select(col("doc_id"),
            (col("start") / 384).cast("long").as("chunk_id"),
            col("start"),
            least(col("start") + 512, col("n_chars")).as("end"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""SELECT doc_id, start // 384 AS chunk_id, start,
          least(start + 512, n_chars) AS "end"
        FROM (SELECT doc_id, n_chars,
          unnest(generate_series(0, n_chars - 1, 384)) AS start
          FROM documents WHERE n_chars > 0) t
        ORDER BY doc_id, chunk_id""")),

    // E8h: deterministic global shuffle into training shards — the step that
    // turns a curated corpus into N pseudo-randomly ordered shard files for
    // sequential training reads. Order key = Knuth multiplicative hash
    // (salted so it cannot correlate with e8_hash_split's split assignment),
    // shard = hash mod 16. At 100 TB the write path is
    // `repartition(N, shard).sortWithinPartitions(h)` — one shuffle, each
    // task streams one sorted shard to disk. The catalog row emits per-shard
    // stats incl. the hash-order head/tail doc so the ORDER a reader would
    // see is pinned by the oracle, not just membership. The (h, doc_id)
    // order key is PACKED into one long (h < 2³², doc_id < 2³¹ → < 2⁶³) so
    // head/tail are plain min/max — a hash aggregate; the min_by-on-struct
    // spelling planned a SortAggregate that sorts every partition by shard
    // first (measured in the plan, not guessed).
    QueryDef("e8_shuffle_shards",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val h = pmod(col("doc_id") * lit(2654435761L) + lit(40503L),
          lit(4294967296L))
        Tables.documents(s, dir)
          .withColumn("hk", h * lit(2147483648L) + col("doc_id"))
          .withColumn("shard", pmod(h, lit(16L)))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"),
            pmod(min("hk"), lit(2147483648L)).as("head_doc"),
            pmod(max("hk"), lit(2147483648L)).as("tail_doc"))
          .orderBy("shard")
      },
      Some("""WITH t AS (SELECT doc_id, n_chars,
            (doc_id * 2654435761 + 40503) % 4294967296 AS h
          FROM documents)
        SELECT h % 16 AS shard, count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS chars,
          min(h * 2147483648 + doc_id) % 2147483648 AS head_doc,
          max(h * 2147483648 + doc_id) % 2147483648 AS tail_doc
        FROM t GROUP BY 1 ORDER BY 1""")),

    // E5b: complex-type shredding round-trip — JSON field → struct rows →
    // per-key array<struct> (collect_list is order-NONDETERMINISTIC, so
    // array_sort on the unique (ts, id) prefix restores a total order) →
    // slice → posexplode back to relational rows with field access. Pins
    // the nested-type surface (struct/array build, sort, slice, explode,
    // dot-path field read) under the driver hash. The collect_list here is
    // bounded by per-user cardinality; for unbounded keys the windowed
    // top-k (e6) is the scale spelling — this row exists for the TYPE
    // semantics, which parquet nested pruning (FormatsSpec) completes.
    QueryDef("e5_nested_shred",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.events(s, dir)
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("user_id")
          .agg(slice(array_sort(collect_list(
            struct(col("ts_us"), col("event_id"), col("k")))), 1, 3)
            .as("head3"))
          .select(col("user_id"), posexplode(col("head3")).as(Seq("pos", "r")))
          .select(col("user_id"), col("pos").cast("long").as("pos"),
            col("r.ts_us").as("ts_us"), col("r.event_id").as("event_id"),
            col("r.k").as("k"))
          .orderBy("user_id", "pos")
      },
      Some("""SELECT user_id, CAST(rn - 1 AS BIGINT) AS pos, ts_us, event_id, k
        FROM (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS rn
          FROM events) t
        WHERE rn <= 3 ORDER BY user_id, pos""")),

    // E5d: PERMISSIVE parsing of a dirty JSON feed — every 10th props is
    // truncated (deterministically) before from_json; malformed rows parse
    // to NULL and are COUNTED, not dropped and not fatal — the
    // error-tolerance contract a 100 TB ingest needs (one bad row in a
    // billion must not kill the job, and the bad-row rate is a monitored
    // output). Map-side parse + small agg.
    QueryDef("e5_json_permissive",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val dirty = when(col("event_id") % 10 === 0,
          expr("substring(props, 1, length(props) - 1)")).otherwise(col("props"))
        Tables.events(s, dir)
          .select(col("event_type"),
            from_json(dirty, org.apache.spark.sql.types.StructType.fromDDL(
              "k LONG")).getField("k").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("k").isNull.cast("long")).as("n_bad"),
            sum("k").as("k_sum"))
          .orderBy("event_type")
      },
      // oracle nuance: the malformed-row guard must be a NESTED CASE, not
      // `json_valid(p) AND json_extract_string(p, ...)` — DuckDB CASE
      // branches short-circuit but a vectorized AND evaluates both
      // conjuncts on large batches, so json_extract throws on the dirty
      // rows at sf0.1 while a small-fixture run happens to pass
      // (found replaying the full oracle at sf0.1, round 12)
      Some("""WITH d AS (SELECT event_type,
            CASE WHEN event_id % 10 = 0
              THEN substring(props, 1, length(props) - 1)
              ELSE props END AS p
          FROM events)
        SELECT event_type, count(*) AS n,
          CAST(sum(CASE WHEN json_valid(p)
              THEN CASE WHEN json_extract_string(p, '$.k') IS NOT NULL
                THEN 0 ELSE 1 END
              ELSE 1 END) AS BIGINT) AS n_bad,
          CAST(sum(CASE WHEN json_valid(p)
            THEN CAST(json_extract_string(p, '$.k') AS BIGINT) END)
            AS BIGINT) AS k_sum
        FROM d GROUP BY event_type ORDER BY event_type""")),

    // E5: JSON property extraction from the event props column
    QueryDef("e5_json_props",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.events(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("k").as("k_sum"), min("k").as("k_min"), max("k").as("k_max"),
            (sum("k").cast("double") / count(col("k"))).as("k_avg"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
        CAST(sum(k) AS BIGINT) AS k_sum, min(k) AS k_min, max(k) AS k_max,
        CAST(sum(k) AS DOUBLE) / count(k) AS k_avg
        FROM (SELECT event_type,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t
        GROUP BY event_type ORDER BY event_type"""))
  )
}
