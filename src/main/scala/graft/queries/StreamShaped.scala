package graft.queries

import graft.Tables
import graft.streaming.EventsStreaming

/** Batch-equivalent forms of the streaming surface (E7). Each applies the
  * exact transform used by [[graft.streaming.EventsStreaming]] to the batch
  * `events` table, so the DuckDB oracle validates the shared semantics.
  */
object StreamShaped {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("e7_tumbling_hourly",
      (s, dir) => EventsStreaming.tumblingHourly(Tables.events(s, dir))
        .orderBy("hour_id", "event_type"),
      Some("""SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hour_id,
        event_type, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY hour_id, event_type""")),

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
          max(n_events) AS max_session_events, sum(n_events) AS total_events
        FROM g GROUP BY user_id ORDER BY user_id""")),

    QueryDef("e7_distinct_keys",
      (s, dir) => EventsStreaming.distinctKeyCounts(Tables.events(s, dir))
        .orderBy("user_id"),
      Some("""SELECT user_id, count(DISTINCT event_type) AS n_types
        FROM events GROUP BY user_id ORDER BY user_id""")),

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
        sum(k) AS k_sum, min(k) AS k_min, max(k) AS k_max,
        CAST(sum(k) AS DOUBLE) / count(k) AS k_avg
        FROM (SELECT event_type,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t
        GROUP BY event_type ORDER BY event_type"""))
  )
}
