package graft.queries

import graft.Tables
import graft.streaming.Streaming
import org.apache.spark.sql.functions._

/** Batch twins of the streaming jobs (SURVEY.md §2.7 stretch slot): the
  * same logical plans run under `readStream` in production; here they run
  * over the batch events table so the DuckDB oracle can check them.
  */
object StreamingQueries extends QueryModule {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("streaming_tumbling_counts",
      (s, dir) => Streaming.tumblingEventCounts(Tables.load(s, dir, "events"))
        .orderBy("window_start", "event_type"),
      Some("""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
          event_type, count(*) AS n_events
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""")),

    QueryDef("streaming_user_totals",
      (s, dir) => Streaming.userValueTotals(
          Tables.load(s, dir, "events").filter(col("user_id") < 50))
        .orderBy("user_id"),
      Some("""SELECT user_id, count(*) AS n_events,
          CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value
        FROM events WHERE user_id < 50 GROUP BY user_id ORDER BY user_id""")),

    // Sessionization batch twin (6h inactivity gap). The streaming path
    // (flatMapGroupsWithState, event-time timeout) is asserted equal to
    // this plan in StreamingSpec — this row anchors both to DuckDB.
    QueryDef("streaming_sessionization",
      (s, dir) => Streaming.sessionize(Tables.load(s, dir, "events"), gapMinutes = 360)
        .orderBy("user_id", "session_start"),
      Some("""WITH e AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        f AS (SELECT user_id, event_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts - lag(ts) OVER w) > 21600 THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        g AS (SELECT user_id, ts,
            sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS sidx
          FROM f)
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
          count(*) AS n_events
        FROM g GROUP BY user_id, sidx ORDER BY user_id, session_start""")),

    // Streaming exact dedup: a doubled corpus collapses back to the
    // original through dropDuplicates on the event id (streaming form:
    // dropDuplicatesWithinWatermark, asserted in StreamingSpec).
    QueryDef("streaming_dedup",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        Streaming.dedupEvents(ev.unionByName(ev))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(20,2)")).cast("double").as("value_sum"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS value_sum
        FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
