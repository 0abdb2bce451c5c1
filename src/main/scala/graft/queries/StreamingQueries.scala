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
        FROM events WHERE user_id < 50 GROUP BY user_id ORDER BY user_id"""))
  )
}
