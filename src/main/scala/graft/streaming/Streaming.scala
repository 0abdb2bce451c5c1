package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming slot (SURVEY.md §2.7 — the reference has no
  * streaming; its incremental unit is a daily date partition). The
  * `events` table's natural streaming treatment: tumbling-window counts
  * with a late-data watermark, written with the same logical plan for
  * batch and streaming inputs so the batch run is oracle-checkable and
  * the streaming run is the production path (`readStream` → this →
  * `writeStream` with checkpointing).
  */
object Streaming {

  /** Tumbling-window per-type event counts. Streaming semantics: state
    * for a window is dropped once the watermark passes its end, and
    * events older than the watermark are ignored — bounded state however
    * long the stream runs. On a batch DataFrame the watermark is a no-op
    * and this is a plain window aggregate.
    */
  def tumblingEventCounts(
      events: DataFrame,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDur) else events
    src
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))
  }

  /** Per-user running value totals via stateful streaming aggregation —
    * batch twin is a plain groupBy; streaming runs in update mode.
    */
  def userValueTotals(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,2)")).cast("double").as("total_value"))
}
