package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics through MemoryStream micro-batches: windowed
  * emission on watermark advance, late-data drop, batch/streaming parity.
  */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling counts emit on watermark passing; late events are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val counts = Streaming.tumblingEventCounts(
      mem.toDF().toDF("ts", "event_type"), "1 hour", "30 minutes")
    val q = counts.writeStream.format("memory")
      .queryName("stream_counts").outputMode("append").start()
    try {
      // window [10:00, 11:00): two clicks; then an event at 12:00 pushes
      // the watermark to 11:30 > 11:00 → the window finalizes
      mem.addData((ts("2024-01-01 10:05:00"), "click"),
        (ts("2024-01-01 10:40:00"), "click"))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 12:00:00"), "view"))
      q.processAllAvailable()
      // a late click for the finalized 10:00 window — older than the
      // watermark, must NOT change results
      mem.addData((ts("2024-01-01 10:10:00"), "click"))
      q.processAllAvailable()
      val rows = spark.table("stream_counts")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set((ts("2024-01-01 10:00:00"), "click", 2L)))
    } finally q.stop()
  }

  test("batch and streaming plans produce identical window counts") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (ts("2024-01-01 10:05:00"), "click"), (ts("2024-01-01 10:59:00"), "view"),
      (ts("2024-01-01 11:05:00"), "click"), (ts("2024-01-01 13:00:00"), "click"))
    val batch = Streaming.tumblingEventCounts(data.toDF("ts", "event_type"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val mem = MemoryStream[(Timestamp, String)]
    val q = Streaming.tumblingEventCounts(mem.toDF().toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("stream_parity")
      .outputMode("complete").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_parity")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(batch.size == 4)
    } finally q.stop()
  }

  test("stateful user totals run in update mode with bounded output") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = Streaming.userValueTotals(
        mem.toDF().toDF("user_id", "value").withColumn("ts", current_timestamp()))
      .writeStream.format("memory").queryName("user_totals")
      .outputMode("update").start()
    try {
      mem.addData((1L, 10.0), (1L, 5.5), (2L, 1.0))
      q.processAllAvailable()
      mem.addData((1L, 4.5))
      q.processAllAvailable()
      // update mode re-emits changed keys; latest row per key is the total
      val latest = spark.table("user_totals")
        .groupBy("user_id").agg(max(struct(col("n_events"), col("total_value"))).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.total_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(latest == Set((1L, 3L, 20.0), (2L, 1L, 1.0)))
    } finally q.stop()
  }
}
