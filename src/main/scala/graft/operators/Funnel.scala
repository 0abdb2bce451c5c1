package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel stage assignment (view → click ≤ 60 min → purchase
  * ≤ 24 h), the reference's conversion-funnel analysis re-expressed as
  * running per-user window maxes: `last qualifying stage-N event time`
  * carried forward lets each row qualify against the stage before it in
  * ONE pass per stage — no per-user collect, no self-joins.
  *
  * Scale shape: everything partitions by `user_id`; a hot user routes
  * all its rows through one task, where cost is the task-local sort
  * (O(rows·log rows)) — out-of-order arrival needs no repair pass,
  * because the window's (t, event_id) sort re-establishes event order
  * per user regardless of input layout. ScalingSmokeSpec stresses a
  * planted hot key holding 20% of sf10's events.
  *
  * Input needs columns (user_id, event_id, event_type, ts).
  */
object Funnel {
  /** Per-user final funnel stage: 0 none, 1 viewed, 2 qualified click,
    * 3 qualified purchase.
    */
  def userStages(events: DataFrame): DataFrame = {
    val run = Window.partitionBy("user_id").orderBy("t", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wClick = 60L * 60 * 1000000    // view→click: 60 min, micros
    val wBuy = 24L * 3600 * 1000000    // click→purchase: 24 h
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .withColumn("last_view",
        max(when(col("event_type") === "view", col("t"))).over(run))
      .withColumn("qc", when(col("event_type") === "click" &&
        col("last_view").isNotNull &&
        col("t") - col("last_view") <= wClick, col("t")))
      .withColumn("last_qc", max(col("qc")).over(run))
      .withColumn("qp", when(col("event_type") === "purchase" &&
        col("last_qc").isNotNull &&
        col("t") - col("last_qc") <= wBuy, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(max(when(col("qp") === 1, 3).when(col("qc").isNotNull, 2)
        .when(col("event_type") === "view", 1).otherwise(0)).as("stage"))
  }

  /** Stage histogram over users — the registered query's output shape. */
  def stageCounts(events: DataFrame): DataFrame =
    userStages(events)
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
}
