package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives (north-star 100 TB posture).
  *
  * Spark's AQE re-splits skewed partitions for joins and sorts at
  * runtime, but a single hot GROUP BY key still funnels into one task's
  * partial aggregate when upstream data is clustered by that key. Salting
  * splits each key into `buckets` sub-keys for the partial stage and
  * re-aggregates the partials — the classic two-stage rewrite, valid for
  * any algebraic aggregate (sum/count/min/max).
  */
object Skew {

  /** Two-stage salted aggregation: `df.groupBy(keys).agg(sum(c))`
    * semantics with the shuffle load of every key spread over `buckets`
    * reducers. `aggs` maps output column name → (partial aggregate of the
    * input column, final re-aggregate of the partial column) — e.g.
    * `"n" -> (count(lit(1)), sum)` or `"total" -> (sum(col("x")), sum)`.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      aggs: Seq[(String, (Column, Column => Column))]): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // deterministic spread: hash of the whole row modulo buckets (rows
    // with a hot key differ in other columns, so they spread; identical
    // full rows co-locate, which is harmless for algebraic aggregates)
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(buckets)))
    val partialCols = aggs.map { case (name, (partial, _)) => partial.as(s"__p_$name") }
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val finalCols = aggs.map { case (name, (_, fin)) => fin(col(s"__p_$name")).as(name) }
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalCols.head, finalCols.tail: _*)
  }

  /** Skew-salted equi join: every fact row gets a deterministic salt in
    * [0, buckets); the (small) dim side is replicated once per salt value
    * and the join runs on (keys, salt) — a hot key's rows spread over
    * `buckets` reducers instead of funneling into one sort-merge task.
    * Dim replication costs buckets × |dim|, so this is for the
    * hot-fact/small-dim shape where the dim is too big (or the planner
    * declines) to broadcast; AQE's skew-join split is the runtime
    * alternative, but salting also fixes the *partial aggregate* stage
    * of whatever runs downstream of the join.
    */
  def saltedJoin(
      facts: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = facts.withColumn("__salt",
      pmod(hash(facts.columns.toIndexedSeq.map(col): _*), lit(buckets)))
    val expanded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(expanded.hint("shuffle_merge"), keys :+ "__salt").drop("__salt")
  }
}
