package graft.dq

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight data quality metrics via `Dataset.observe`: the listed rule
  * counters are accumulated WHILE the frame's real action runs (a model
  * build, a sink write) — zero additional scans, in contrast to
  * [[DqEngine]]'s dedicated one-scan audit job. This is the 100 TB
  * monitoring mode: every production write gets its completeness/custom
  * counters for free; the dedicated engine run stays for scheduled
  * audits with uniqueness and cross-table rules (which need their own
  * shuffles and cannot ride an observation).
  */
object DqObserve {

  /** Attach observed counters to `df`. Returns the instrumented frame and
    * the observation handle; after ANY action on the returned frame,
    * `observation.get` yields: `total` plus one `failed_<name>` per rule
    * (count of rows violating the rule's pass condition).
    */
  def withMetrics(
      df: DataFrame,
      rules: Seq[(String, Column)]): (DataFrame, Observation) = {
    val obs = Observation()
    val aggs = count(lit(1)).as("total") +: rules.map { case (name, passCond) =>
      sum(when(!coalesce(passCond, lit(false)), 1L).otherwise(0L))
        .as(s"failed_$name")
    }
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }
}
