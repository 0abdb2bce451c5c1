package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a named DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Determinism contract (SURVEY.md §5.2): every query ORDER-BYs a unique
  * key set, and every float aggregate is computed through exact DECIMAL
  * arithmetic then cast to DOUBLE, so Spark and DuckDB produce
  * bit-identical values regardless of partial-aggregation order.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
}
