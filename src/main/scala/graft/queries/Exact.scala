package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact, order-independent float aggregation shared by the Spark queries
  * and their DuckDB oracle SQL.
  *
  * Summing raw doubles is order-dependent (Spark's partial aggregation vs
  * DuckDB's sequential scan), which would break the driver's hash compare.
  * All money/rate columns in the testdata carry ≤ 2 decimal digits, so
  * casting to DECIMAL before aggregating is lossless; decimal sums are
  * exact and associative; the final cast-to-DOUBLE of identical decimal
  * values is the identical IEEE double in both engines.
  */
object Exact {
  /** Money columns (prices, balances): ≤ 10^10 with 2-decimal cents. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Small rates (discount, tax): 2-decimal fractions. */
  def rate(c: Column): Column = c.cast(DecimalType(6, 2))
  val one: Column = lit(1).cast(DecimalType(6, 2))
  /** Exact sum of a money column, returned as DOUBLE. */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  // Matching DuckDB fragments.
  def sqlDec2(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def sqlRate(e: String): String = s"CAST($e AS DECIMAL(6,2))"
  val sqlOne: String = "CAST(1 AS DECIMAL(6,2))"
  def sqlDsum(e: String): String = s"CAST(sum(${sqlDec2(e)}) AS DOUBLE)"
}
