package graft.queries

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** NUMERIC money mode (SURVEY §1.2): the engine-side pipeline must carry
  * and RETURN DecimalType(38,9) — BigQuery NUMERIC — in NumericMode; the
  * registered query's string boundary exists only because driver-side
  * parquet readers disagree on decimal→pandas conversion (DuckDB fetchdf
  * widens DECIMAL to float64), not because the engine loses the type.
  */
class MoneyModeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("moneySum/money output DecimalType(38,9) in NumericMode") {
    val df = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(Exact.moneySum(col("o_totalprice"), Exact.NumericMode).as("rev"),
        min(Exact.money(col("o_totalprice"), Exact.NumericMode)).as("mn"))
    assert(df.schema("rev").dataType == DecimalType(38, 9))
    assert(df.schema("mn").dataType == DecimalType(38, 9))
  }

  test("DoubleMode matches NumericMode values exactly (lossless inputs)") {
    val num = Tables.load(spark, sfDir, "orders")
      .agg(Exact.moneySum(col("o_totalprice"), Exact.NumericMode)
        .cast("double").as("v")).head.getDouble(0)
    val dbl = Tables.load(spark, sfDir, "orders")
      .agg(Exact.moneySum(col("o_totalprice"), Exact.DoubleMode).as("v"))
      .head.getDouble(0)
    assert(num == dbl)
  }

  test("money-mode sweep covers q1/q5/q9 with 9-scale NUMERIC amounts") {
    val rows = graft.SparkEntry.queries("agg_money_mode_sweep")(spark, sfDir)
      .collect()
    val byReport = rows.groupBy(_.getString(0))
    assert(byReport.keySet == Set("q1", "q5", "q9"), byReport.keySet)
    rows.foreach { r =>
      val amt = r.getString(2)
      assert(amt.matches("""-?\d+\.\d{9}"""), s"not plain NUMERIC: $amt")
      assert(r.getLong(3) > 0L)
    }
    // q1 replays the q1_pricing_summary revenue exactly (same filter,
    // same cents arithmetic — only the accumulator type differs)
    val q1rev = rows.filter(_.getString(0) == "q1")
      .map(r => BigDecimal(r.getString(2))).sum
    val dblRev = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .agg(sum(Exact.dec2(col("l_extendedprice")) *
        (Exact.one - Exact.rate(col("l_discount")))).as("v"))
      .head.getDecimal(0)
    assert(q1rev == BigDecimal(dblRev), s"$q1rev != $dblRev")
  }

  test("decimal→string boundary is the 9-scale plain form both engines print") {
    val row = Tables.load(spark, sfDir, "orders")
      .agg(min(Exact.money(col("o_totalprice"), Exact.NumericMode))
        .cast(StringType).as("s")).head.getString(0)
    // plain notation, exactly 9 fractional digits, no exponent
    assert(row.matches("""-?\d+\.\d{9}"""), s"unexpected decimal form: $row")
  }
}
