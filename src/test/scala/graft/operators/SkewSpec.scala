package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted two-stage aggregation: identical results to the direct plan on
  * skewed keys, with the partial stage spread over salt buckets.
  */
class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAggregate matches direct groupBy on a hot key") {
    // 10k rows on one hot key + a tail
    val df = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 50).map(i => (s"k$i", i.toDouble))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"), max($"v").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val salted = Skew.saltedAggregate(df, Seq("k"), buckets = 8, Seq(
        "n" -> (count(lit(1)), sum),
        "total" -> (sum($"v"), sum),
        "mx" -> (max($"v"), (c: org.apache.spark.sql.Column) => max(c))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(salted == direct)
  }

  test("salted plan aggregates in two keyed stages") {
    val df = Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
    val plan = Skew.saltedAggregate(df, Seq("k"), 4, Seq("n" -> (count(lit(1)), sum)))
      .queryExecution.optimizedPlan.toString
    // two logical Aggregates: (k, __salt) then (k)
    assert("Aggregate \\[".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("__salt"), plan)
  }
}
