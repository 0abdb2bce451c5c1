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

  test("saltedJoin matches the plain join on a hot key, including multiplicities") {
    val facts = ((1 to 5000).map(i => (i.toLong, "hot")) ++
      (1 to 20).map(i => (10000L + i, s"k${i % 3}"))).toDF("id", "k")
    val dim = Seq(("hot", 1.0), ("k0", 2.0), ("k1", 3.0), ("nomatch", 9.0)).toDF("k", "w")
    val direct = facts.join(dim, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"id").as("ids"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedJoin(facts, dim, Seq("k"), buckets = 8).groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"id").as("ids"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("range join matches the inequality join and stays an equi join") {
    val points = Seq((1L, 0.5), (2L, 49.99), (3L, 50.0), (4L, 120.0), (5L, 999.0))
      .toDF("id", "v")
    val ranges = Seq(("low", 0.0, 50.0), ("mid", 50.0, 150.0)).toDF("tier", "lo", "hi")
    val got = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", binWidth = 50.0)
      .select($"id", $"tier").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(1L -> "low", 2L -> "low", 3L -> "mid", 4L -> "mid"))
    val plan = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", 50.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
