package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ids = (1L to 1000L).toDF("id")

  test("hashSample is deterministic and partitioning-independent") {
    val a = Sampling.hashSample(ids, "id", 4).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids.repartition(13), "id", 4)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // ~4/16 of rows, md5 is uniform: allow wide tolerance
    assert(a.size > 150 && a.size < 350, a.size)
  }

  test("trainTestSplit is complementary and consistent with hashSample") {
    val split = Sampling.trainTestSplit(ids, "id", 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split.size == 1000) // no row lost or duplicated
    val sampled = Sampling.hashSample(ids, "id", 4).collect().map(_.getLong(0)).toSet
    assert(split.filter(_._2 == "test").keySet == sampled)
  }

  test("bottomKPerGroup: exactly k per group, partitioning-independent, nested in k") {
    val df = ids.withColumn("g",
      org.apache.spark.sql.functions.expr("cast(id % 3 as string)"))
    def run(d: org.apache.spark.sql.DataFrame, k: Int) =
      Sampling.bottomKPerGroup(d, "id", "g", k)
        .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2))).toSet
    val a = run(df, 5)
    assert(a.size == 15 && a.groupBy(_._1).forall(_._2.size == 5), a)
    assert(a.forall { case (_, _, rk) => rk >= 1 && rk <= 5 })
    assert(run(df.repartition(13), 5) == a) // pure function of the keys
    // bottom-5 is a prefix of bottom-7 (same hash order ⇒ same ranks)
    assert(a.subsetOf(run(df, 7)))
    // a group smaller than k returns whole group, ranks still dense
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "g")
    assert(run(tiny, 5).map(_._3) == Set(1, 2))
  }

  test("weightedPrioritySample: deterministic, partitioning-independent, weight-sensitive") {
    import org.apache.spark.sql.functions._
    // weights: ids 1..100 get weight 1000, ids 101..1000 weight 1
    val df = ids.withColumn("w",
      when($"id" <= 100, 1000L).otherwise(1L))
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedPrioritySample(d, "id", "w", 50)
        .collect().map(_.getLong(0)).toSeq
    val a = run(df)
    assert(a.size == 50)
    assert(run(df.repartition(13)) == a) // pure function of (key, weight)
    // heavy rows are 10% of the population but should dominate the
    // sample: P(inclusion) rises with weight under A-Res
    val heavy = a.count(_ <= 100)
    assert(heavy > 25, s"expected heavy-weight majority, got $heavy/50")
    // priorities are valid (0,1) and the result is their top-k
    val pri = Sampling.weightedPrioritySample(df, "id", "w", 50)
      .collect().map(_.getDouble(2))
    assert(pri.forall(p => p > 0.0 && p < 1.0))
    val all = Sampling.weightedPrioritySample(df, "id", "w", 1000)
      .collect().map(_.getDouble(2))
    assert(pri.min >= all.sorted.reverse.take(50).min)
  }

  test("stratifiedHashSample applies per-stratum rates and drops unlisted strata") {
    val df = ids.withColumn("cls",
      org.apache.spark.sql.functions.when($"id" % 3 === 0, "a")
        .when($"id" % 3 === 1, "b").otherwise("c"))
    val got = Sampling.stratifiedHashSample(df, "id", "cls", Map("a" -> 2, "b" -> 12))
      .groupBy("cls").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("c")) // unlisted stratum dropped (sampleBy semantics)
    // ~2/16 of ~333 and ~12/16 of ~333, wide tolerance
    assert(got("a") > 15 && got("a") < 90, got)
    assert(got("b") > 180 && got("b") < 310, got)
    // per-row membership equals the single-rate sampler at the same rate
    val only_a = Sampling.hashSample(df.filter($"cls" === "a"), "id", 2)
      .collect().map(_.getLong(0)).toSet
    val strat_a = Sampling.stratifiedHashSample(df, "id", "cls", Map("a" -> 2))
      .collect().map(_.getLong(0)).toSet
    assert(only_a == strat_a)
  }
}
