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
}
