package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("intervalOverlap finds exactly the overlapping pairs, each once") {
    // bins of width 10; the (1,10) pair overlaps across bins 1..3 and
    // would triple-emit without the overlap-start-bin rule
    val l = Seq((1L, 5L, 35L), (2L, 50L, 60L), (3L, 90L, 95L))
      .toDF("lid", "lo", "hi")
    val r = Seq((10L, 12L, 38L), (11L, 58L, 70L), (12L, 60L, 70L), (13L, 200L, 210L))
      .toDF("rid", "plo", "phi")
    val got = RangeJoin.intervalOverlap(l, "lo", "hi", r, "plo", "phi", binWidth = 10L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    // (2,12): hi=60 is exclusive vs plo=60 → NO overlap (half-open)
    assert(got.sorted == Seq((1L, 10L), (2L, 11L)))
  }

  test("intervalOverlap with equi keys separates key groups and avoids cartesian plans") {
    val l = Seq((7L, 1L, 0L, 100L), (8L, 2L, 0L, 100L)).toDF("k", "lid", "lo", "hi")
    val r = Seq((7L, 10L, 50L, 60L), (9L, 11L, 50L, 60L)).toDF("k", "rid", "plo", "phi")
    val df = RangeJoin.intervalOverlap(l, "lo", "hi", r, "plo", "phi",
      binWidth = 50L, usingKeys = Seq("k"))
    val got = df.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got == Seq((1L, 10L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
