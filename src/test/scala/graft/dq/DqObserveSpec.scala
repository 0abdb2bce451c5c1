package graft.dq

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DqObserveSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("observe collects rule counters during the frame's own action (no extra scan)") {
    val df = Seq(
      ("a", Some(1.0)), ("b", None), ("", Some(-2.0)), ("d", Some(3.0))
    ).toDF("name", "v")
    val (instrumented, obs) = DqObserve.withMetrics(df, Seq(
      "name_not_empty" -> ($"name".isNotNull && $"name" =!= ""),
      "v_present_positive" -> ($"v".isNotNull && $"v" > 0)))
    instrumented.write.mode("overwrite").format("noop").save()
    val m = obs.get
    assert(m("total") == 4L)
    assert(m("failed_name_not_empty") == 1L)   // the "" row
    assert(m("failed_v_present_positive") == 2L) // null and -2.0
  }
}
