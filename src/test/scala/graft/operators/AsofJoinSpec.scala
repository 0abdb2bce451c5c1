package graft.operators

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof attaches the latest right row at-or-before each left ts") {
    val quotes = Seq( // (sym, qts, px)
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:05:00"), 2.0),
      ("B", ts("2024-01-01 10:03:00"), 9.0)
    ).toDF("sym", "qts", "px")
    val trades = Seq( // (id, sym, tts)
      (1L, "A", ts("2024-01-01 10:00:00")), // exact match: inclusive
      (2L, "A", ts("2024-01-01 10:04:00")), // between quotes -> 1.0
      (3L, "A", ts("2024-01-01 11:00:00")), // after last -> 2.0
      (4L, "B", ts("2024-01-01 10:00:00")), // before any quote -> null
      (5L, "C", ts("2024-01-01 10:00:00"))  // key never quoted -> null
    ).toDF("id", "sym", "tts")

    val got = AsofJoin.asof(trades, quotes, "sym", "sym", "tts", "qts", Seq("px"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      1L -> Some(1.0), 2L -> Some(1.0), 3L -> Some(2.0), 4L -> None, 5L -> None))
  }

  test("asofForward attaches the earliest right row at-or-after each left ts") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:05:00"), 2.0),
      ("B", ts("2024-01-01 10:03:00"), 9.0)
    ).toDF("sym", "qts", "px")
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")), // exact match: inclusive
      (2L, "A", ts("2024-01-01 10:04:00")), // next quote -> 2.0
      (3L, "A", ts("2024-01-01 11:00:00")), // after last -> null
      (4L, "B", ts("2024-01-01 10:00:00")), // before B's quote -> 9.0
      (5L, "C", ts("2024-01-01 10:00:00"))  // key never quoted -> null
    ).toDF("id", "sym", "tts")
    val got = AsofJoin.asofForward(trades, quotes, "sym", "sym", "tts", "qts", Seq("px"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      1L -> Some(1.0), 2L -> Some(2.0), 3L -> None, 4L -> Some(9.0), 5L -> None))
  }

  test("asofForward plan has a single exchange (no range-join explosion)") {
    val quotes = Seq(("A", ts("2024-01-01 10:00:00"), 1.0)).toDF("sym", "qts", "px")
    val trades = Seq((1L, "A", ts("2024-01-01 10:00:00"))).toDF("id", "sym", "tts")
    val p = AsofJoin.asofForward(trades, quotes, "sym", "sym", "tts", "qts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("latestPerKeyTs keeps the max-tie row per (key, ts)") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "old"),
      (1L, ts("2024-01-01 10:00:00"), 9L, "new"),
      (1L, ts("2024-01-01 11:00:00"), 1L, "later")
    ).toDF("k", "t", "ver", "v")
    val got = AsofJoin.latestPerKeyTs(df, "k", "t", "ver")
      .orderBy("t").collect().map(r => (r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(9L -> "new", 1L -> "later"))
  }

  test("asof keeps all payload values from the SAME right row when a field is null") {
    // latest quote for A has px=null, sz=20: a per-column carry-forward
    // would stitch px=1.0 from the OLDER row with sz=20 from the newer —
    // the whole-row (struct) semantics must return (null, 20)
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(1.0), Some(10L)),
      ("A", ts("2024-01-01 10:05:00"), None, Some(20L))
    ).toDF("sym", "qts", "px", "sz")
    val trades = Seq((1L, "A", ts("2024-01-01 10:06:00"))).toDF("id", "sym", "tts")
    val got = AsofJoin.asof(trades, quotes, "sym", "sym", "tts", "qts", Seq("px", "sz"))
      .select("px", "sz").collect()
    assert(got.length == 1)
    assert(got(0).isNullAt(0) && got(0).getLong(1) == 20L)
  }

  test("asof plan has a single exchange (no range-join explosion)") {
    val quotes = Seq(("A", ts("2024-01-01 10:00:00"), 1.0)).toDF("sym", "qts", "px")
    val trades = Seq((1L, "A", ts("2024-01-01 10:01:00"))).toDF("id", "sym", "tts")
    val plan = AsofJoin.asof(trades, quotes, "sym", "sym", "tts", "qts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1)
  }

  test("asofNearest picks the closer of before/after within tolerance; ties keep earlier") {
    val quotes = Seq( // (sym, qts, px)
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:10:00"), 2.0),
      ("B", ts("2024-01-01 09:00:00"), 9.0)
    ).toDF("sym", "qts", "px")
    val trades = Seq( // (id, sym, tts)
      (1L, "A", ts("2024-01-01 10:02:00")), // closer to 10:00 -> 1.0, delta -120s
      (2L, "A", ts("2024-01-01 10:09:00")), // closer to 10:10 -> 2.0, delta +60s
      (3L, "A", ts("2024-01-01 10:05:00")), // equidistant -> earlier -> 1.0
      (4L, "A", ts("2024-01-01 10:10:00")), // exact match -> 2.0, delta 0
      (5L, "B", ts("2024-01-01 10:00:00")), // only match 60min away > tol -> null
      (6L, "C", ts("2024-01-01 10:00:00"))  // key never quoted -> null
    ).toDF("id", "sym", "tts")
    val got = AsofJoin.asofNearest(trades, quotes, "sym", "sym", "tts", "qts",
        Seq("px"), toleranceMicros = 600000000L) // ±10 min
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      (1L, Some(1.0), Some(-120000000L)),
      (2L, Some(2.0), Some(60000000L)),
      (3L, Some(1.0), Some(-300000000L)),
      (4L, Some(2.0), Some(0L)),
      (5L, None, None),
      (6L, None, None)))
  }

  test("asofNearest plans one exchange and one sort (two frames share them)") {
    val quotes = Seq(("A", ts("2024-01-01 10:00:00"), 1.0)).toDF("sym", "qts", "px")
    val trades = Seq((1L, "A", ts("2024-01-01 10:01:00"))).toDF("id", "sym", "tts")
    val plan = AsofJoin.asofNearest(trades, quotes, "sym", "sym", "tts", "qts",
        Seq("px"), toleranceMicros = 600000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
    assert("Sort \\[".r.findAllIn(plan).size <= 1, plan)
  }

  test("reserved internal / emitted column names are rejected, not silently clobbered") {
    val quotes = Seq(("A", ts("2024-01-01 10:00:00"), 1.0)).toDF("sym", "qts", "px")
    val trades = Seq((1L, "A", ts("2024-01-01 10:01:00"))).toDF("id", "sym", "tts")
    // a left column named like an internal tag would be overwritten by the plan
    val badLeft = trades.withColumn("__t", lit(0L))
    assertThrows[IllegalArgumentException] {
      AsofJoin.asof(badLeft, quotes, "sym", "sym", "tts", "qts", Seq("px"))
    }
    // same guard covers the right side
    val badRight = quotes.withColumn("__side", lit(9))
    assertThrows[IllegalArgumentException] {
      AsofJoin.asof(trades, badRight, "sym", "sym", "tts", "qts", Seq("px"))
    }
    // nearest additionally owns the emitted asof_delta_us column
    val deltaLeft = trades.withColumn("asof_delta_us", lit(0L))
    assertThrows[IllegalArgumentException] {
      AsofJoin.asofNearest(deltaLeft, quotes, "sym", "sym", "tts", "qts",
        Seq("px"), toleranceMicros = 1L)
    }
  }
}
