package graft.operators

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-checks (fixed seed, 10 trials each): every
  * distributed operator must equal a naive in-memory reference on
  * arbitrary small inputs — the reference is written independently of
  * the Spark plan, so shared bugs are unlikely.
  */
class PropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(epochMin: Int) = new Timestamp(epochMin * 60000L)

  test("asof join equals the naive per-row latest-at-or-before lookup") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val left = (0 until 25).map(i => (i.toLong, rnd.nextInt(4), ts(rnd.nextInt(50))))
      val rrows = (0 until 12).map(_ => (rnd.nextInt(4), rnd.nextInt(50), rnd.nextInt(1000)))
        .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      val expected = left.map { case (id, k, lt) =>
        val best = rrows.filter(r => r._1 == k && !ts(r._2).after(lt))
          .sortBy(r => (r._2, r._3)).lastOption
        id -> best.map(_._3)
      }.toMap

      val lDf = left.toDF("id", "k", "lts")
      val rDf = rrows.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "rts", "v")
      val got = AsofJoin.asof(lDf, rDf, "k", "k", "lts", "rts", Seq("v"))
        .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Int])).toMap
      assert(got == expected)
    }
  }

  test("asof with random NULLs in payload columns returns whole-row-consistent values") {
    // the r2-advice bug class: per-column carry-forward stitches values
    // from different right rows when the latest row has a null field —
    // both payload values must always come from the SAME right row
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      val left = (0 until 20).map(i => (i.toLong, rnd.nextInt(3), ts(rnd.nextInt(40))))
      val rrows = (0 until 10).map(_ => (rnd.nextInt(3), rnd.nextInt(40),
          if (rnd.nextBoolean()) Some(rnd.nextInt(100)) else None, rnd.nextInt(1000)))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val expected = left.map { case (id, k, lt) =>
        val best = rrows.filter(r => r._1 == k && !ts(r._2).after(lt))
          .sortBy(_._2).lastOption
        id -> best.map(b => (b._3, b._4))
      }.toMap

      val lDf = left.toDF("id", "k", "lts")
      val rDf = rrows.map { case (k, t, a, b) => (k, ts(t), a, b) }
        .toDF("k", "rts", "a", "b")
      val got = AsofJoin.asof(lDf, rDf, "k", "k", "lts", "rts", Seq("a", "b"))
        .collect().map { r =>
          val matched = !r.isNullAt(4) // b is non-nullable per right row
          r.getLong(0) -> (if (matched)
            Some((Option(r.get(3)).map(_.asInstanceOf[Int]), r.getInt(4)))
          else None)
        }.toMap
      assert(got == expected)
    }
  }

  test("saltedAggregate equals direct groupBy for count/sum/max on random data") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      val rows = (0 until 40).map(_ => (rnd.nextInt(4), rnd.nextInt(201) - 100))
      val df = rows.map { case (k, v) => (s"k$k", v.toLong) }.toDF("k", "v")
      val expected = rows.groupBy(r => s"k${r._1}").map { case (k, g) =>
        k -> (g.size.toLong, g.map(_._2.toLong).sum, g.map(_._2.toLong).max)
      }
      val got = Skew.saltedAggregate(df, Seq("k"), buckets = 4, Seq(
          "n" -> (count(lit(1)), sum),
          "total" -> (sum($"v"), sum),
          "mx" -> (max($"v"), (c: org.apache.spark.sql.Column) => max(c))))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got == expected)
    }
  }

  test("rangeJoin equals the naive inequality scan on random points/ranges") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 10) {
      val points = (0 until 30).map(i => (i.toLong, rnd.nextDouble() * 100))
      val ranges = (0 until 6).map { i =>
        val lo = rnd.nextDouble() * 80
        (s"r$i", lo, lo + rnd.nextDouble() * 30)
      }
      val expected = (for {
        (id, v) <- points; (tier, lo, hi) <- ranges if v >= lo && v < hi
      } yield (id, tier)).toSet
      val got = RangeJoin.pointInRange(points.toDF("id", "v"), "v",
          ranges.toDF("tier", "lo", "hi"), "lo", "hi", binWidth = 25.0)
        .select($"id", $"tier").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == expected)
    }
  }

  test("scd2History intervals tile each key's timeline exactly") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 10) {
      val rows = (0 until 20).map(i =>
        (rnd.nextInt(4).toLong, i.toLong, Seq("A", "B", "C")(rnd.nextInt(3)), ts(rnd.nextInt(50))))
      val df = rows.toDF("k", "id", "v", "ts")
      val hist = graft.models.Snapshot.scd2History(df, Seq("k"), "v", "ts", "id")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
          Option(r.getTimestamp(3)), r.getBoolean(4)))
      hist.groupBy(_._1).foreach { case (k, rs) =>
        val sorted = rs.sortBy(_._3.getTime)
        assert(sorted.count(_._5) == 1 && sorted.last._5) // one open row
        sorted.sliding(2).foreach { // intervals chain with value changes
          case Array(a, b) => assert(a._4.contains(b._3) && a._2 != b._2)
          case _ =>
        }
        val keyEvents = rows.filter(_._1 == k)
        assert(sorted.head._3 == keyEvents.map(_._4).minBy(_.getTime))
      }
    }
  }
}
