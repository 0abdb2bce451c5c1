package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("morton16 interleaves bits (known values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
    val got = df.select(Layout.morton16(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // (3,5): x bits {0,1} → even slots 0,2 = 5; y bits {0,2} → odd slots 1,5 = 34
    assert(got == Seq(0L, 1L, 2L, 39L, 4294967295L))
  }

  test("morton16 uses only the low 16 bits of each key") {
    val df = Seq((65536L + 3L, (1L << 20) + 5L)).toDF("x", "y")
    val got = df.select(Layout.morton16(col("x"), col("y"))).as[Long].head()
    assert(got == 39L)
  }

  test("range-partitioning by the z key yields pairwise-disjoint z ranges (file pruning works)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ranges = li
      .select(Layout.morton16(col("l_partkey"), col("l_suppkey")).as("z"))
      .repartitionByRange(8, col("z"))
      .groupBy(spark_partition_id().as("pid"))
      .agg(min($"z").as("lo"), max($"z").as("hi"))
      .orderBy("lo")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping z ranges: $hi > $lo2")
      case _ =>
    }
  }
}
