package graft.sources

import java.nio.file.{Files, Paths}

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MaintenanceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("compactParquet merges fragmented files, preserves rows, swaps atomically") {
    val dir = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "compact").resolve("t").toString
    val df = (1L to 5000L).toDF("id")
    df.repartition(20).write.parquet(dir)
    val stats = Maintenance.compactParquet(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(stats.filesBefore == 20)
    assert(stats.filesAfter == 1)
    assert(!Files.exists(Paths.get(dir + "__compact"))) // stage moved away
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    assert(back.agg(org.apache.spark.sql.functions.sum($"id")).collect()(0).getLong(0)
      == 5000L * 5001 / 2)
  }
}
