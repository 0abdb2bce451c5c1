package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** CLI verbs (§2.9: the engine's dbt run / dbt test / job entry points)
  * through the testable dispatch, against real testdata.
  */
class EngineCliSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("run builds models into the warehouse dir; clean removes it") {
    val wh = Files.createTempDirectory("graft_wh").toString
    EngineCli.execute(spark, "run", Seq(wh))
    assert(Files.exists(java.nio.file.Paths.get(s"$wh/my_first_dbt_model")))
    assert(spark.table("my_second_dbt_model").collect().map(_.getInt(0)).toSeq == Seq(1))
    EngineCli.execute(spark, "clean", Seq(wh))
    assert(!Files.exists(java.nio.file.Paths.get(wh)))
  }

  test("test runs the declared schema tests (3 PASS, 1 designed FAIL)") {
    // dispatch only; assertions on the underlying runner
    EngineCli.execute(spark, "test", Seq.empty)
    val rs = graft.models.SchemaTests.runAll(spark, graft.models.ExampleModels.declaredTests)
    assert(rs.count(_.status == "PASS") == 3)
    assert(rs.count(_.status == "FAIL") == 1)
  }

  test("dq verb parses a reference-shaped YAML config and runs the engine") {
    val cfgPath = Files.createTempFile("graft_dq", ".yaml")
    Files.writeString(cfgPath,
      """table_name: orders
        |tests:
        |  completeness:
        |    - o_orderstatus
        |  uniqueness:
        |    - [o_orderkey]
        |""".stripMargin)
    EngineCli.execute(spark, "dq", Seq(cfgPath.toString, sfDir)) // prints PASS/FAIL table
  }

  test("profile verb writes an APPEND monitoring dir") {
    val out = Files.createTempDirectory("graft_prof").resolve("stats").toString
    EngineCli.execute(spark, "profile", Seq(sfDir, out, "region,nation"))
    val back = spark.read.parquet(out)
    assert(back.select("table_name").distinct().count() == 2)
  }

  test("snapshot verb initializes then merges the SCD-2 table idempotently") {
    val out = Files.createTempDirectory("graft_snap").toString
    EngineCli.execute(spark, "snapshot", Seq(sfDir, out, "2024-01-01 00:00:00"))
    val first = spark.read.parquet(s"$out/orders_status_scd2")
    val nKeys = first.count()
    assert(nKeys > 0 && first.filter("is_current").count() == nKeys)
    // second capture with an unchanged source: no new versions opened
    EngineCli.execute(spark, "snapshot", Seq(sfDir, out, "2024-02-01 00:00:00"))
    val second = spark.read.parquet(s"$out/orders_status_scd2")
    assert(second.count() == nKeys)
    assert(second.filter("is_current").count() == nKeys)
  }

  test("unknown verb is rejected") {
    intercept[IllegalArgumentException] {
      EngineCli.execute(spark, "explode", Seq.empty)
    }
  }
}
