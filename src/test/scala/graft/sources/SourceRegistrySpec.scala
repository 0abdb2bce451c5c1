package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The SURVEY §2.1 pluggability contract: a new warehouse format drops in
  * via `Source.register` and is picked up by name at every call site that
  * resolves through `Source(...)` — no engine changes. (r11 verdict item 5.)
  */
class SourceRegistrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("built-in formats are registered and load real data") {
    assert(Set("parquet", "csv", "orc", "json").subsetOf(Source.formats))
    val nation = Source("parquet")
      .load(spark, "/root/testdata/sf0.001/nation.parquet")
    assert(nation.count() == 25)
  }

  test("Tables.load resolves through the parquet Source") {
    // same plan, same rows — the seam is the only read path
    val viaTables = graft.Tables.load(spark, "/root/testdata/sf0.001", "region")
    assert(viaTables.count() == 5)
  }

  test("a custom format registers and round-trips through the seam") {
    object FakeWarehouseSource extends Source {
      // a stand-in for a bigquery/jdbc connector: resolves a table NAME
      // (not a path) against an in-memory catalog
      def load(spark: org.apache.spark.sql.SparkSession, ref: String) = {
        import spark.implicits._
        ref match {
          case "dim_currency" =>
            Seq(("USD", 1.0), ("EUR", 1.09)).toDF("code", "rate")
          case other => throw new IllegalArgumentException(s"no table $other")
        }
      }
    }
    Source.register("fake_warehouse", FakeWarehouseSource)
    try {
      val df = Source("fake_warehouse").load(spark, "dim_currency")
      assert(df.columns.toSeq == Seq("code", "rate"))
      assert(df.count() == 2)
    } finally Source.register("fake_warehouse", FakeWarehouseSource) // idempotent re-bind
  }

  test("JDBC source behind the seam: real connector, real filter pushdown (embedded Derby)") {
    // r12 verdict item 7: the seam had only file formats and an
    // in-memory fake — prove it against a connector with genuine
    // pushdown semantics. Derby ships on Spark's classpath (metastore
    // engine), so this is zero-new-deps.
    import org.apache.spark.sql.functions._
    val url = JdbcSource.derbyMemoryUrl("graft_spec")
    graft.Tables.load(spark, "/root/testdata/sf0.001", "nation")
      .write.format("jdbc")
      .option("url", url)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("dbtable", "nation_spec")
      .option("createTableColumnTypes",
        "n_name VARCHAR(64)")
      .mode("overwrite").save()
    Source.register("jdbc", JdbcSource(url))
    val df = Source("jdbc").load(spark, "nation_spec")
      .filter(col("n_regionkey") >= 2)
      .select("n_nationkey", "n_regionkey")
    // the filter must reach the DATABASE, not run in Spark: the JDBC
    // scan advertises it as a pushed filter, and the column list is
    // pruned to the two selected columns
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.replaceAll("\\s", "").contains("GreaterThanOrEqual(n_regionkey,2)"),
      s"filter not pushed into the JDBC source:\n$scan")
    assert(!scan.contains("n_name"), "column pruning lost through JDBC " +
      "(unselected n_name should not appear in the scan)")
    // and the values are right (vs the parquet original)
    val viaJdbc = df.collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    val direct = graft.Tables.load(spark, "/root/testdata/sf0.001", "nation")
      .filter(col("n_regionkey") >= 2).select("n_nationkey", "n_regionkey")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(viaJdbc.sameElements(direct))
  }

  test("unknown format fails loudly with the registered list") {
    val e = intercept[IllegalArgumentException](Source("snowflake_nope"))
    assert(e.getMessage.contains("snowflake_nope"))
    assert(e.getMessage.contains("parquet"))
  }
}
