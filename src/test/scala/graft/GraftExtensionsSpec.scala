package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Config-driven function injection: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` exposes every graft
  * function to SQL without explicit register() calls.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension-built session resolves graft functions in SQL") {
    TestSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val cos = s.sql(
        "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
        .collect()(0).getDouble(0)
      assert(cos == 1.0)
      val nShingles = s.sql("SELECT size(shingle_hashes('a b c d', 3)) AS n")
        .collect()(0).getInt(0)
      assert(nShingles == 2) // "a b c", "b c d"
      val top = s.sql(
        """SELECT topk_pairs(struct(CAST(v AS DOUBLE), CAST(id AS BIGINT)), 2) AS t
           FROM VALUES (1L, 0.5), (2L, 0.9), (3L, 0.1) AS x(id, v)""")
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      assert(top.map(_.getLong(1)) == Seq(2L, 1L))

      // conf-gated date-partition injection: same scan, restricted to
      // the run date once the confs are set; pushdown reaches the scan
      val sfDir = "/root/testdata/sf0.001"
      val all = s.read.parquet(s"$sfDir/orders.parquet").count()
      s.conf.set("spark.graft.inject.dateColumn", "o_orderdate")
      s.conf.set("spark.graft.inject.runDate", "1995-06-15 00:00:00")
      try {
        val injected = s.read.parquet(s"$sfDir/orders.parquet")
        val manual = s.read.parquet(s"$sfDir/orders.parquet")
        assert(injected.count() > 0 && injected.count() < all)
        s.conf.unset("spark.graft.inject.dateColumn")
        val expected = manual
          .filter(org.apache.spark.sql.functions.col("o_orderdate") ===
            org.apache.spark.sql.functions.lit("1995-06-15 00:00:00").cast("timestamp_ntz"))
          .count()
        s.conf.set("spark.graft.inject.dateColumn", "o_orderdate")
        assert(injected.count() == expected)
        val plan = injected.queryExecution.executedPlan.toString
        assert(plan.contains("PushedFilters") && plan.contains("o_orderdate"), plan)
      } finally {
        s.conf.unset("spark.graft.inject.dateColumn")
        s.conf.unset("spark.graft.inject.runDate")
      }
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }
}
