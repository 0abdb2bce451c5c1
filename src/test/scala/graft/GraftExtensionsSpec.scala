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
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }
}
