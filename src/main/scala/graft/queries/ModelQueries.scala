package graft.queries

import graft.models._
import org.apache.spark.sql.SparkSession

/** dbt-parity end-to-end: build the reference's two example models through
  * the DAG runner and run their declared schema tests (SURVEY.md §5.2
  * item 4 — `not_null` on my_first_dbt_model.id FAILS by design).
  */
object ModelQueries extends QueryModule {

  private def built(s: SparkSession) = ModelDag.run(s, ExampleModels.all)

  val defs: Seq[QueryDef] = Seq(

    QueryDef("model_first_dbt",
      (s, _) => {
        import s.implicits._
        built(s)("my_first_dbt_model").orderBy($"id".asc_nulls_last)
      },
      Some("SELECT * FROM (SELECT CAST(1 AS INTEGER) AS id UNION ALL SELECT CAST(NULL AS INTEGER)) t ORDER BY id NULLS LAST")),

    QueryDef("model_second_dbt",
      (s, _) => {
        import s.implicits._
        built(s)("my_second_dbt_model").orderBy($"id")
      },
      Some("""WITH m1 AS (SELECT CAST(1 AS INTEGER) AS id UNION ALL SELECT CAST(NULL AS INTEGER))
        SELECT id FROM m1 WHERE id = 1 ORDER BY id""")),

    QueryDef("dbt_schema_tests",
      (s, _) => {
        import s.implicits._
        built(s)
        s.createDataset(SchemaTests.runAll(s, ExampleModels.declaredTests))
          .toDF().orderBy($"model_name", $"test_name")
      },
      Some("""WITH m1 AS (SELECT CAST(1 AS INTEGER) AS id UNION ALL SELECT CAST(NULL AS INTEGER)),
      m2 AS (SELECT id FROM m1 WHERE id = 1),
      r AS (
        SELECT 'my_first_dbt_model' AS model_name, 'id' AS column_name, 'unique' AS test_name,
          CASE WHEN (SELECT count(*) FROM (SELECT id FROM m1 GROUP BY id HAVING count(*) > 1) v) = 0 THEN 'PASS' ELSE 'FAIL' END AS status
        UNION ALL SELECT 'my_first_dbt_model', 'id', 'not_null',
          CASE WHEN (SELECT count(*) FROM m1 WHERE id IS NULL) = 0 THEN 'PASS' ELSE 'FAIL' END
        UNION ALL SELECT 'my_second_dbt_model', 'id', 'unique',
          CASE WHEN (SELECT count(*) FROM (SELECT id FROM m2 GROUP BY id HAVING count(*) > 1) v) = 0 THEN 'PASS' ELSE 'FAIL' END
        UNION ALL SELECT 'my_second_dbt_model', 'id', 'not_null',
          CASE WHEN (SELECT count(*) FROM m2 WHERE id IS NULL) = 0 THEN 'PASS' ELSE 'FAIL' END)
      SELECT * FROM r ORDER BY model_name, test_name"""))
  )
}
