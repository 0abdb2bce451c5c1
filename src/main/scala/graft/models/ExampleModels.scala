package graft.models

import org.apache.spark.sql.SparkSession

/** The reference's two example models, re-expressed natively.
  *
  * - `my_first_dbt_model` (reference models/example/my_first_dbt_model.sql:12-21):
  *   literal union {1, NULL} — the NULL row is kept because the filter at
  *   :27 is commented out. Materialized as a table (:10).
  * - `my_second_dbt_model` (my_second_dbt_model.sql:4-6): `ref` the first,
  *   `where id = 1` → {1}. Materialized as a view (dbt_project.yml:31-35).
  *
  * Union type coercion (INT ∪ NULL) is handled with a typed Option column,
  * matching BigQuery's implicit coercion (SURVEY.md §7.3).
  */
object ExampleModels {

  val myFirst: Model = Model(
    name = "my_first_dbt_model",
    deps = Seq.empty,
    materialization = Materialization.Table,
    build = { spark: SparkSession =>
      import spark.implicits._
      Seq(Option(1)).toDF("id").union(Seq(Option.empty[Int]).toDF("id"))
    })

  val mySecond: Model = Model(
    name = "my_second_dbt_model",
    deps = Seq("my_first_dbt_model"),
    materialization = Materialization.View,
    build = { spark: SparkSession =>
      import spark.implicits._
      spark.table("my_first_dbt_model").filter($"id" === 1)
    },
    // the model's literal SELECT body (my_second_dbt_model.sql:4-6) —
    // enables exact catalog-view parity with dbt's default materialization
    sqlText = Some("SELECT * FROM my_first_dbt_model WHERE id = 1"))

  val all: Seq[Model] = Seq(myFirst, mySecond)

  /** schema.yml:10-21 — unique + not_null on id of both models.
    * Expected: 3 PASS, 1 FAIL (not_null on my_first_dbt_model fails by
    * design — the NULL row; SURVEY.md §5.2 item 4).
    */
  val declaredTests: Seq[(String, String, String)] = Seq(
    ("my_first_dbt_model", "id", "unique"),
    ("my_first_dbt_model", "id", "not_null"),
    ("my_second_dbt_model", "id", "unique"),
    ("my_second_dbt_model", "id", "not_null"))
}
