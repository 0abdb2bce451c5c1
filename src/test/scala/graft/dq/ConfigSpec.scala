package graft.dq

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  val referenceShapedYaml: String =
    """# Configuration for daily transactions DQ checks
      |project_id: "your-team-project"
      |table_name: "project.raw.transactions"
      |fecha: "2024-01-01"
      |
      |notifications:
      |  on_failure: ["data-team@team.com", "transactions-team@team.com"]
      |  on_warning: ["data-team@team.com"]
      |
      |tests:
      |  completeness:
      |    - "source"
      |    - "rut"
      |    - "currency"
      |  uniqueness:
      |    - ["rut", "code_operation", "fecha"]  # Business key
      |    - ["transaction_id"]
      |  format:
      |    currency: "length_3"
      |    customer_rate: "positive"
      |    rut: "numeric_11"
      |  range:
      |    customer_rate:
      |      min: 0.001
      |      max: 100.0
      |    spread_percentage:
      |      min: 0
      |      max: 50
      |  custom_sql:
      |    - test_name: "valid_currency_codes"
      |      sql_condition: "currency IN ('USD', 'EUR', 'COP', 'PEN', 'CLP')"
      |      severity: "ERROR"
      |    - test_name: "future_date_check"
      |      sql_condition: "fecha <= CURRENT_DATE()"
      |      severity: "ERROR"
      |
      |quality_thresholds:
      |  completeness_threshold: 95.0
      |  max_failure_rate: 5.0
      |  critical_columns: ["rut", "currency"]
      |
      |processing:
      |  batch_size: 100000
      |  timeout_seconds: 300
      |  retry_failed_tests: true
      |""".stripMargin

  test("reference-shaped YAML parses into the typed config") {
    val cfg = DqConfig.fromYaml(referenceShapedYaml)
    assert(cfg.tableName == "project.raw.transactions")
    assert(cfg.fecha.contains("2024-01-01"))
    assert(cfg.tests.completeness == Seq("source", "rut", "currency"))
    assert(cfg.tests.uniqueness == Seq(
      Seq("rut", "code_operation", "fecha"), Seq("transaction_id")))
    assert(cfg.tests.format.toMap == Map(
      "currency" -> "length_3", "customer_rate" -> "positive", "rut" -> "numeric_11"))
    assert(cfg.tests.range.toMap == Map(
      "customer_rate" -> RangeBounds(Some(0.001), Some(100.0)),
      "spread_percentage" -> RangeBounds(Some(0.0), Some(50.0))))
    assert(cfg.tests.customSql.map(_.testName) == Seq("valid_currency_codes", "future_date_check"))
    assert(cfg.tests.customSql.head.severity == "ERROR")
    assert(cfg.notifications.onFailure.size == 2)
    assert(cfg.thresholds.completenessThreshold == 95.0)
    assert(cfg.thresholds.criticalColumns == Seq("rut", "currency"))
    assert(cfg.processing.batchSize == 100000L)
    assert(cfg.processing.retryFailedTests)
  }

  test("validators reject bad identifiers, table names, dates, dangerous SQL (dq_sql_notes.md:263-344)") {
    assertThrows[IllegalArgumentException](Validators.validateTableName("a;b"))
    assertThrows[IllegalArgumentException](Validators.validateTableName("a.b.c.d"))
    Validators.validateTableName("proj.dataset.table")
    Validators.validateTableName("lineitem")
    assertThrows[IllegalArgumentException](Validators.validateColumnNames(Seq("1col")))
    assertThrows[IllegalArgumentException](Validators.validateColumnNames(Seq("col; DROP")))
    Validators.validateColumnNames(Seq("l_orderkey", "c_name"))
    assertThrows[IllegalArgumentException](Validators.validateFecha("2024-13-01"))
    assertThrows[IllegalArgumentException](Validators.validateFecha("not-a-date"))
    Validators.validateFecha("2024-01-31")
    assertThrows[IllegalArgumentException](
      Validators.scanSqlForDangerousKeywords("x > 0; DROP TABLE t"))
    assertThrows[IllegalArgumentException](
      Validators.scanSqlForDangerousKeywords("updated_at IS NOT NULL")) // substring match, reference-faithful
    Validators.scanSqlForDangerousKeywords("currency IN ('USD')")
  }

  test("config-level validation wires through fromYaml") {
    val bad = referenceShapedYaml.replace(
      "sql_condition: \"currency IN ('USD', 'EUR', 'COP', 'PEN', 'CLP')\"",
      "sql_condition: \"1=1; DROP TABLE x\"")
    assertThrows[IllegalArgumentException](DqConfig.fromYaml(bad))
  }
}
