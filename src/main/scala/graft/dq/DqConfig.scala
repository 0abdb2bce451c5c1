package graft.dq

/** Typed DQ job configuration, mirroring the reference template
  * (tests/example_templates.yaml:1-60; programmatic shape in
  * tests/dq_sql_notes.md:3-49).
  */
final case class DqConfig(
    tableName: String,
    fecha: Option[String] = None, // date slice; None = full-table scan (weekly mode, yaml:106)
    dateColumn: String = "fecha",
    tests: DqTests = DqTests(),
    notifications: Notifications = Notifications(),
    thresholds: QualityThresholds = QualityThresholds(),
    processing: Processing = Processing())

final case class DqTests(
    completeness: Seq[String] = Nil,
    uniqueness: Seq[Seq[String]] = Nil,
    format: Seq[(String, String)] = Nil, // (column, named rule) — ordered
    range: Seq[(String, RangeBounds)] = Nil,
    customSql: Seq[CustomSqlTest] = Nil,
    customSelect: Seq[CustomSelectTest] = Nil)

final case class RangeBounds(min: Option[Double], max: Option[Double])

final case class CustomSqlTest(
    testName: String,
    sqlCondition: String,
    severity: String = "ERROR",
    expectedResult: Long = 0L)

/** A complete user-supplied SELECT returning the *failing* rows — the
  * reference's flagship rule shape (hierarchy NOT EXISTS check,
  * dq_sql_notes.md:17-29; currency-tolerance LEFT JOIN, :36-44). The
  * statement may join any registered table/view; the rule passes when the
  * row count equals `expectedResult` (reference `expected_result: 0`).
  */
final case class CustomSelectTest(
    testName: String,
    sql: String,
    severity: String = "ERROR",
    expectedResult: Long = 0L)

final case class Notifications(
    onFailure: Seq[String] = Nil,
    onWarning: Seq[String] = Nil)

final case class QualityThresholds(
    completenessThreshold: Double = 95.0,
    maxFailureRate: Double = 5.0,
    criticalColumns: Seq[String] = Nil)

final case class Processing(
    batchSize: Long = 100000L,
    timeoutSeconds: Long = 300L,
    retryFailedTests: Boolean = true,
    fullTableScan: Boolean = false)

object DqConfig {

  /** Parse a YAML job config (reference shape) into the typed form,
    * then run the security validators (dq_sql_notes.md:263-344).
    */
  def fromYaml(text: String): DqConfig = {
    val root = MiniYaml.parse(text)
    def str(m: Map[String, Any], k: String): Option[String] =
      m.get(k).collect { case s: String => s }
    def map(a: Any): Map[String, Any] = a match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case null => Map.empty
      case other => throw new IllegalArgumentException(s"expected map, got $other")
    }
    def list(a: Any): List[Any] = a match {
      case l: List[Any @unchecked] => l
      case null => Nil
      case other => throw new IllegalArgumentException(s"expected list, got $other")
    }
    def dbl(a: Any): Double = a match {
      case d: java.lang.Double => d
      case l: java.lang.Long => l.toDouble
      case other => throw new IllegalArgumentException(s"expected number, got $other")
    }

    val testsM = root.get("tests").map(map).getOrElse(Map.empty)
    val tests = DqTests(
      completeness = list(testsM.getOrElse("completeness", null)).map(_.toString),
      uniqueness = list(testsM.getOrElse("uniqueness", null)).map {
        case keys: List[Any @unchecked] => keys.map(_.toString)
        case single => Seq(single.toString)
      },
      format = root.get("tests").map(map).getOrElse(Map.empty)
        .get("format").map(map).getOrElse(Map.empty)
        .toSeq.map { case (k, v) => k -> v.toString },
      range = testsM.get("range").map(map).getOrElse(Map.empty)
        .toSeq.map { case (k, v) =>
          val b = map(v)
          k -> RangeBounds(b.get("min").map(dbl), b.get("max").map(dbl))
        },
      customSql = list(testsM.getOrElse("custom_sql", null)).map { t =>
        val m = map(t)
        CustomSqlTest(
          testName = str(m, "test_name").getOrElse(sys.error("custom_sql needs test_name")),
          sqlCondition = str(m, "sql_condition").orElse(str(m, "sql"))
            .getOrElse(sys.error("custom_sql needs sql_condition")),
          severity = str(m, "severity").getOrElse("ERROR"),
          expectedResult = m.get("expected_result")
            .collect { case l: java.lang.Long => l.longValue }.getOrElse(0L))
      },
      customSelect = list(testsM.getOrElse("custom_select", null)).map { t =>
        val m = map(t)
        CustomSelectTest(
          testName = str(m, "test_name").getOrElse(sys.error("custom_select needs test_name")),
          sql = str(m, "sql").getOrElse(sys.error("custom_select needs sql")),
          severity = str(m, "severity").getOrElse("ERROR"),
          expectedResult = m.get("expected_result")
            .collect { case l: java.lang.Long => l.longValue }.getOrElse(0L))
      })

    val notifM = root.get("notifications").map(map).getOrElse(Map.empty)
    val threshM = root.get("quality_thresholds").map(map).getOrElse(Map.empty)
    val procM = root.get("processing").map(map).getOrElse(Map.empty)

    val cfg = DqConfig(
      tableName = str(root, "table_name").getOrElse(sys.error("config needs table_name")),
      fecha = str(root, "fecha"),
      tests = tests,
      notifications = Notifications(
        onFailure = list(notifM.getOrElse("on_failure", null)).map(_.toString),
        onWarning = list(notifM.getOrElse("on_warning", null)).map(_.toString)),
      thresholds = QualityThresholds(
        completenessThreshold = threshM.get("completeness_threshold").map(dbl).getOrElse(95.0),
        maxFailureRate = threshM.get("max_failure_rate").map(dbl).getOrElse(5.0),
        criticalColumns = list(threshM.getOrElse("critical_columns", null)).map(_.toString)),
      processing = Processing(
        batchSize = procM.get("batch_size").collect { case l: java.lang.Long => l.longValue }.getOrElse(100000L),
        timeoutSeconds = procM.get("timeout_seconds").collect { case l: java.lang.Long => l.longValue }.getOrElse(300L),
        retryFailedTests = procM.get("retry_failed_tests").collect { case b: java.lang.Boolean => b.booleanValue }.getOrElse(true),
        fullTableScan = procM.get("full_table_scan").collect { case b: java.lang.Boolean => b.booleanValue }.getOrElse(false)))

    Validators.validateConfig(cfg)
    cfg
  }
}
