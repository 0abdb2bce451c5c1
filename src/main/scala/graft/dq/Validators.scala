package graft.dq

/** Security validation of DQ config inputs, ported from the reference's
  * DataQualitySecurityValidator (tests/dq_sql_notes.md:263-344).
  *
  * Custom SQL conditions are interpolated into `spark.sql` text
  * (dq_sql_notes.md:238-242), so identifiers, table names, dates, and SQL
  * fragments are validated before any query is built.
  */
object Validators {

  /** Allowed characters for identifiers (dq_sql_notes.md:272). */
  private val IdentifierPattern = "^[a-zA-Z][a-zA-Z0-9_]*$".r

  /** Forbidden SQL keywords, case-insensitive (dq_sql_notes.md:275-279). */
  val ForbiddenKeywords: Set[String] = Set(
    "drop", "truncate", "delete", "insert", "update", "create",
    "alter", "exec", "execute", "sp_", "xp_", "grant", "revoke",
    "merge", "bulk", "openquery", "openrowset", "dbcc")

  /** Table name: either warehouse 3-part `project.dataset.table`
    * (dq_sql_notes.md:282) or a bare registered table/view name.
    */
  private val ThreePartPattern = "^[a-zA-Z0-9_-]+\\.[a-zA-Z0-9_-]+\\.[a-zA-Z0-9_-]+$".r
  private val BarePattern = "^[a-zA-Z][a-zA-Z0-9_]*$".r

  def validateTableName(name: String): Unit =
    require(
      ThreePartPattern.matches(name) || BarePattern.matches(name),
      s"Invalid table name format: $name")

  def validateColumnNames(columns: Seq[String]): Unit =
    columns.foreach { c =>
      require(IdentifierPattern.matches(c), s"Invalid column name: $c")
    }

  /** Date format YYYY-MM-DD (dq_sql_notes.md:300-306). */
  def validateFecha(fecha: String): Unit =
    try { java.time.LocalDate.parse(fecha); () }
    catch {
      case _: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(s"Invalid date format: $fecha")
    }

  /** Substring scan for dangerous keywords (dq_sql_notes.md:307-317 —
    * deliberately reference-faithful: a substring match, not a token
    * match, so e.g. "updated_at" is rejected exactly as the reference
    * rejects it).
    */
  def scanSqlForDangerousKeywords(sql: String): Unit = {
    val lower = sql.toLowerCase
    ForbiddenKeywords.foreach { kw =>
      require(!lower.contains(kw), s"Forbidden SQL keyword detected: $kw")
    }
  }

  /** Full-SELECT rule: must be a single SELECT statement (reference
    * flagship rules, dq_sql_notes.md:17-29,36-44) and pass the keyword
    * scan; statement separators are rejected so one rule is one query.
    */
  def validateCustomSelect(sql: String): Unit = {
    val trimmed = sql.trim
    require(trimmed.toLowerCase.startsWith("select") ||
      trimmed.toLowerCase.startsWith("with"),
      s"custom_select must be a SELECT statement: ${trimmed.take(40)}...")
    require(!trimmed.contains(";"), "custom_select must be a single statement")
    scanSqlForDangerousKeywords(trimmed)
  }

  /** Comprehensive config validation (dq_sql_notes.md:319-344). */
  def validateConfig(cfg: DqConfig): Unit = {
    validateTableName(cfg.tableName)
    cfg.fecha.foreach(validateFecha)
    validateColumnNames(cfg.tests.completeness)
    cfg.tests.uniqueness.foreach(validateColumnNames)
    validateColumnNames(cfg.tests.format.map(_._1))
    validateColumnNames(cfg.tests.range.map(_._1))
    cfg.tests.customSql.foreach(t => scanSqlForDangerousKeywords(t.sqlCondition))
    cfg.tests.customSelect.foreach(t => validateCustomSelect(t.sql))
  }
}
