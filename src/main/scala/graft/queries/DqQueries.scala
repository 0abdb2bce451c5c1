package graft.queries

import graft.Tables
import graft.dq._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The five DQ check families (SURVEY.md §2.2/§2.4, M1) run through
  * [[graft.dq.DqEngine]] against testdata tables, each with a DuckDB
  * oracle that recomputes the full PASS/FAIL result relation in SQL.
  */
object DqQueries extends QueryModule {

  private val testDate = "2024-01-01"

  private def run(s: SparkSession, dir: String, table: String, tests: DqTests): DataFrame =
    DqEngine.run(s, Tables.load(s, dir, table),
      DqConfig(tableName = table, tests = tests), testDate).toDF()

  val defs: Seq[QueryDef] = Seq(

    QueryDef("dq_completeness",
      (s, dir) => run(s, dir, "customer",
        DqTests(completeness = Seq("c_name", "c_acctbal", "c_mktsegment")))
        .select("test_date", "test_name", "test_category", "status",
          "failed_records", "total_records", "failure_rate", "column_name")
        .orderBy("test_name"),
      Some(s"""WITH agg AS (SELECT count(*) AS total,
          CAST(sum(CASE WHEN c_name IS NULL OR c_name = '' THEN 1 ELSE 0 END) AS BIGINT) AS f_name,
          CAST(sum(CASE WHEN c_acctbal IS NULL OR isnan(c_acctbal) THEN 1 ELSE 0 END) AS BIGINT) AS f_bal,
          CAST(sum(CASE WHEN c_mktsegment IS NULL OR c_mktsegment = '' THEN 1 ELSE 0 END) AS BIGINT) AS f_mkt
        FROM customer),
      r AS (
        SELECT 'completeness_c_name' AS test_name, f_name AS failed, total, 'c_name' AS column_name FROM agg
        UNION ALL SELECT 'completeness_c_acctbal', f_bal, total, 'c_acctbal' FROM agg
        UNION ALL SELECT 'completeness_c_mktsegment', f_mkt, total, 'c_mktsegment' FROM agg)
      SELECT '$testDate' AS test_date, test_name, 'completeness' AS test_category,
        CASE WHEN failed = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
        failed AS failed_records, total AS total_records,
        CASE WHEN total = 0 THEN 0.0 ELSE CAST(failed AS DOUBLE) / total END AS failure_rate,
        column_name
      FROM r ORDER BY test_name""")),

    QueryDef("dq_uniqueness",
      (s, dir) => run(s, dir, "orders",
        DqTests(uniqueness = Seq(Seq("o_orderkey"), Seq("o_custkey"), Seq("o_custkey", "o_orderstatus"))))
        .select("test_date", "test_name", "test_category", "status",
          "failed_records", "total_records", "failure_rate", "key_columns")
        .orderBy("test_name"),
      Some(s"""WITH total AS (SELECT count(*) AS total FROM orders),
      d1 AS (SELECT count(*) AS n FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1) x),
      d2 AS (SELECT count(*) AS n FROM (SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) > 1) x),
      d3 AS (SELECT count(*) AS n FROM (SELECT o_custkey, o_orderstatus FROM orders GROUP BY o_custkey, o_orderstatus HAVING count(*) > 1) x),
      r AS (
        SELECT 'uniqueness_o_orderkey' AS test_name, (SELECT n FROM d1) AS failed, 'o_orderkey' AS key_columns
        UNION ALL SELECT 'uniqueness_o_custkey', (SELECT n FROM d2), 'o_custkey'
        UNION ALL SELECT 'uniqueness_o_custkey_o_orderstatus', (SELECT n FROM d3), 'o_custkey,o_orderstatus')
      SELECT '$testDate' AS test_date, test_name, 'uniqueness' AS test_category,
        CASE WHEN failed = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
        failed AS failed_records, (SELECT total FROM total) AS total_records,
        CASE WHEN (SELECT total FROM total) = 0 THEN 0.0
             ELSE CAST(failed AS DOUBLE) / (SELECT total FROM total) END AS failure_rate,
        key_columns
      FROM r ORDER BY test_name""")),

    QueryDef("dq_format",
      (s, dir) => run(s, dir, "customer",
        DqTests(format = Seq(
          "c_acctbal" -> "positive",
          "c_mktsegment" -> "not_empty",
          "c_name" -> "not_empty")))
        .select("test_date", "test_name", "test_category", "status",
          "failed_records", "total_records", "failure_rate", "column_name", "rule")
        .orderBy("test_name"),
      Some(s"""WITH agg AS (SELECT count(*) AS total,
          CAST(sum(CASE WHEN c_acctbal <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS f_pos,
          CAST(sum(CASE WHEN c_mktsegment IS NULL OR c_mktsegment = '' THEN 1 ELSE 0 END) AS BIGINT) AS f_mkt,
          CAST(sum(CASE WHEN c_name IS NULL OR c_name = '' THEN 1 ELSE 0 END) AS BIGINT) AS f_name
        FROM customer),
      r AS (
        SELECT 'format_c_acctbal_positive' AS test_name, f_pos AS failed, total, 'c_acctbal' AS column_name, 'positive' AS rule FROM agg
        UNION ALL SELECT 'format_c_mktsegment_not_empty', f_mkt, total, 'c_mktsegment', 'not_empty' FROM agg
        UNION ALL SELECT 'format_c_name_not_empty', f_name, total, 'c_name', 'not_empty' FROM agg)
      SELECT '$testDate' AS test_date, test_name, 'format' AS test_category,
        CASE WHEN failed = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
        failed AS failed_records, total AS total_records,
        CASE WHEN total = 0 THEN 0.0 ELSE CAST(failed AS DOUBLE) / total END AS failure_rate,
        column_name, rule
      FROM r ORDER BY test_name""")),

    QueryDef("dq_range",
      (s, dir) => run(s, dir, "lineitem",
        DqTests(range = Seq(
          "l_discount" -> RangeBounds(Some(0.0), Some(0.06)),
          "l_quantity" -> RangeBounds(Some(1.0), None),
          "l_tax" -> RangeBounds(None, Some(0.05)))))
        .select("test_date", "test_name", "test_category", "status",
          "failed_records", "total_records", "failure_rate", "column_name",
          "min_value", "max_value")
        .orderBy("test_name"),
      Some(s"""WITH agg AS (SELECT count(*) AS total,
          CAST(sum(CASE WHEN NOT (l_discount IS NOT NULL AND l_discount >= 0.0 AND l_discount <= 0.06) THEN 1 ELSE 0 END) AS BIGINT) AS f_disc,
          CAST(sum(CASE WHEN NOT (l_quantity IS NOT NULL AND l_quantity >= 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS f_qty,
          CAST(sum(CASE WHEN NOT (l_tax IS NOT NULL AND l_tax <= 0.05) THEN 1 ELSE 0 END) AS BIGINT) AS f_tax
        FROM lineitem),
      r AS (
        SELECT 'range_l_discount' AS test_name, f_disc AS failed, total, 'l_discount' AS column_name,
          CAST(0.0 AS DOUBLE) AS min_value, CAST(0.06 AS DOUBLE) AS max_value FROM agg
        UNION ALL SELECT 'range_l_quantity', f_qty, total, 'l_quantity', CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE) FROM agg
        UNION ALL SELECT 'range_l_tax', f_tax, total, 'l_tax', CAST(NULL AS DOUBLE), CAST(0.05 AS DOUBLE) FROM agg)
      SELECT '$testDate' AS test_date, test_name, 'range' AS test_category,
        CASE WHEN failed = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
        failed AS failed_records, total AS total_records,
        CASE WHEN total = 0 THEN 0.0 ELSE CAST(failed AS DOUBLE) / total END AS failure_rate,
        column_name, min_value, max_value
      FROM r ORDER BY test_name""")),

    // The reference's two flagship DQ rules are COMPLETE SELECT statements
    // joining other tables (currency-tolerance LEFT JOIN,
    // dq_sql_notes.md:36-44; hierarchy NOT EXISTS, :17-29) — run through
    // the engine's custom_select path over registered views.
    QueryDef("dq_custom_join",
      (s, dir) => {
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        Tables.load(s, dir, "part").createOrReplaceTempView("part")
        val orders = Tables.load(s, dir, "orders")
        orders.createOrReplaceTempView("orders")
        DqEngine.run(s, orders,
          DqConfig(tableName = "orders", tests = DqTests(customSelect = Seq(
            CustomSelectTest("tolerance_violations",
              """SELECT t.l_orderkey, t.l_partkey FROM lineitem t
                 LEFT JOIN part r ON t.l_partkey = r.p_partkey
                 WHERE r.p_partkey IS NOT NULL
                   AND ABS(t.l_extendedprice - r.p_retailprice * t.l_quantity) > 1000.0"""),
            CustomSelectTest("orphan_orders",
              """SELECT o.o_orderkey FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""")))),
          testDate).toDF()
          .select("test_date", "test_name", "test_category", "status",
            "failed_records", "total_records", "failure_rate")
          .orderBy("test_name")
      },
      Some(s"""WITH total AS (SELECT count(*) AS t FROM orders),
        f1 AS (SELECT count(*) AS n FROM lineitem t
          LEFT JOIN part r ON t.l_partkey = r.p_partkey
          WHERE r.p_partkey IS NOT NULL
            AND ABS(t.l_extendedprice - r.p_retailprice * t.l_quantity) > 1000.0),
        f2 AS (SELECT count(*) AS n FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)),
        r AS (
          SELECT 'custom_tolerance_violations' AS test_name, (SELECT n FROM f1) AS failed
          UNION ALL SELECT 'custom_orphan_orders', (SELECT n FROM f2))
        SELECT '$testDate' AS test_date, test_name, 'custom_select' AS test_category,
          CASE WHEN failed = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
          failed AS failed_records, (SELECT t FROM total) AS total_records,
          CASE WHEN (SELECT t FROM total) = 0 THEN 0.0
               ELSE CAST(failed AS DOUBLE) / (SELECT t FROM total) END AS failure_rate
        FROM r ORDER BY test_name""")),

    // Every named format rule the reference declares (including the
    // declared-but-unimplemented numeric_11/email_format/phone_format —
    // engine-defined regexes, SURVEY.md §2.6).
    QueryDef("dq_format_rules",
      (s, dir) => run(s, dir, "customer",
        DqTests(format = Seq(
          "c_mktsegment" -> "length_3",
          "c_custkey" -> "numeric_11",
          "c_name" -> "email_format",
          "c_name" -> "phone_format")))
        .select("test_date", "test_name", "test_category", "status",
          "failed_records", "total_records", "failure_rate", "column_name", "rule")
        .orderBy("test_name"),
      Some(s"""WITH agg AS (SELECT count(*) AS total,
          CAST(sum(CASE WHEN NOT regexp_matches(c_mktsegment, '^[A-Z]{3}$$') THEN 1 ELSE 0 END) AS BIGINT) AS f_len,
          CAST(sum(CASE WHEN NOT regexp_matches(CAST(c_custkey AS VARCHAR), '^[0-9]{11}$$') THEN 1 ELSE 0 END) AS BIGINT) AS f_num,
          CAST(sum(CASE WHEN NOT regexp_matches(c_name, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$$') THEN 1 ELSE 0 END) AS BIGINT) AS f_email,
          CAST(sum(CASE WHEN NOT regexp_matches(c_name, '^[+]?[0-9][0-9 ()-]{6,18}$$') THEN 1 ELSE 0 END) AS BIGINT) AS f_phone
        FROM customer),
      r AS (
        SELECT 'format_c_mktsegment_length_3' AS test_name, f_len AS failed, total, 'c_mktsegment' AS column_name, 'length_3' AS rule FROM agg
        UNION ALL SELECT 'format_c_custkey_numeric_11', f_num, total, 'c_custkey', 'numeric_11' FROM agg
        UNION ALL SELECT 'format_c_name_email_format', f_email, total, 'c_name', 'email_format' FROM agg
        UNION ALL SELECT 'format_c_name_phone_format', f_phone, total, 'c_name', 'phone_format' FROM agg)
      SELECT '$testDate' AS test_date, test_name, 'format' AS test_category,
        CASE WHEN failed = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
        failed AS failed_records, total AS total_records,
        CASE WHEN total = 0 THEN 0.0 ELSE CAST(failed AS DOUBLE) / total END AS failure_rate,
        column_name, rule
      FROM r ORDER BY test_name""")),

    // Threshold/severity gating applied in-plan over the results relation
    // (example_templates.yaml:30,45,51-54).
    QueryDef("dq_classified",
      (s, dir) => {
        val th = QualityThresholds(completenessThreshold = 95.0,
          maxFailureRate = 1.0, criticalColumns = Seq("c_name"))
        run(s, dir, "customer", DqTests(
            completeness = Seq("c_name", "c_acctbal"),
            format = Seq("c_mktsegment" -> "length_3")))
          .withColumn("alert", DqEngine.classificationColumn(th))
          .select("test_name", "status", "failed_records", "total_records",
            "failure_rate", "alert")
          .orderBy("test_name")
      },
      Some(s"""WITH agg AS (SELECT count(*) AS total,
          CAST(sum(CASE WHEN c_name IS NULL OR c_name = '' THEN 1 ELSE 0 END) AS BIGINT) AS f_name,
          CAST(sum(CASE WHEN c_acctbal IS NULL OR isnan(c_acctbal) THEN 1 ELSE 0 END) AS BIGINT) AS f_bal,
          CAST(sum(CASE WHEN NOT regexp_matches(c_mktsegment, '^[A-Z]{3}$$') THEN 1 ELSE 0 END) AS BIGINT) AS f_len
        FROM customer),
      r AS (
        SELECT 'completeness_c_name' AS test_name, 'completeness' AS cat, f_name AS failed, total, 'c_name' AS column_name FROM agg
        UNION ALL SELECT 'completeness_c_acctbal', 'completeness', f_bal, total, 'c_acctbal' FROM agg
        UNION ALL SELECT 'format_c_mktsegment_length_3', 'format', f_len, total, 'c_mktsegment' FROM agg),
      c AS (
        SELECT test_name,
          CASE WHEN failed = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
          failed AS failed_records, total AS total_records,
          CASE WHEN total = 0 THEN 0.0 ELSE CAST(failed AS DOUBLE) / total END AS failure_rate,
          cat, column_name FROM r)
      SELECT test_name, status, failed_records, total_records, failure_rate,
        CASE WHEN status = 'PASS' THEN 'OK'
             WHEN column_name IN ('c_name') THEN 'CRITICAL'
             WHEN cat = 'completeness' AND (100.0 - failure_rate * 100.0) < 95.0 THEN 'CRITICAL'
             WHEN failure_rate * 100.0 > 1.0 THEN 'CRITICAL'
             ELSE 'WARNING' END AS alert
      FROM c ORDER BY test_name""")),

    QueryDef("dq_custom_sql",
      (s, dir) => run(s, dir, "orders",
        DqTests(customSql = Seq(
          CustomSqlTest("valid_status", "o_orderstatus IN ('O', 'F', 'P')"),
          CustomSqlTest("no_future_orders", "o_orderdate <= CURRENT_DATE()"),
          CustomSqlTest("price_cap", "o_totalprice <= 450000.0", severity = "WARNING"))))
        .select("test_date", "test_name", "test_category", "status",
          "failed_records", "total_records", "failure_rate", "sql_condition")
        .orderBy("test_name"),
      Some(s"""WITH agg AS (SELECT count(*) AS total,
          CAST(sum(CASE WHEN NOT (o_orderstatus IN ('O', 'F', 'P')) THEN 1 ELSE 0 END) AS BIGINT) AS f_status,
          CAST(sum(CASE WHEN NOT (o_orderdate <= CAST(current_date AS TIMESTAMP)) THEN 1 ELSE 0 END) AS BIGINT) AS f_future,
          CAST(sum(CASE WHEN NOT (o_totalprice <= 450000.0) THEN 1 ELSE 0 END) AS BIGINT) AS f_price
        FROM orders),
      r AS (
        SELECT 'custom_valid_status' AS test_name, f_status AS failed, total, 'o_orderstatus IN (''O'', ''F'', ''P'')' AS sql_condition FROM agg
        UNION ALL SELECT 'custom_no_future_orders', f_future, total, 'o_orderdate <= CURRENT_DATE()' FROM agg
        UNION ALL SELECT 'custom_price_cap', f_price, total, 'o_totalprice <= 450000.0' FROM agg)
      SELECT '$testDate' AS test_date, test_name, 'custom' AS test_category,
        CASE WHEN failed = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
        failed AS failed_records, total AS total_records,
        CASE WHEN total = 0 THEN 0.0 ELSE CAST(failed AS DOUBLE) / total END AS failure_rate,
        sql_condition
      FROM r ORDER BY test_name""")),

    // Daily date-slice mode (the reference's fecha parameter,
    // dq_sql_notes.md:75): the engine audits ONE day's partition, not
    // the accumulated table — the incremental-DQ shape that keeps a
    // daily audit O(day) at any table size.
    QueryDef("dq_date_slice",
      (s, dir) => DqEngine.run(s, Tables.load(s, dir, "orders"),
          DqConfig(tableName = "orders", fecha = Some("1998-03-02"),
            dateColumn = "o_orderdate",
            tests = DqTests(completeness = Seq("o_orderstatus", "o_totalprice"))),
          "1998-03-02").toDF()
        .select("test_date", "test_name", "test_category", "status",
          "failed_records", "total_records", "failure_rate")
        .orderBy("test_name"),
      Some("""WITH agg AS (SELECT count(*) AS total,
          CAST(sum(CASE WHEN o_orderstatus IS NULL OR o_orderstatus = '' THEN 1 ELSE 0 END) AS BIGINT) AS f_st,
          CAST(sum(CASE WHEN o_totalprice IS NULL OR isnan(o_totalprice) THEN 1 ELSE 0 END) AS BIGINT) AS f_tp
        FROM orders WHERE o_orderdate = TIMESTAMP '1998-03-02'),
      r AS (
        SELECT 'completeness_o_orderstatus' AS test_name, f_st AS failed, total FROM agg
        UNION ALL SELECT 'completeness_o_totalprice', f_tp, total FROM agg)
      SELECT '1998-03-02' AS test_date, test_name, 'completeness' AS test_category,
        CASE WHEN failed = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
        failed AS failed_records, total AS total_records,
        CASE WHEN total = 0 THEN 0.0 ELSE CAST(failed AS DOUBLE) / total END AS failure_rate
      FROM r ORDER BY test_name""")),

    // The reference's full daily-transactions template — 16 rules
    // (5 completeness + 2 uniqueness + 4 format + 2 range + 3 custom,
    // example_templates.yaml:11-48) mapped onto events and run through
    // the complete YAML → config → fused-engine path. BASELINE.md's
    // derived sanity target: this must be ONE scan + two uniqueness
    // shuffles, never 16 scans.
    QueryDef("dq_full_template",
      (s, dir) => {
        val cfg = DqConfig.fromYaml(
          """project_id: "analytics-project"
            |table_name: events
            |notifications:
            |  on_failure: ["data-team@example.com", "events-team@example.com"]
            |  on_warning: ["data-team@example.com"]
            |tests:
            |  completeness:
            |    - event_id
            |    - user_id
            |    - event_type
            |    - value
            |    - props
            |  uniqueness:
            |    - [user_id, event_type]
            |    - [event_id]
            |  format:
            |    event_type: length_3
            |    props: not_empty
            |    value: positive
            |    user_id: numeric_11
            |  range:
            |    value:
            |      min: 0.001
            |      max: 500.0
            |    user_id:
            |      min: 0
            |      max: 10000
            |  custom_sql:
            |    - test_name: valid_event_types
            |      sql_condition: "event_type IN ('click', 'view', 'purchase', 'signup', 'error')"
            |      severity: ERROR
            |    - test_name: non_negative_value
            |      sql_condition: "value >= 0"
            |      severity: ERROR
            |    - test_name: props_present_shape
            |      sql_condition: "props IS NULL OR length(props) >= 2"
            |      severity: WARNING
            |quality_thresholds:
            |  completeness_threshold: 95.0
            |  max_failure_rate: 5.0
            |  critical_columns: [user_id, event_type, value]
            |processing:
            |  batch_size: 100000
            |  timeout_seconds: 300
            |  retry_failed_tests: true
            |""".stripMargin)
        DqEngine.run(s, Tables.load(s, dir, cfg.tableName), cfg, testDate).toDF()
          .select("test_date", "test_name", "test_category", "status",
            "failed_records", "total_records", "failure_rate")
          .orderBy("test_name")
      },
      Some(s"""WITH agg AS (SELECT count(*) AS total,
          CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS f_c_eid,
          CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS f_c_uid,
          CAST(sum(CASE WHEN event_type IS NULL OR event_type = '' THEN 1 ELSE 0 END) AS BIGINT) AS f_c_et,
          CAST(sum(CASE WHEN value IS NULL OR isnan(value) THEN 1 ELSE 0 END) AS BIGINT) AS f_c_val,
          CAST(sum(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END) AS BIGINT) AS f_c_props,
          CAST(sum(CASE WHEN NOT regexp_matches(event_type, '^[A-Z]{3}$$') THEN 1 ELSE 0 END) AS BIGINT) AS f_f_et,
          CAST(sum(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END) AS BIGINT) AS f_f_props,
          CAST(sum(CASE WHEN value <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS f_f_pos,
          CAST(sum(CASE WHEN NOT regexp_matches(CAST(user_id AS VARCHAR), '^[0-9]{11}$$') THEN 1 ELSE 0 END) AS BIGINT) AS f_f_u11,
          CAST(sum(CASE WHEN NOT (value IS NOT NULL AND value >= 0.001 AND value <= 500.0) THEN 1 ELSE 0 END) AS BIGINT) AS f_r_val,
          CAST(sum(CASE WHEN NOT (user_id IS NOT NULL AND user_id >= 0 AND user_id <= 10000) THEN 1 ELSE 0 END) AS BIGINT) AS f_r_uid,
          CAST(sum(CASE WHEN NOT (event_type IN ('click', 'view', 'purchase', 'signup', 'error')) THEN 1 ELSE 0 END) AS BIGINT) AS f_x_types,
          CAST(sum(CASE WHEN NOT (value >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS f_x_nonneg,
          CAST(sum(CASE WHEN NOT (props IS NULL OR length(props) >= 2) THEN 1 ELSE 0 END) AS BIGINT) AS f_x_shape
        FROM events),
      d1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT 1 FROM events GROUP BY user_id, event_type HAVING count(*) > 1) t),
      d2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT 1 FROM events GROUP BY event_id HAVING count(*) > 1) t),
      r AS (
        SELECT 'completeness_event_id' AS test_name, 'completeness' AS cat, f_c_eid AS failed, total FROM agg
        UNION ALL SELECT 'completeness_user_id', 'completeness', f_c_uid, total FROM agg
        UNION ALL SELECT 'completeness_event_type', 'completeness', f_c_et, total FROM agg
        UNION ALL SELECT 'completeness_value', 'completeness', f_c_val, total FROM agg
        UNION ALL SELECT 'completeness_props', 'completeness', f_c_props, total FROM agg
        UNION ALL SELECT 'format_event_type_length_3', 'format', f_f_et, total FROM agg
        UNION ALL SELECT 'format_props_not_empty', 'format', f_f_props, total FROM agg
        UNION ALL SELECT 'format_value_positive', 'format', f_f_pos, total FROM agg
        UNION ALL SELECT 'format_user_id_numeric_11', 'format', f_f_u11, total FROM agg
        UNION ALL SELECT 'range_value', 'range', f_r_val, total FROM agg
        UNION ALL SELECT 'range_user_id', 'range', f_r_uid, total FROM agg
        UNION ALL SELECT 'custom_valid_event_types', 'custom', f_x_types, total FROM agg
        UNION ALL SELECT 'custom_non_negative_value', 'custom', f_x_nonneg, total FROM agg
        UNION ALL SELECT 'custom_props_present_shape', 'custom', f_x_shape, total FROM agg
        UNION ALL SELECT 'uniqueness_user_id_event_type', 'uniqueness', (SELECT n FROM d1), total FROM agg
        UNION ALL SELECT 'uniqueness_event_id', 'uniqueness', (SELECT n FROM d2), total FROM agg)
      SELECT '$testDate' AS test_date, test_name, cat AS test_category,
        CASE WHEN failed = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
        failed AS failed_records, total AS total_records,
        CASE WHEN total = 0 THEN 0.0 ELSE CAST(failed AS DOUBLE) / total END AS failure_rate
      FROM r ORDER BY test_name""")),

    // The reference's `expected_result` assertion aggregate (SURVEY §2.4
    // agg_expected_zero; tests/dq_sql_notes.md:29,44): a rule PASSes iff
    // its violation count equals the declared constant — usually 0, but
    // the comparison is against the config value, not zero. region is
    // constant at every SF (5 fixed rows), so all three verdicts are
    // deterministic: expected-0 met (PASS), expected-1 met on a nonzero
    // count (PASS — proves the comparand is the config value), and
    // expected-0 violated (FAIL). All three fuse into the engine's single
    // row-local scan.
    QueryDef("agg_expected_zero",
      (s, dir) => run(s, dir, "region",
        DqTests(customSql = Seq(
          CustomSqlTest("nonneg_key", "r_regionkey >= 0", expectedResult = 0L),
          CustomSqlTest("exactly_one_asia", "r_name <> 'ASIA'", expectedResult = 1L),
          CustomSqlTest("all_keys_small", "r_regionkey < 3", expectedResult = 0L))))
        .select("test_date", "test_name", "test_category", "status",
          "failed_records", "total_records", "failure_rate", "sql_condition")
        .orderBy("test_name"),
      Some(s"""WITH agg AS (SELECT count(*) AS total,
          CAST(sum(CASE WHEN NOT (r_regionkey >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS f_nonneg,
          CAST(sum(CASE WHEN NOT (r_name <> 'ASIA') THEN 1 ELSE 0 END) AS BIGINT) AS f_asia,
          CAST(sum(CASE WHEN NOT (r_regionkey < 3) THEN 1 ELSE 0 END) AS BIGINT) AS f_small
        FROM region),
      r AS (
        SELECT 'custom_nonneg_key' AS test_name, f_nonneg AS failed, 0 AS expected, 'r_regionkey >= 0' AS sql_condition, total FROM agg
        UNION ALL SELECT 'custom_exactly_one_asia', f_asia, 1, 'r_name <> ''ASIA''', total FROM agg
        UNION ALL SELECT 'custom_all_keys_small', f_small, 0, 'r_regionkey < 3', total FROM agg)
      SELECT '$testDate' AS test_date, test_name, 'custom' AS test_category,
        CASE WHEN failed = expected THEN 'PASS' ELSE 'FAIL' END AS status,
        failed AS failed_records, total AS total_records,
        CASE WHEN total = 0 THEN 0.0 ELSE CAST(failed AS DOUBLE) / total END AS failure_rate,
        sql_condition
      FROM r ORDER BY test_name""")),

    // ── Bloom-filter false-positive-rate audit (the empirical check
    //    behind every bloom-pruned join / semi-join pushdown: is the
    //    m-bits/k-hashes budget actually delivering its promised FPR on
    //    THIS key distribution?): build a RELATIONAL bloom — the set of
    //    distinct bit positions md5(j‖key) % 4096, j ∈ 1..3, over the
    //    member set (custkeys that ordered) — then probe every true
    //    negative (customers with no orders); a probe false-positives
    //    iff all 3 of its rows find their position in the set (count
    //    after the equi join vs the ≤4096-row broadcast position table —
    //    duplicate positions within a probe count per-row, so the
    //    all-present test stays a plain count). Reports empirical FPR
    //    next to the fill-ratio theory value p³ — three IEEE ops.
    //    Everything is md5-deterministic, so the oracle replays filter
    //    construction and probing bit-for-bit. ──────────────────────────
    QueryDef("dq_bloom_fpr_eval",
      (s, dir) => {
        import s.implicits._
        val m = 4096L
        def positions(key: org.apache.spark.sql.Column) =
          array((1 to 3).map(j =>
            pmod(conv(substring(md5(concat(lit(s"$j:"),
              key.cast("string"))), 1, 8), 16, 10).cast("long"), lit(m))): _*)
        val members = Tables.load(s, dir, "orders")
          .select($"o_custkey".as("key")).distinct()
        val bits = members.select(explode(positions($"key")).as("pos"))
          .distinct()
        val negatives = Tables.load(s, dir, "customer")
          .select($"c_custkey".as("key"))
          .join(members, Seq("key"), "left_anti")
        val fp = negatives
          .select($"key", explode(positions($"key")).as("pos"))
          .join(broadcast(bits), Seq("pos"))
          .groupBy($"key").agg(count(lit(1)).as("nhit"))
          .filter($"nhit" === 3)
        members.agg(count(lit(1)).as("n_members"))
          .crossJoin(broadcast(bits.agg(count(lit(1)).as("n_bits_set"))))
          .crossJoin(broadcast(negatives.agg(count(lit(1)).as("n_neg"))))
          .crossJoin(broadcast(fp.agg(count(lit(1)).as("n_fp"))))
          .select($"n_members", $"n_bits_set", $"n_neg", $"n_fp",
            when($"n_neg" > 0,
              $"n_fp".cast("double") / $"n_neg".cast("double"))
              .as("fpr_empirical"),
            ($"n_bits_set".cast("double") / lit(m.toDouble)).as("fill_ratio"),
            (($"n_bits_set".cast("double") / lit(m.toDouble))
              * ($"n_bits_set".cast("double") / lit(m.toDouble))
              * ($"n_bits_set".cast("double") / lit(m.toDouble)))
              .as("fpr_theory"))
      },
      Some(s"""WITH mem AS (SELECT DISTINCT o_custkey AS key FROM orders),
        mh AS (SELECT key, md5(CAST(j AS VARCHAR) || ':' || CAST(key AS VARCHAR)) AS h
          FROM mem, (SELECT unnest([1, 2, 3]) AS j)),
        bits AS (SELECT DISTINCT ${OracleGen.md5PrefixExpr("h", 8)} % 4096 AS pos
          FROM mh),
        neg AS (SELECT c_custkey AS key FROM customer
          WHERE c_custkey NOT IN (SELECT key FROM mem)),
        nh AS (SELECT key, md5(CAST(j AS VARCHAR) || ':' || CAST(key AS VARCHAR)) AS h
          FROM neg, (SELECT unnest([1, 2, 3]) AS j)),
        np AS (SELECT key, ${OracleGen.md5PrefixExpr("h", 8)} % 4096 AS pos
          FROM nh),
        fp AS (SELECT key FROM np WHERE pos IN (SELECT pos FROM bits)
          GROUP BY key HAVING count(*) = 3),
        m AS (SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM mem) AS n_members,
          (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set,
          (SELECT CAST(count(*) AS BIGINT) FROM neg) AS n_neg,
          (SELECT CAST(count(*) AS BIGINT) FROM fp) AS n_fp)
        SELECT n_members, n_bits_set, n_neg, n_fp,
          CASE WHEN n_neg > 0 THEN CAST(n_fp AS DOUBLE) / CAST(n_neg AS DOUBLE)
            END AS fpr_empirical,
          CAST(n_bits_set AS DOUBLE) / 4096.0 AS fill_ratio,
          (CAST(n_bits_set AS DOUBLE) / 4096.0)
            * (CAST(n_bits_set AS DOUBLE) / 4096.0)
            * (CAST(n_bits_set AS DOUBLE) / 4096.0) AS fpr_theory
        FROM m""")),

    // ── value-set drift between ingestion batches (the "new enum value
    //    broke prod" check that DISTRIBUTION drift metrics miss — PSI/
    //    TV/JS compare shares over a shared support; this audits the
    //    SUPPORT itself): categories = 50-char length bands of
    //    documents, batches = doc_id parity halves; a full-outer join
    //    of the two per-batch category aggregates labels every band
    //    emerged / vanished / stable with exact counts. One scan, two
    //    |bands|-row frames. ────────────────────────────────────────────
    QueryDef("dq_category_drift",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
          .select(($"n_chars" - pmod($"n_chars", lit(50L))).as("band"),
            pmod($"doc_id", lit(2L)).as("half"))
        val a = docs.filter($"half" === 0L).groupBy($"band")
          .agg(count(lit(1)).as("n_first"))
        val b = docs.filter($"half" === 1L).groupBy($"band")
          .agg(count(lit(1)).as("n_second"))
        a.join(b, Seq("band"), "full_outer")
          .select($"band",
            coalesce($"n_first", lit(0L)).as("n_first"),
            coalesce($"n_second", lit(0L)).as("n_second"))
          .withColumn("status",
            when($"n_first" === 0L, lit("emerged"))
              .when($"n_second" === 0L, lit("vanished"))
              .otherwise(lit("stable")))
          .orderBy($"band")
      },
      Some("""WITH d AS (SELECT n_chars - n_chars % 50 AS band,
            doc_id % 2 AS half FROM documents),
        a AS (SELECT band, CAST(count(*) AS BIGINT) AS n_first
          FROM d WHERE half = 0 GROUP BY band),
        b AS (SELECT band, CAST(count(*) AS BIGINT) AS n_second
          FROM d WHERE half = 1 GROUP BY band)
        SELECT coalesce(a.band, b.band) AS band,
          coalesce(a.n_first, 0) AS n_first,
          coalesce(b.n_second, 0) AS n_second,
          CASE WHEN coalesce(a.n_first, 0) = 0 THEN 'emerged'
            WHEN coalesce(b.n_second, 0) = 0 THEN 'vanished'
            ELSE 'stable' END AS status
        FROM a FULL OUTER JOIN b ON a.band = b.band
        ORDER BY band""")),

    // ── data-contract check (the schema HANDSHAKE a producer and
    //    consumer pin before either ships: expected column names AND
    //    types, extras flagged, missing flagged — `src_merge_schema`
    //    handles benign evolution, this enforces the agreed surface):
    //    the orders contract as a literal expectation frame, actual
    //    schema introspected from the DataFrame (a metadata operation),
    //    full-outer reconciliation labels every column ok / type_drift
    //    / missing / unexpected. The oracle pins BOTH sides as
    //    literals, so a fixture schema change turns this row red. ───────
    QueryDef("dq_schema_contract",
      (s, dir) => {
        import s.implicits._
        val expected = Seq(
          ("o_orderkey", "bigint"), ("o_custkey", "bigint"),
          ("o_orderstatus", "string"), ("o_totalprice", "double"),
          // parquet timestamp[us] without tz reads as TIMESTAMP_NTZ in
          // Spark 4 — the contract pins the engine-visible type
          ("o_orderdate", "timestamp_ntz"), ("o_orderpriority", "string"),
          ("o_comment", "string") // deliberately absent: exercises `missing`
        ).toDF("column_name", "expected_type")
        val actual = Tables.load(s, dir, "orders").schema.fields.toSeq
          .map(f => (f.name, f.dataType.simpleString))
          .toDF("column_name", "actual_type")
        expected.join(actual, Seq("column_name"), "full_outer")
          .select($"column_name", $"expected_type", $"actual_type",
            when($"expected_type".isNull, lit("unexpected"))
              .when($"actual_type".isNull, lit("missing"))
              .when($"expected_type" === $"actual_type", lit("ok"))
              .otherwise(lit("type_drift")).as("status"))
          .orderBy($"column_name")
      },
      Some("""SELECT * FROM (VALUES
          ('o_comment', 'string', NULL, 'missing'),
          ('o_custkey', 'bigint', 'bigint', 'ok'),
          ('o_orderdate', 'timestamp_ntz', 'timestamp_ntz', 'ok'),
          ('o_orderkey', 'bigint', 'bigint', 'ok'),
          ('o_orderpriority', 'string', 'string', 'ok'),
          ('o_orderstatus', 'string', 'string', 'ok'),
          ('o_totalprice', 'double', 'double', 'ok'))
          t(column_name, expected_type, actual_type, status)
        ORDER BY column_name""")),

    // ── functional-dependency violation audit (the Metanome-style FD
    //    check a profiler runs before trusting a column as a lookup
    //    key): for each CANDIDATE dependency A → B, group by A and
    //    count groups carrying >1 distinct B — a violated FD means A
    //    does NOT determine B and any dimension built keyed on A would
    //    pick rows nondeterministically. Three candidates spanning the
    //    holds / mildly-violated / heavily-violated spectrum; per-FD
    //    row: LHS group count, violating groups, violation rate in
    //    integer basis points, worst per-group RHS fan-out. One hash
    //    aggregate per candidate (count(DISTINCT B) per A, then a
    //    |groups|-bounded rollup) — no joins, no windows. ───────────────
    QueryDef("dq_functional_dependency",
      (s, dir) => {
        import s.implicits._
        def audit(df: DataFrame, fd: String, a: String, b: String): DataFrame =
          df.groupBy(col(a))
            .agg(countDistinct(col(b)).as("n_rhs"))
            .agg(count(lit(1)).as("n_lhs"),
              sum(when($"n_rhs" > 1L, 1L).otherwise(0L)).as("n_violating"),
              max($"n_rhs").as("max_rhs_distinct"))
            .select(lit(fd).as("fd"), $"n_lhs", $"n_violating",
              expr("n_violating * 10000 DIV n_lhs").as("violation_bp"),
              $"max_rhs_distinct")
        audit(Tables.load(s, dir, "events"), "events: user_id -> event_type",
            "user_id", "event_type")
          .unionAll(audit(Tables.load(s, dir, "lineitem"),
            "lineitem: l_partkey -> l_suppkey", "l_partkey", "l_suppkey"))
          .unionAll(audit(Tables.load(s, dir, "orders"),
            "orders: o_custkey -> o_orderpriority",
            "o_custkey", "o_orderpriority"))
          .orderBy($"fd")
      },
      Some("""WITH a1 AS (SELECT user_id, count(DISTINCT event_type) AS n_rhs
            FROM events GROUP BY user_id),
          a2 AS (SELECT l_partkey, count(DISTINCT l_suppkey) AS n_rhs
            FROM lineitem GROUP BY l_partkey),
          a3 AS (SELECT o_custkey, count(DISTINCT o_orderpriority) AS n_rhs
            FROM orders GROUP BY o_custkey),
          u AS (
            SELECT 'events: user_id -> event_type' AS fd,
              CAST(count(*) AS BIGINT) AS n_lhs,
              CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_violating,
              CAST(max(n_rhs) AS BIGINT) AS max_rhs_distinct FROM a1
            UNION ALL
            SELECT 'lineitem: l_partkey -> l_suppkey',
              CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(max(n_rhs) AS BIGINT) FROM a2
            UNION ALL
            SELECT 'orders: o_custkey -> o_orderpriority',
              CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(max(n_rhs) AS BIGINT) FROM a3)
          SELECT fd, n_lhs, n_violating,
            CAST(n_violating * 10000 // n_lhs AS BIGINT) AS violation_bp,
            max_rhs_distinct
          FROM u ORDER BY fd"""))
  )
}
