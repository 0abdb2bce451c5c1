package graft.queries

import java.nio.file.Files

import graft.Tables
import graft.profiling.Profiler
import graft.sources.{Sinks, Sources}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Remaining §2.1 capability slots: dbt seed CSVs, the profiler's APPEND
  * monitoring sink (with read-back proof), and the console sink.
  */
object SourceSinkQueries extends QueryModule {

  /** The reference's currency universe (example_templates.yaml:39) as a
    * seed file — written fresh per run, loaded header+inferSchema like
    * `dbt seed`.
    */
  private val seedContent =
    """currency_code,standard_rate
      |CLP,890.25
      |COP,3900.5
      |EUR,0.92
      |PEN,3.7
      |USD,1.0
      |""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Skew-salted two-stage aggregation over a hot-keyed table; the
    // oracle is the direct GROUP BY — salting must be invisible in the
    // results.
    QueryDef("agg_salted_hotkey",
      (s, dir) => graft.operators.Skew.saltedAggregate(
          Tables.load(s, dir, "events").select("event_type", "user_id"),
          Seq("event_type"), buckets = 8,
          Seq("n" -> (count(lit(1)), sum),
            "n_users_max" -> (max(col("user_id")), (c: org.apache.spark.sql.Column) => max(c))))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n, max(user_id) AS n_users_max
        FROM events GROUP BY event_type ORDER BY event_type""")),

    QueryDef("src_seed_csv",
      (s, _) => {
        val dir = QueryScratch.dir("seed")
        val f = dir.resolve("currency_rates.csv")
        Files.writeString(f, seedContent)
        Sources.loadSeed(s, f.toString, "currency_rates").orderBy("currency_code")
      },
      Some("""SELECT * FROM (VALUES
        ('CLP', CAST(890.25 AS DOUBLE)), ('COP', CAST(3900.5 AS DOUBLE)),
        ('EUR', CAST(0.92 AS DOUBLE)), ('PEN', CAST(3.7 AS DOUBLE)),
        ('USD', CAST(1.0 AS DOUBLE))) t(currency_code, standard_rate)
        ORDER BY currency_code""")),

    // ── malformed-input audit (the ingestion-hardening policy every
    //    production feed needs: PERMISSIVE parse, quarantine column,
    //    per-field null accounting — the alternative is FAILFAST
    //    killing a 100 TB backfill on row 3): a fixture CSV with the
    //    four canonical defects (unparsable numeric, wrong arity,
    //    empty field, unparsable date) reads under an explicit schema +
    //    `_corrupt_record`; the audit counts quarantined rows, per-
    //    column null damage, and sums the UNQUARANTINED amount exactly.
    //    The oracle pins Spark's documented PERMISSIVE accounting as
    //    literals (empty field ⇒ null but NOT corrupt; partial parses
    //    keep their good fields) — a Spark behavior change would
    //    surface as a hash mismatch here. The parsed frame caches
    //    first: Spark refuses corrupt-column-only queries on the raw
    //    scan (SPARK-38523 guard). ──────────────────────────────────────
    QueryDef("src_csv_malformed_audit",
      (s, _) => {
        val dir = QueryScratch.dir("badcsv")
        val f = dir.resolve("feed.csv")
        Files.writeString(f,
          """id,amount,day
            |1,10.5,2024-01-01
            |2,not_a_number,2024-01-02
            |3,30.25,2024-01-03
            |oops_one_field
            |5,,2024-01-05
            |6,60.0,bad-date
            |""".stripMargin)
        val df = s.read
          .option("header", "true")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT, amount DOUBLE, day DATE, _corrupt_record STRING"))
          .csv(f.toString)
          .cache()
        df.agg(count(lit(1)).as("n_rows"),
          sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
            .as("n_quarantined"),
          sum(when(col("amount").isNull, 1L).otherwise(0L))
            .as("n_amount_null"),
          sum(when(col("day").isNull, 1L).otherwise(0L)).as("n_day_null"),
          sum(when(col("_corrupt_record").isNull,
            expr("CAST(round(amount * 100) AS BIGINT)")).otherwise(0L))
            .as("clean_amount_cents"))
      },
      Some("""SELECT CAST(6 AS BIGINT) AS n_rows,
          CAST(3 AS BIGINT) AS n_quarantined,
          CAST(3 AS BIGINT) AS n_amount_null,
          CAST(2 AS BIGINT) AS n_day_null,
          CAST(4075 AS BIGINT) AS clean_amount_cents""")),

    // ORC source/sink round-trip: the columnar alternative Spark ships
    // in-box. The region dims write to ORC, read back, and aggregate —
    // the oracle recomputes from the original parquet, so value equality
    // proves type-faithful fidelity through the ORC writer/reader
    // (strings, ints) with zero extra dependencies.
    QueryDef("src_orc_roundtrip",
      (s, dir) => {
        val tmp = QueryScratch.dir("orc").resolve("nation").toString
        Tables.load(s, dir, "nation").write.mode("overwrite").orc(tmp)
        // reads resolve through the pluggable Source registry (SURVEY §2.1)
        graft.sources.Source("orc").load(s, tmp)
          .groupBy(col("n_regionkey"))
          .agg(count(lit(1)).as("n_nations"),
            min(col("n_name")).as("first_name"),
            max(col("n_nationkey")).as("max_key"))
          .orderBy("n_regionkey")
      },
      Some("""SELECT n_regionkey, count(*) AS n_nations,
          min(n_name) AS first_name, CAST(max(n_nationkey) AS INTEGER) AS max_key
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // JDBC warehouse round-trip through embedded Derby — the Source
    // seam's first REAL connector (SURVEY §2.1 promises a warehouse drop-
    // in; the file formats above can't prove pushdown). The nation dims
    // write into an in-memory Derby table (VARCHAR column types pinned —
    // Spark's DerbyDialect would otherwise map strings to CLOB, which
    // Derby refuses to compare/aggregate), then read BACK through
    // Source("jdbc") with a filter Spark pushes into the database
    // (SourceRegistrySpec pins `PushedFilters` in the scan). Oracle
    // recomputes from the original parquet, so value equality proves
    // type-faithful fidelity through a genuine JDBC write/read.
    QueryDef("src_jdbc_roundtrip",
      (s, dir) => {
        val url = graft.sources.JdbcSource.derbyMemoryUrl("graft_src")
        Tables.load(s, dir, "nation").write.format("jdbc")
          .option("url", url)
          .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
          .option("dbtable", "nation_jdbc")
          .option("createTableColumnTypes",
            "n_name VARCHAR(64)")
          .mode("overwrite").save()
        // (re)bind only when the current "jdbc" binding points elsewhere
        // (e.g. a spec registered its own database): registering bumps
        // the Source generation and invalidates Tables' plan cache, so
        // the steady state must be register-free — case-class equality
        // makes this idempotent across repeat runs
        val want = graft.sources.JdbcSource(url)
        val have = scala.util.Try(graft.sources.Source("jdbc")).toOption
        if (!have.contains(want)) graft.sources.Source.register("jdbc", want)
        graft.sources.Source("jdbc").load(s, "nation_jdbc")
          .filter(col("n_regionkey") >= 2) // pushed into Derby
          .groupBy(col("n_regionkey"))
          .agg(count(lit(1)).as("n_nations"),
            min(col("n_name")).as("first_name"),
            max(col("n_nationkey")).as("max_key"))
          .orderBy("n_regionkey")
      },
      Some("""SELECT n_regionkey, count(*) AS n_nations,
          min(n_name) AS first_name, CAST(max(n_nationkey) AS INTEGER) AS max_key
        FROM nation WHERE n_regionkey >= 2
        GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // JSON-lines source/sink round-trip with INFERRED schema — the
    // other in-box format (spark-avro isn't shipped in /opt/spark/jars).
    // Doubles survive because the JSON writer emits round-trippable
    // reprs; integers infer back to BIGINT. Oracle recomputes from the
    // original parquet.
    QueryDef("src_json_roundtrip",
      (s, dir) => {
        val tmp = QueryScratch.dir("json").resolve("events").toString
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .write.mode("overwrite").json(tmp)
        // schema inferred from the JSON lines; read via the Source seam
        graft.sources.Source("json").load(s, tmp)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(20,2)")).cast("double").as("total_value"),
            max(col("user_id")).as("max_user"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value,
          max(user_id) AS max_user
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // YAML job config (reference orchestrate.md:221-242 /
    // example_templates.yaml shape) driving the DQ engine end to end —
    // gives src_config_yaml a correctness row, not just a unit test.
    QueryDef("src_config_yaml",
      (s, dir) => {
        val cfg = graft.dq.DqConfig.fromYaml(
          """table_name: customer
            |tests:
            |  completeness:
            |    - c_name
            |  format:
            |    c_mktsegment: not_empty
            |quality_thresholds:
            |  max_failure_rate: 5.0
            |""".stripMargin)
        graft.dq.DqEngine.run(s, Tables.load(s, dir, cfg.tableName), cfg, "2024-01-01")
          .toDF()
          .select("test_date", "test_name", "test_category", "status",
            "failed_records", "total_records", "failure_rate")
          .orderBy("test_name")
      },
      Some("""WITH agg AS (SELECT count(*) AS total,
          CAST(sum(CASE WHEN c_name IS NULL OR c_name = '' THEN 1 ELSE 0 END) AS BIGINT) AS f_name,
          CAST(sum(CASE WHEN c_mktsegment IS NULL OR c_mktsegment = '' THEN 1 ELSE 0 END) AS BIGINT) AS f_mkt
        FROM customer),
      r AS (
        SELECT 'completeness_c_name' AS test_name, 'completeness' AS cat, f_name AS failed, total FROM agg
        UNION ALL SELECT 'format_c_mktsegment_not_empty', 'format', f_mkt, total FROM agg)
      SELECT '2024-01-01' AS test_date, test_name, cat AS test_category,
        CASE WHEN failed = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
        failed AS failed_records, total AS total_records,
        CASE WHEN total = 0 THEN 0.0 ELSE CAST(failed AS DOUBLE) / total END AS failure_rate
      FROM r ORDER BY test_name""")),

    // CTAS table sink: full-rebuild overwrite semantics (dbt
    // materialized='table', dbt_project.yml:38-42) — write, overwrite
    // with a different slice, read back: only the second write survives.
    QueryDef("sink_table_roundtrip",
      (s, dir) => {
        val out = QueryScratch.dir("wh").resolve("region_ctas").toString
        val region = Tables.load(s, dir, "region")
        region.filter(col("r_regionkey") < 2).write.mode("overwrite").parquet(out)
        region.filter(col("r_regionkey") >= 2).write.mode("overwrite").parquet(out)
        s.read.parquet(out).select("r_regionkey", "r_name").orderBy("r_regionkey")
      },
      Some("SELECT r_regionkey, r_name FROM region WHERE r_regionkey >= 2 ORDER BY r_regionkey")),

    // Profiler → APPEND monitoring sink → read back (two appended runs
    // must both be present — proves mode("append"), not overwrite).
    QueryDef("sink_append_roundtrip",
      (s, dir) => {
        val out = QueryScratch.dir("monitor").resolve("profile_stats").toString
        val prof = Profiler.profileTables(s,
          Seq("region" -> Tables.load(s, dir, "region")),
          runId = "run_a", environment = "test")
        Sinks.appendParquet(prof, out)
        Sinks.appendParquet(prof.withColumn("run_id", lit("run_b")), out)
        val back = s.read.parquet(out)
        Sinks.console(back.limit(0)) // console sink slot (empty frame: header only)
        back.groupBy("table_name", "column_name")
          .agg(count(lit(1)).as("n_rows"), countDistinct(col("run_id")).as("n_runs"))
          .orderBy("column_name")
      },
      Some("""SELECT * FROM (VALUES
        ('region', 'r_name', CAST(2 AS BIGINT), CAST(2 AS BIGINT)),
        ('region', 'r_regionkey', CAST(2 AS BIGINT), CAST(2 AS BIGINT)))
        t(table_name, column_name, n_rows, n_runs)
        ORDER BY column_name""")),

    // Bucketed co-located join: both sides written bucketBy(8, key) with
    // one file per bucket (repartition first), then sort-merge joined —
    // the bucket layout replaces both shuffle exchanges, the pattern
    // that amortizes one shuffle across every future join of a 100 TB
    // fact table. PlanAuditSpec asserts the exchange-free plan.
    QueryDef("join_bucketed_colocated",
      (s, dir) => {
        val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
        val loc = QueryScratch.dir("bucketed")
        Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
          .repartition(8, col("o_custkey"))
          .write.mode("overwrite").option("path", loc.resolve("orders").toString)
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable(s"orders_bkt_$tag")
        Tables.load(s, dir, "customer").select("c_custkey", "c_name")
          .repartition(8, col("c_custkey"))
          .write.mode("overwrite").option("path", loc.resolve("customer").toString)
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable(s"customer_bkt_$tag")
        s.table(s"orders_bkt_$tag").hint("merge")
          .join(s.table(s"customer_bkt_$tag"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(count(lit(1)).as("n_orders"),
            graft.queries.Exact.dsum(col("o_totalprice")).as("revenue"))
          .filter(col("c_custkey") <= 100)
          .orderBy(col("c_custkey"))
      },
      Some(s"""SELECT c_custkey, c_name, count(*) AS n_orders,
          ${graft.queries.Exact.sqlDsum("o_totalprice")} AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_custkey <= 100
        GROUP BY c_custkey, c_name ORDER BY c_custkey""")),

    // Hive-style partitioned sink + partition-pruned read-back: the
    // filter on the partition column must prune directories, not rows
    // (PlanAuditSpec asserts PartitionFilters on the scan).
    QueryDef("sink_partitioned_pruning",
      (s, dir) => {
        val out = QueryScratch.dir("part").resolve("events_by_type").toString
        Tables.load(s, dir, "events").select(col("event_id"), col("value"), col("event_type"))
          .write.partitionBy("event_type").mode("overwrite").parquet(out)
        s.read.parquet(out).filter(col("event_type") === "click")
          .agg(count(lit(1)).as("n"),
            graft.queries.Exact.dsum(col("value")).as("value_sum"))
      },
      Some(s"""SELECT count(*) AS n, ${graft.queries.Exact.sqlDsum("value")} AS value_sum
        FROM events WHERE event_type = 'click'""")),

    // Dynamic partition pruning — the OTHER half of partition pruning:
    // the qualifying partitions are knowable only THROUGH the join (the
    // dim filter is on a non-partition attribute), so Catalyst injects a
    // runtime `dynamicpruning` subquery into the fact scan's
    // PartitionFilters (PlanAuditSpec asserts it) and the 100 TB fact
    // table reads one partition directory instead of all. Results are
    // byte-identical with/without DPP, so the oracle is the plain join.
    QueryDef("join_dpp_partitioned",
      (s, dir) => {
        val out = QueryScratch.dir("dpp").resolve("li_by_flag").toString
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_returnflag"))
          .write.partitionBy("l_returnflag").mode("overwrite").parquet(out)
        val fact = s.read.parquet(out)
        // the dim must be a SOURCE with an unfolded selective filter: a
        // LocalRelation dim would constant-fold the filter away and the
        // PartitionPruning rule (which looks for a filter on the other
        // side) would never fire — so the dim round-trips through parquet
        val dimPath = QueryScratch.dir("dpp").resolve("flag_dim").toString
        s.createDataFrame(Seq(("R", "returned"), ("A", "accepted"), ("N", "none")))
          .toDF("flag", "label")
          .write.mode("overwrite").parquet(dimPath)
        val dim = s.read.parquet(dimPath).filter(col("label") === "returned")
        fact.join(dim, col("l_returnflag") === col("flag"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            graft.queries.Exact.dsum(col("l_extendedprice")).as("revenue"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""WITH dim AS (SELECT * FROM (VALUES ('R', 'returned'), ('A', 'accepted'),
            ('N', 'none')) AS t(flag, label) WHERE label = 'returned')
        SELECT l_returnflag, count(*) AS n,
          ${graft.queries.Exact.sqlDsum("l_extendedprice")} AS revenue
        FROM lineitem JOIN dim ON l_returnflag = dim.flag
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Schema evolution: two parquet slices with different column sets,
    // read back with mergeSchema — missing columns surface as nulls
    // instead of breaking the scan (how a lakehouse table widens at
    // 100 TB without rewriting history).
    QueryDef("src_merge_schema",
      (s, dir) => {
        val out = QueryScratch.dir("evo").resolve("nation_evo").toString
        val nation = Tables.load(s, dir, "nation")
        nation.select(col("n_nationkey"), col("n_name"))
          .write.parquet(s"$out/slice=a")
        nation.select(col("n_nationkey"), col("n_regionkey"))
          .write.parquet(s"$out/slice=b")
        s.read.option("mergeSchema", "true").parquet(out)
          .agg(count(lit(1)).as("n_rows"),
            count(col("n_name")).as("n_with_name"),
            count(col("n_regionkey")).as("n_with_region"))
      },
      Some("""SELECT CAST(2 * count(*) AS BIGINT) AS n_rows,
          CAST(count(*) AS BIGINT) AS n_with_name,
          CAST(count(*) AS BIGINT) AS n_with_region
        FROM nation""")),

    // Small-file compaction: a fragmented write (64 files) compacts to
    // far fewer, rows and values intact — the silent scan tax
    // incremental writers accumulate at warehouse scale.
    // ── Zone-map pruning effectiveness report (the data-skipping audit
    //    behind `maintenance_zorder`: BEFORE re-clustering, measure how
    //    much the current day-partitioned layout can already skip):
    //    per-day min/max envelopes of value cents and user_id (exactly
    //    the parquet footer stats a scan consults), then for three
    //    representative predicate shapes the share of partitions whose
    //    envelope proves them empty. O(days) stats table, three tiny
    //    conditional aggregates unioned — no second scan of the data. ───
    QueryDef("maintenance_zonemap_stats",
      (s, dir) => {
        import s.implicits._
        val zm = Tables.load(s, dir, "events")
          .select(expr("CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)")
            .as("d"),
            expr("CAST(round(value * 100) AS BIGINT)").as("v"), $"user_id")
          .groupBy($"d")
          .agg(min($"v").as("min_v"), max($"v").as("max_v"),
            min($"user_id").as("min_u"), max($"user_id").as("max_u"))
        def report(name: String, skippable: Column): DataFrame =
          zm.agg(count(lit(1)).as("n_partitions"),
            sum(when(skippable, 1L).otherwise(0L)).as("n_skippable"))
            .select(lit(name).as("predicate"), $"n_partitions", $"n_skippable",
              ($"n_skippable".cast("double") / $"n_partitions".cast("double"))
                .as("skip_ratio"))
        report("v_gt_90000", $"max_v" <= 90000L)
          .unionByName(report("u_eq_42", $"min_u" > 42L || $"max_u" < 42L))
          .unionByName(report("v_between_1_100", $"max_v" < 1L || $"min_v" > 100L))
          .orderBy($"predicate")
      },
      Some("""WITH zm AS (SELECT
            CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
            min(CAST(round(value * 100) AS BIGINT)) AS min_v,
            max(CAST(round(value * 100) AS BIGINT)) AS max_v,
            min(user_id) AS min_u, max(user_id) AS max_u
          FROM events GROUP BY 1)
        SELECT * FROM (
          SELECT 'v_gt_90000' AS predicate,
            CAST(count(*) AS BIGINT) AS n_partitions,
            CAST(sum(CASE WHEN max_v <= 90000 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_skippable,
            CAST(sum(CASE WHEN max_v <= 90000 THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS skip_ratio
          FROM zm
          UNION ALL SELECT 'u_eq_42',
            CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN min_u > 42 OR max_u < 42 THEN 1 ELSE 0 END)
              AS BIGINT),
            CAST(sum(CASE WHEN min_u > 42 OR max_u < 42 THEN 1 ELSE 0 END)
              AS DOUBLE) / CAST(count(*) AS DOUBLE)
          FROM zm
          UNION ALL SELECT 'v_between_1_100',
            CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN max_v < 1 OR min_v > 100 THEN 1 ELSE 0 END)
              AS BIGINT),
            CAST(sum(CASE WHEN max_v < 1 OR min_v > 100 THEN 1 ELSE 0 END)
              AS DOUBLE) / CAST(count(*) AS DOUBLE)
          FROM zm)
        ORDER BY predicate""")),

    QueryDef("maintenance_compact",
      (s, dir) => {
        val out = QueryScratch.dir("compact").resolve("events_frag").toString
        Tables.load(s, dir, "events").select("event_id", "event_type")
          .repartition(64).write.parquet(out)
        val stats = graft.sources.Maintenance.compactParquet(s, out, 512L * 1024 * 1024)
        val back = s.read.parquet(out)
        back.agg(count(lit(1)).as("n_rows"),
            sum(col("event_id")).as("id_sum"))
          .withColumn("compacted", lit(stats.filesAfter < stats.filesBefore))
      },
      Some("""SELECT count(*) AS n_rows, CAST(sum(event_id) AS BIGINT) AS id_sum,
          true AS compacted
        FROM events"""))
    ,

    // ── orphan-file vacuum (Delta VACUUM / Iceberg remove_orphan_files
    //    — the maintenance action every manifest-tracked table needs):
    //    commit a 4-file table and record its manifest, then strand a
    //    2-file UNCOMMITTED append (the aborted-writer scenario). A
    //    path-listing reader now double-counts: rows_before proves the
    //    corruption the orphans cause. Vacuum diffs listing vs manifest
    //    and deletes only unreferenced files — referenced files are
    //    never touched (the dangerous direction; vacuumOrphans checks
    //    it first and MaintenanceSpec pins the refusal paths). After:
    //    listing ≡ manifest, and the read-back row count + id checksum
    //    equal the committed content exactly. Driver-side file ops are
    //    bounded by FILE COUNT (a metadata operation, like
    //    maintenance_footer_stats) — no data moves at all. ──────────────
    QueryDef("maintenance_vacuum_orphans",
      (s, dir) => {
        import s.implicits._
        val out = QueryScratch.dir("vacuum")
          .resolve("events_tbl").toString
        val committed = Tables.load(s, dir, "events")
          .select($"event_id", $"user_id")
        committed.repartition(4).write.parquet(out)
        val manifest = graft.sources.Maintenance.listDataFiles(out)
        // the aborted writer: files land, the commit never does
        committed.filter($"event_id" % 10L === 0L).repartition(2)
          .write.mode("append").parquet(out)
        val before = s.read.parquet(out)
          .agg(count(lit(1)).as("rows_before")).head().getLong(0)
        val stats = graft.sources.Maintenance.vacuumOrphans(out, manifest)
        s.read.parquet(out)
          .agg(count(lit(1)).as("rows_after"),
            sum($"event_id").as("id_sum_after"))
          .select(lit(stats.manifestFiles).as("n_manifest"),
            lit(stats.listedFiles).as("n_listed"),
            lit(stats.orphansDeleted).as("n_orphans_deleted"),
            lit(before).as("rows_before"),
            $"rows_after", $"id_sum_after")
      },
      Some("""SELECT 4 AS n_manifest, 6 AS n_listed, 2 AS n_orphans_deleted,
          (SELECT count(*) FROM events)
            + (SELECT count(*) FROM events WHERE event_id % 10 = 0)
            AS rows_before,
          count(*) AS rows_after, CAST(sum(event_id) AS BIGINT) AS id_sum_after
        FROM events""")),

    // ── manifest time-travel read (Delta VERSION AS OF / Iceberg
    //    snapshot read — the lakehouse READ half of the commit protocol
    //    maintenance_vacuum_orphans enforces the write half of): commit
    //    v1 = the even-event_id half (2 files + a sum(event_id) content
    //    checksum into the append-only _graft_log), append the odd half,
    //    commit v2 (4 files). A path-listing reader sees only the latest
    //    state; readAsOf(v1) scans exactly v1's manifest files, so its
    //    recomputed row count and checksum must reproduce the RECORDED
    //    v1 commit — proving appends never rewrote v1's files and the
    //    manifest is sufficient to reconstruct any version. Per-version
    //    commit checksums are bounded driver aggregates (one scalar per
    //    commit — the stats a real writer computes at commit time).
    //    Driver-side file ops are bounded by file count. ────────────────
    QueryDef("maintenance_time_travel",
      (s, dir) => {
        import s.implicits._
        val out = QueryScratch.dir("ttravel").resolve("events_tbl").toString
        val ev = Tables.load(s, dir, "events").select($"event_id", $"user_id")
        val v1 = ev.filter($"event_id" % 2L === 0L)
        v1.repartition(2).write.parquet(out)
        graft.sources.Maintenance.commitVersion(out,
          v1.agg(sum($"event_id")).head().getLong(0))
        ev.filter($"event_id" % 2L =!= 0L).repartition(2)
          .write.mode("append").parquet(out)
        graft.sources.Maintenance.commitVersion(out,
          ev.agg(sum($"event_id")).head().getLong(0))
        val perVersion = graft.sources.Maintenance.versions(out).map { v =>
          val ci = graft.sources.Maintenance.readCommit(out, v)
          graft.sources.Maintenance.readAsOf(s, out, v)
            .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"))
            .select(lit(v).as("version"),
              lit(ci.files.size).as("n_files"),
              $"n_rows", $"id_sum",
              ($"id_sum" === lit(ci.checksum)).as("checksum_equal"))
        }
        perVersion.reduce(_.unionAll(_)).orderBy($"version")
      },
      Some("""SELECT 1 AS version, 2 AS n_files, count(*) AS n_rows,
          CAST(sum(event_id) AS BIGINT) AS id_sum, true AS checksum_equal
        FROM events WHERE event_id % 2 = 0
        UNION ALL
        SELECT 2, 4, count(*), CAST(sum(event_id) AS BIGINT), true
        FROM events
        ORDER BY version""")),

    // ── Versioned MANIFEST DIFF (r14 verdict item 7 — what changed
    //    between two REAL committed versions, not a synthetic v2):
    //    commit v1 = the even-event_id half as (key, cents, seq=1,
    //    deleted=false); append a merge-on-read delta batch — seq=2
    //    corrections doubling cents for event_id % 10 = 0, seq=2
    //    tombstones for event_id % 20 = 2 (the Hudi/Iceberg MOR shape:
    //    appends never rewrite v1's files), and the odd half as new
    //    rows — then commit v2. Each version reconstructs EXCLUSIVELY
    //    through readAsOf (manifest-listed files only) + latest-seq-
    //    wins reconcile (row_number per key, tombstones drop), and the
    //    two states feed snapshot_table_diff's full-outer classifier.
    //    The oracle replays the delta rules straight off events —
    //    added = odds, removed = tombstoned evens, changed = corrected
    //    evens with cents ≠ 0 (0·2 = 0 stays unchanged, both engines
    //    agree by the same rule). MaintenanceSpec pins the counts
    //    against the independently computed commit delta. ──────────────
    QueryDef("maintenance_version_diff",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val out = QueryScratch.dir("vdiff").resolve("events_tbl").toString
        val ev = Tables.load(s, dir, "events")
          .select($"event_id",
            coalesce(expr("CAST(round(value * 100) AS BIGINT)"), lit(-1L))
              .as("cents"))
        val v1 = ev.filter($"event_id" % 2L === 0L)
          .select($"event_id", $"cents", lit(1L).as("seq"),
            lit(false).as("deleted"))
        v1.repartition(2).write.parquet(out)
        graft.sources.Maintenance.commitVersion(out,
          v1.agg(sum($"event_id")).head().getLong(0))
        val upd = ev.filter($"event_id" % 10L === 0L)
          .select($"event_id", ($"cents" * 2L).as("cents"),
            lit(2L).as("seq"), lit(false).as("deleted"))
        val del = ev.filter($"event_id" % 20L === 2L)
          .select($"event_id", lit(-1L).as("cents"),
            lit(2L).as("seq"), lit(true).as("deleted"))
        val add = ev.filter($"event_id" % 2L =!= 0L)
          .select($"event_id", $"cents", lit(2L).as("seq"),
            lit(false).as("deleted"))
        upd.unionByName(del).unionByName(add).repartition(2)
          .write.mode("append").parquet(out)
        graft.sources.Maintenance.commitVersion(out,
          s.read.parquet(out).agg(sum($"event_id")).head().getLong(0))
        def reconcile(df: DataFrame): DataFrame = {
          val w = Window.partitionBy($"event_id").orderBy($"seq".desc)
          df.withColumn("rn", row_number().over(w))
            .filter($"rn" === 1 && !$"deleted")
            .select($"event_id".as("key"), $"cents")
        }
        val s1 = reconcile(graft.sources.Maintenance.readAsOf(s, out, 1))
        val s2 = reconcile(graft.sources.Maintenance.readAsOf(s, out, 2))
        s1.select($"key", $"cents".as("c1"))
          .join(s2.select($"key", $"cents".as("c2")), Seq("key"), "full_outer")
          .select($"key",
            when($"c1".isNull, lit("added"))
              .when($"c2".isNull, lit("removed"))
              .when($"c1" === $"c2", lit("unchanged"))
              .otherwise(lit("changed")).as("change_type"))
          .groupBy($"change_type")
          .agg(count(lit(1)).as("n"), min($"key").as("min_key"),
            max($"key").as("max_key"))
          .orderBy($"change_type")
      },
      Some("""WITH ev AS (SELECT event_id,
            coalesce(CAST(round(value * 100) AS BIGINT), -1) AS cents
          FROM events),
        v1 AS (SELECT event_id AS key, cents FROM ev WHERE event_id % 2 = 0),
        v2 AS (SELECT event_id AS key,
            CASE WHEN event_id % 10 = 0 THEN cents * 2 ELSE cents END AS cents
          FROM ev WHERE event_id % 2 = 0 AND event_id % 20 <> 2
          UNION ALL
          SELECT event_id, cents FROM ev WHERE event_id % 2 = 1),
        d AS (SELECT coalesce(v1.key, v2.key) AS key,
            CASE WHEN v1.key IS NULL THEN 'added'
              WHEN v2.key IS NULL THEN 'removed'
              WHEN v1.cents = v2.cents THEN 'unchanged'
              ELSE 'changed' END AS change_type
          FROM v1 FULL OUTER JOIN v2 ON v1.key = v2.key)
        SELECT change_type, CAST(count(*) AS BIGINT) AS n,
          CAST(min(key) AS BIGINT) AS min_key,
          CAST(max(key) AS BIGINT) AS max_key
        FROM d GROUP BY change_type ORDER BY change_type""")),

    // ── Version EXPIRY (retention GC — Iceberg expire_snapshots /
    //    Delta VACUUM retention; the lifecycle piece between
    //    time_travel, version_diff and vacuum_orphans): v1 = even half
    //    (2 files, append commit), v2 = + odd half (4 files, append
    //    commit), v3 = a COMPACTION REPLACE commit — the table rewritten
    //    as one file and committed via commitFiles, so v3 references
    //    only the rewritten file while v1/v2 keep the originals readable.
    //    expireVersions(keepLast=1) then ages out v1+v2; exactly the 4
    //    superseded originals become unreferenced and are deleted (an
    //    append-only history would free NOTHING — the query's counts
    //    prove the replace-commit semantics, not just file deletion).
    //    Post-expire the latest version must still reproduce its
    //    recorded commit checksum AND the directory listing must equal
    //    its manifest (a path-listing reader and the versioned reader
    //    agree — the vacuum invariant, now established by GC). ──────────
    QueryDef("maintenance_version_expire",
      (s, dir) => {
        import s.implicits._
        val out = QueryScratch.dir("vexpire").resolve("events_tbl").toString
        val ev = Tables.load(s, dir, "events").select($"event_id", $"user_id")
        val v1 = ev.filter($"event_id" % 2L === 0L)
        v1.repartition(2).write.parquet(out)
        graft.sources.Maintenance.commitVersion(out,
          v1.agg(sum($"event_id")).head().getLong(0))
        ev.filter($"event_id" % 2L =!= 0L).repartition(2)
          .write.mode("append").parquet(out)
        val fullSum = ev.agg(sum($"event_id")).head().getLong(0)
        graft.sources.Maintenance.commitVersion(out, fullSum)
        // compaction: rewrite the whole table as ONE new file in place,
        // then REPLACE-commit only the rewritten file
        val before = graft.sources.Maintenance.listDataFiles(out).toSet
        s.read.parquet(out).repartition(1)
          .write.mode("append").parquet(out)
        val rewritten = graft.sources.Maintenance.listDataFiles(out)
          .filterNot(before)
        graft.sources.Maintenance.commitFiles(out, rewritten, fullSum)
        val st = graft.sources.Maintenance.expireVersions(out, keepLast = 1)
        val latest = graft.sources.Maintenance.versions(out).max
        val ci = graft.sources.Maintenance.readCommit(out, latest)
        val listingClean =
          graft.sources.Maintenance.listDataFiles(out).toSet == ci.files.toSet
        graft.sources.Maintenance.readAsOf(s, out, latest)
          .agg(count(lit(1)).as("rows_after"), sum($"event_id").as("id_sum_after"))
          .select(lit(st.versionsBefore).as("n_versions_before"),
            lit(st.expired.size).as("n_expired"),
            lit(st.deletableFiles).as("n_deletable"),
            lit(st.deletedFiles).as("n_deleted"),
            lit(listingClean).as("listing_clean"),
            $"rows_after", $"id_sum_after",
            ($"id_sum_after" === lit(ci.checksum)).as("checksum_equal"))
      },
      Some("""SELECT 3 AS n_versions_before, 2 AS n_expired,
          4 AS n_deletable, 4 AS n_deleted, true AS listing_clean,
          count(*) AS rows_after, CAST(sum(event_id) AS BIGINT) AS id_sum_after,
          true AS checksum_equal
        FROM events""")),

    // Z-order (Morton) layout key: interleave (l_partkey, l_suppkey) low
    // bits into one clustering key — range-partitioning and sorting files
    // by it bounds every file's (partkey, suppkey) min/max rectangle, so
    // footer stats prune on EITHER dimension (LayoutSpec asserts the
    // partition-disjointness that makes this work). The oracle replays
    // the mask-shift chain with the same integer arithmetic; output is
    // per-z-bucket row counts + the exact z checksum.
    QueryDef("maintenance_zorder",
      (s, dir) => {
        val z = graft.functions.Layout.morton16(col("l_partkey"), col("l_suppkey"))
        Tables.load(s, dir, "lineitem")
          .select(z.as("z"))
          .groupBy(shiftright(col("z"), 12).as("z_bucket"))
          .agg(count(lit(1)).as("n"), sum(col("z")).as("z_sum"))
          .orderBy("z_bucket")
      },
      Some("""WITH base AS (SELECT l_partkey & 65535 AS x, l_suppkey & 65535 AS y
          FROM lineitem),
        s1 AS (SELECT ((x | (x << 8)) & 16711935) AS x, ((y | (y << 8)) & 16711935) AS y FROM base),
        s2 AS (SELECT ((x | (x << 4)) & 252645135) AS x, ((y | (y << 4)) & 252645135) AS y FROM s1),
        s3 AS (SELECT ((x | (x << 2)) & 858993459) AS x, ((y | (y << 2)) & 858993459) AS y FROM s2),
        s4 AS (SELECT ((x | (x << 1)) & 1431655765) AS x, ((y | (y << 1)) & 1431655765) AS y FROM s3),
        zt AS (SELECT (x | (y << 1)) AS z FROM s4)
        SELECT z >> 12 AS z_bucket, count(*) AS n, CAST(sum(z) AS BIGINT) AS z_sum
        FROM zt GROUP BY 1 ORDER BY z_bucket""")),

    // ── Hilbert-curve layout vs Z-order, HEAD TO HEAD (the clustering
    //    upgrade Iceberg/Delta reach for past Morton): index the same
    //    8-bit (l_partkey, l_suppkey) keys with both curves, cut each
    //    into width-257 index ranges (= files under range partitioning —
    //    DELIBERATELY unaligned with the bit structure, because aligned
    //    power-of-4 cuts make both curves' ranges the same 16×16 tiles
    //    and real range-partition splits land wherever the data does),
    //    and measure what a scan planner actually prunes on — each
    //    file's (x, y) bounding-box area from its min/max footer stats.
    //    Hilbert's unit-step property (consecutive d are (x,y) neighbors;
    //    Morton jumps diagonals at power-of-two seams) shows up directly
    //    as smaller total/max box area = more skippable files for any
    //    2-D predicate (full-grid: Σ area 96 k vs 182 k, max 512 vs
    //    4352 — LayoutSpec pins the win). Output: per-curve file count,
    //    Σ area, max area + the full-grid checksum that pins both index
    //    chains exactly. The 8-step rotate chain is pure integer CASE
    //    arithmetic — the oracle replays it CTE for CTE
    //    (functions/Layout.scala). ───────────────────────────────────────
    QueryDef("maintenance_hilbert_order",
      (s, dir) => {
        import s.implicits._
        val li = Tables.load(s, dir, "lineitem")
          .select(($"l_partkey".cast("long") % 256L).as("x"),
            ($"l_suppkey".cast("long") % 256L).as("y"))
        val h = graft.functions.Layout.hilbert8(li, "x", "y", "hd")
          .select(lit("hilbert").as("curve"), $"x", $"y",
            expr("hd DIV 257").as("bucket"), $"hd".as("d"))
        val z = li
          .select($"x", $"y",
            graft.functions.Layout.morton16($"x", $"y").as("zd"))
          .select(lit("morton").as("curve"), $"x", $"y",
            expr("zd DIV 257").as("bucket"), $"zd".as("d"))
        h.union(z)
          .groupBy($"curve", $"bucket")
          .agg(count(lit(1)).as("n"),
            min($"x").as("x0"), max($"x").as("x1"),
            min($"y").as("y0"), max($"y").as("y1"),
            sum($"d").as("d_sum"))
          .groupBy($"curve")
          .agg(count(lit(1)).as("n_files"),
            sum(($"x1" - $"x0" + 1L) * ($"y1" - $"y0" + 1L)).as("sum_box_area"),
            max(($"x1" - $"x0" + 1L) * ($"y1" - $"y0" + 1L)).as("max_box_area"),
            sum($"d_sum").as("d_checksum"))
          .orderBy($"curve")
      },
      Some {
        val seed = """SELECT l_partkey % 256 AS x8, l_suppkey % 256 AS y8,
          |  0 AS d8, l_partkey % 256 AS x, l_suppkey % 256 AS y
          |  FROM lineitem""".stripMargin
        val hilbertChain =
          graft.functions.Layout.hilbert8OracleCtes(seed, "x, y")
        s"""$hilbertChain,
        |hil AS (SELECT 'hilbert' AS curve, x, y, d0 // 257 AS bucket,
        |    CAST(d0 AS BIGINT) AS d FROM h0),
        |mb AS (SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem),
        |m1 AS (SELECT x, y, ((x | (x << 8)) & 16711935) AS sx,
        |    ((y | (y << 8)) & 16711935) AS sy FROM mb),
        |m2 AS (SELECT x, y, ((sx | (sx << 4)) & 252645135) AS sx,
        |    ((sy | (sy << 4)) & 252645135) AS sy FROM m1),
        |m3 AS (SELECT x, y, ((sx | (sx << 2)) & 858993459) AS sx,
        |    ((sy | (sy << 2)) & 858993459) AS sy FROM m2),
        |m4 AS (SELECT x, y, ((sx | (sx << 1)) & 1431655765) AS sx,
        |    ((sy | (sy << 1)) & 1431655765) AS sy FROM m3),
        |mor AS (SELECT 'morton' AS curve, x, y,
        |    (sx | (sy << 1)) // 257 AS bucket,
        |    CAST((sx | (sy << 1)) AS BIGINT) AS d FROM m4),
        |u AS (SELECT * FROM hil UNION ALL SELECT * FROM mor),
        |files AS (SELECT curve, bucket, count(*) AS n,
        |    min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1,
        |    CAST(sum(d) AS BIGINT) AS d_sum
        |  FROM u GROUP BY curve, bucket)
        |SELECT curve, CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum((x1 - x0 + 1) * (y1 - y0 + 1)) AS BIGINT) AS sum_box_area,
        |  CAST(max((x1 - x0 + 1) * (y1 - y0 + 1)) AS BIGINT) AS max_box_area,
        |  CAST(sum(d_sum) AS BIGINT) AS d_checksum
        |FROM files GROUP BY curve ORDER BY curve""".stripMargin
      }),

    // ── parquet footer introspection (the REAL min/max stats the
    //    zonemap/layout queries simulate: row-group footers are what a
    //    100 TB scan planner prunes on, and an engine must be able to
    //    read them WITHOUT scanning data): row-group stats come off
    //    `ParquetFileReader` footers on the driver — a pure metadata
    //    operation, bounded by file count, zero data IO — and the plan
    //    cross-checks them against one actual scan aggregate. The
    //    emitted row carries footer-derived totals; the oracle
    //    recomputes them from the data, so the hash match IS the
    //    footers-equal-data proof. Row-group granularity is asserted
    //    in MaintenanceSpec (the oracle cannot name the file path). ─────
    QueryDef("maintenance_footer_stats",
      (s, dir) => {
        import scala.jdk.CollectionConverters._
        import org.apache.hadoop.fs.Path
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        val conf = s.sparkContext.hadoopConfiguration
        val root = new Path(s"$dir/lineitem.parquet")
        val fs = root.getFileSystem(conf)
        val files =
          if (fs.getFileStatus(root).isDirectory)
            fs.listStatus(root).map(_.getPath)
              .filter(_.getName.endsWith(".parquet")).toSeq
          else Seq(root)
        val rgs = files.flatMap { f =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
          try r.getFooter.getBlocks.asScala.map { bg =>
            val c = bg.getColumns.asScala
              .find(_.getPath.toDotString == "l_orderkey").get
            val st = c.getStatistics
            (bg.getRowCount,
              st.genericGetMin.asInstanceOf[Number].longValue(),
              st.genericGetMax.asInstanceOf[Number].longValue())
          }.toSeq
          finally r.close()
        }
        import s.implicits._
        val footer = Seq((rgs.map(_._1).sum, rgs.map(_._2).min, rgs.map(_._3).max))
          .toDF("n_rows", "min_orderkey", "max_orderkey")
        val scan = Tables.load(s, dir, "lineitem")
          .agg(count(lit(1)).as("s_rows"),
            min($"l_orderkey").cast("long").as("s_min"),
            max($"l_orderkey").cast("long").as("s_max"))
        footer.crossJoin(broadcast(scan))
          .select($"n_rows", $"min_orderkey", $"max_orderkey",
            ($"n_rows" === $"s_rows" && $"min_orderkey" === $"s_min" &&
              $"max_orderkey" === $"s_max").as("footer_consistent"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(min(l_orderkey) AS BIGINT) AS min_orderkey,
          CAST(max(l_orderkey) AS BIGINT) AS max_orderkey,
          true AS footer_consistent
        FROM lineitem""")),

    // ── layout advisor: WOULD z-ordering pay off for this table and
    //    this predicate shape? Simulate both layouts at file
    //    granularity — under a LINEAR l_partkey sort a file is a
    //    partkey range (bucket = partkey DIV 16); under Z-ORDER a file
    //    is a morton-prefix cell (the maintenance_zorder key >> 12) —
    //    compute every file's (partkey, suppkey) min/max rectangle from
    //    one hash-agg each, and count files/rows a 2-D box predicate
    //    (p∈[100,200] ∧ s∈[10,20]) must scan. The linear layout prunes
    //    partkey perfectly but reads EVERY matching-partkey file
    //    regardless of suppkey; z-order bounds both dimensions. This is
    //    the decision table a real lakehouse OPTIMIZE advisor emits;
    //    everything is two aggregates over one scan each, no sort. ──────
    QueryDef("maintenance_layout_advisor",
      (s, dir) => {
        import s.implicits._
        val li = Tables.load(s, dir, "lineitem")
          .select($"l_partkey", $"l_suppkey")
        def report(layout: String, bucket: Column): DataFrame =
          li.groupBy(bucket.as("f"))
            .agg(count(lit(1)).as("n"),
              min($"l_partkey").as("min_p"), max($"l_partkey").as("max_p"),
              min($"l_suppkey").as("min_s"), max($"l_suppkey").as("max_s"))
            .agg(count(lit(1)).as("n_files"), sum($"n").as("n_rows"),
              sum(when($"min_p" <= 200L && $"max_p" >= 100L &&
                $"min_s" <= 20L && $"max_s" >= 10L, 1L).otherwise(0L))
                .as("files_scanned"),
              sum(when($"min_p" <= 200L && $"max_p" >= 100L &&
                $"min_s" <= 20L && $"max_s" >= 10L, $"n").otherwise(0L))
                .as("rows_scanned"))
            .select(lit(layout).as("layout"), $"n_files", $"files_scanned",
              $"rows_scanned",
              expr("(rows_scanned * 1000000) DIV n_rows").as("scan_ppm"))
        report("linear_partkey", expr("l_partkey DIV 16"))
          .unionByName(report("zorder_morton",
            shiftright(graft.functions.Layout.morton16($"l_partkey", $"l_suppkey"), 12)))
          .orderBy($"layout")
      },
      Some("""WITH base AS (SELECT l_partkey, l_suppkey,
            l_partkey & 65535 AS x, l_suppkey & 65535 AS y
          FROM lineitem),
        s1 AS (SELECT l_partkey, l_suppkey, ((x | (x << 8)) & 16711935) AS x,
            ((y | (y << 8)) & 16711935) AS y FROM base),
        s2 AS (SELECT l_partkey, l_suppkey, ((x | (x << 4)) & 252645135) AS x,
            ((y | (y << 4)) & 252645135) AS y FROM s1),
        s3 AS (SELECT l_partkey, l_suppkey, ((x | (x << 2)) & 858993459) AS x,
            ((y | (y << 2)) & 858993459) AS y FROM s2),
        s4 AS (SELECT l_partkey, l_suppkey, ((x | (x << 1)) & 1431655765) AS x,
            ((y | (y << 1)) & 1431655765) AS y FROM s3),
        keyed AS (SELECT l_partkey, l_suppkey,
            l_partkey // 16 AS lin_f, (x | (y << 1)) >> 12 AS z_f FROM s4),
        lin AS (SELECT lin_f AS f, CAST(count(*) AS BIGINT) AS n,
            min(l_partkey) AS min_p, max(l_partkey) AS max_p,
            min(l_suppkey) AS min_s, max(l_suppkey) AS max_s
          FROM keyed GROUP BY 1),
        zf AS (SELECT z_f AS f, CAST(count(*) AS BIGINT) AS n,
            min(l_partkey) AS min_p, max(l_partkey) AS max_p,
            min(l_suppkey) AS min_s, max(l_suppkey) AS max_s
          FROM keyed GROUP BY 1),
        rep AS (
          SELECT 'linear_partkey' AS layout,
            CAST(count(*) AS BIGINT) AS n_files,
            CAST(sum(CASE WHEN min_p <= 200 AND max_p >= 100
              AND min_s <= 20 AND max_s >= 10 THEN 1 ELSE 0 END) AS BIGINT)
              AS files_scanned,
            CAST(sum(CASE WHEN min_p <= 200 AND max_p >= 100
              AND min_s <= 20 AND max_s >= 10 THEN n ELSE 0 END) AS BIGINT)
              AS rows_scanned,
            (CAST(sum(CASE WHEN min_p <= 200 AND max_p >= 100
              AND min_s <= 20 AND max_s >= 10 THEN n ELSE 0 END) AS BIGINT)
              * 1000000) // CAST(sum(n) AS BIGINT) AS scan_ppm
          FROM lin
          UNION ALL
          SELECT 'zorder_morton',
            CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN min_p <= 200 AND max_p >= 100
              AND min_s <= 20 AND max_s >= 10 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(sum(CASE WHEN min_p <= 200 AND max_p >= 100
              AND min_s <= 20 AND max_s >= 10 THEN n ELSE 0 END) AS BIGINT),
            (CAST(sum(CASE WHEN min_p <= 200 AND max_p >= 100
              AND min_s <= 20 AND max_s >= 10 THEN n ELSE 0 END) AS BIGINT)
              * 1000000) // CAST(sum(n) AS BIGINT)
          FROM zf)
        SELECT * FROM rep ORDER BY layout""")),

    // Temp-view sink (SURVEY §2.1 sink_temp_view; reference
    // tests/dq_sql_notes.md:228 `createOrReplaceTempView("temp_table")`):
    // register the DataFrame, then answer the query through spark.sql
    // against the registered NAME — the round-trip the reference's
    // custom-SQL rules depend on. The emitted is_temp_view flag is read
    // back from the catalog, proving the registration is session-scoped
    // (temporary), not a persisted object.
    QueryDef("sink_temp_view",
      (s, dir) => {
        Tables.load(s, dir, "events").createOrReplaceTempView("graft_events_tmp")
        val isTemp = s.catalog.getTable("graft_events_tmp").isTemporary
        s.sql("""SELECT event_type, count(*) AS n,
                   CAST(max(user_id) AS BIGINT) AS max_user
                 FROM graft_events_tmp GROUP BY event_type""")
          .withColumn("is_temp_view", lit(isTemp))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n, CAST(max(user_id) AS BIGINT) AS max_user,
          true AS is_temp_view
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Console sink (SURVEY §2.1 sink_console; reference
    // tests/profiling_example.py:31 `show(truncate=False)`): capture the
    // rendered ASCII table off the real console stream and parse its
    // geometry back into a relation — data rows, columns, border rules.
    // region is 5 rows at every SF, so the oracle recomputes the row
    // count from the table while the column/border counts pin the
    // show(truncate=false) frame format itself.
    QueryDef("sink_console",
      (s, dir) => {
        import s.implicits._
        val region = Tables.load(s, dir, "region")
          .select("r_regionkey", "r_name").orderBy("r_regionkey")
        val buf = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
          Sinks.console(region)
        }
        // Anchor parsing to the rendered table's own +---+ border rules:
        // only lines between the FIRST and LAST border belong to the
        // table, so a concurrent stdout writer emitting a '|'-prefixed
        // log line outside the frame can't skew the geometry, and an
        // empty capture yields (0, 0, 0) instead of printed_rows = -1.
        val all = buf.toString("UTF-8").split("\n")
        val borderIdx = all.indices.filter(all(_).startsWith("+"))
        val table =
          if (borderIdx.isEmpty) Array.empty[String]
          else all.slice(borderIdx.head, borderIdx.last + 1)
        val borders = table.count(_.startsWith("+"))
        val pipeLines = table.count(_.startsWith("|"))
        val printedRows = math.max(0L, pipeLines - 1L) // minus header
        val header = table.find(_.startsWith("|")).getOrElse("|")
        val printedCols = header.count(_ == '|') - 1L
        Seq((printedRows, printedCols, borders.toLong))
          .toDF("printed_rows", "printed_cols", "border_lines")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS printed_rows,
          CAST(2 AS BIGINT) AS printed_cols, CAST(3 AS BIGINT) AS border_lines
        FROM region""")),

    // ── Dynamic partition overwrite (the lakehouse backfill primitive:
    //    rewrite ONE day of a partitioned table without touching the
    //    rest): write events day-partitioned, then overwrite day 19730's
    //    partition with a revised slice (even event_ids only) using the
    //    writer-level `partitionOverwriteMode=dynamic` option — a STATIC
    //    overwrite would truncate the whole table, the exact bug this
    //    mode exists to prevent; no session conf is mutated. Read-back
    //    day counts prove only the target partition changed. ────────────
    QueryDef("sink_dynamic_partition_overwrite",
      (s, dir) => {
        val out = QueryScratch.dir("dynpart")
          .resolve("events_by_day").toString
        val e = Tables.load(s, dir, "events")
          .selectExpr("event_id", "value",
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day")
        e.write.partitionBy("day").mode("overwrite").parquet(out)
        e.filter(col("day") === 19730L && col("event_id") % 2 === 0)
          .write.partitionBy("day").mode("overwrite")
          .option("partitionOverwriteMode", "dynamic").parquet(out)
        // partition-dir read-back infers day as INT; pin the contract
        s.read.parquet(out)
          .groupBy(col("day").cast("long").as("day"))
          .agg(count(lit(1)).as("n_rows"))
          .filter(col("day").isin(19723L, 19730L, 19745L))
          .orderBy(col("day"))
      },
      Some("""WITH e AS (SELECT event_id,
            CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
          FROM events)
        SELECT day, CAST(count(*) AS BIGINT) AS n_rows FROM e
        WHERE (day = 19730 AND event_id % 2 = 0)
           OR day IN (19723, 19745)
        GROUP BY day ORDER BY day""")),

    // ── Incremental read between two REAL manifest versions (the
    //    lakehouse CDC-style consumption pattern Iceberg calls an
    //    incremental scan: a downstream job that already processed
    //    version k reads ONLY the files version k+1 added — never a
    //    full-table diff, never a re-scan): v1 commits the even half
    //    (2 files), v2 appends the odd half (2 more); the incremental
    //    file set is manifest(v2) − manifest(v1) resolved from the two
    //    committed manifests (sources/Maintenance.readCommit), and the
    //    query reads exactly those files. The audit proves the scan is
    //    both COMPLETE (odd-row count + id-sum match the table delta)
    //    and MINIMAL (2 of 4 files touched, all rows odd). Scale: the
    //    incremental read is O(new data) no matter the table size —
    //    that is the contract this query pins. ───────────────────────
    QueryDef("maintenance_incremental_read",
      (s, dir) => {
        import s.implicits._
        val out = QueryScratch.dir("vincr").resolve("events_tbl").toString
        val ev = Tables.load(s, dir, "events").select($"event_id", $"user_id")
        val v1d = ev.filter($"event_id" % 2L === 0L)
        v1d.repartition(2).write.parquet(out)
        graft.sources.Maintenance.commitVersion(out,
          v1d.agg(sum($"event_id")).head().getLong(0))
        ev.filter($"event_id" % 2L =!= 0L).repartition(2)
          .write.mode("append").parquet(out)
        graft.sources.Maintenance.commitVersion(out,
          ev.agg(sum($"event_id")).head().getLong(0))
        val c1 = graft.sources.Maintenance.readCommit(out, 1)
        val c2 = graft.sources.Maintenance.readCommit(out, 2)
        val newFiles = c2.files.filterNot(c1.files.toSet)
        val inc = s.read.parquet(newFiles.map(f => s"$out/$f"): _*)
        inc.agg(count(lit(1)).as("rows_incremental"),
            sum($"event_id").as("id_sum_incremental"),
            sum(pmod($"event_id", lit(2L))).as("n_odd"))
          .select(lit(c1.files.size).as("n_files_v1"),
            lit(newFiles.size).as("n_files_new"),
            $"rows_incremental", $"id_sum_incremental",
            ($"n_odd" === $"rows_incremental").as("all_odd"))
      },
      Some("""SELECT 2 AS n_files_v1, 2 AS n_files_new,
          count(*) AS rows_incremental,
          CAST(sum(event_id) AS BIGINT) AS id_sum_incremental,
          true AS all_odd
        FROM events WHERE event_id % 2 = 1"""))
  )
}
