package graft.queries

import java.nio.file.Files

import graft.Tables
import graft.profiling.Profiler
import graft.sources.{Sinks, Sources}
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

    QueryDef("src_seed_csv",
      (s, _) => {
        val dir = Files.createTempDirectory("graft_seed")
        val f = dir.resolve("currency_rates.csv")
        Files.writeString(f, seedContent)
        Sources.loadSeed(s, f.toString, "currency_rates").orderBy("currency_code")
      },
      Some("""SELECT * FROM (VALUES
        ('CLP', CAST(890.25 AS DOUBLE)), ('COP', CAST(3900.5 AS DOUBLE)),
        ('EUR', CAST(0.92 AS DOUBLE)), ('PEN', CAST(3.7 AS DOUBLE)),
        ('USD', CAST(1.0 AS DOUBLE))) t(currency_code, standard_rate)
        ORDER BY currency_code""")),

    // Profiler → APPEND monitoring sink → read back (two appended runs
    // must both be present — proves mode("append"), not overwrite).
    QueryDef("sink_append_roundtrip",
      (s, dir) => {
        val out = Files.createTempDirectory("graft_monitor").resolve("profile_stats").toString
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
        ORDER BY column_name"""))
  )
}
