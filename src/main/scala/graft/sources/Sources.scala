package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable scan layer (SURVEY.md §2.1): the reference loads whole
  * tables from a warehouse by name
  * (`spark.read.format("bigquery").load(name)`, dq_sql_notes.md:74) —
  * this trait keeps that format pluggable, so a `bigquery` (or iceberg,
  * jdbc, …) source drops in without touching the engine: implement
  * [[Source.load]] and call [[Source.register]]; every call site that
  * resolves through [[Source.apply]] (notably [[graft.Tables.load]] and
  * the format round-trip queries) picks it up by name.
  */
trait Source {
  /** Load a table by reference (path or name, format-defined). */
  def load(spark: SparkSession, ref: String): DataFrame
}

object Source {
  private val registry =
    scala.collection.concurrent.TrieMap[String, Source](
      "parquet" -> ParquetSource,
      "csv" -> CsvSource,
      "orc" -> OrcSource,
      "json" -> JsonSource)

  // Bumped on every register() so caches keyed on resolved sources (e.g.
  // graft.Tables' memoized plans) can include it in their key: a
  // re-registration mid-session then MISSES the stale entry instead of
  // silently serving a plan built against the previous binding.
  private val gen = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Monotone registry version — changes iff a register() happened. */
  def generation: Long = gen.get()

  /** Plug a new format in (e.g. `Source.register("bigquery", BqSource)`);
    * replaces any previous binding for the name.
    */
  def register(format: String, source: Source): Unit = {
    registry.put(format, source)
    gen.incrementAndGet()
  }

  def formats: Set[String] = registry.keySet.toSet

  def apply(format: String): Source =
    registry.getOrElse(format,
      throw new IllegalArgumentException(
        s"unknown source format '$format' — registered: " +
          registry.keys.toSeq.sorted.mkString(", ") +
          "; add one with Source.register(name, source)"))
}

/** Parquet-directory source — the testdata stand-in for the warehouse. */
object ParquetSource extends Source {
  def load(spark: SparkSession, ref: String): DataFrame = spark.read.parquet(ref)
}

/** Header+inferSchema CSV (dbt seeds). */
object CsvSource extends Source {
  def load(spark: SparkSession, ref: String): DataFrame = Sources.seedCsv(spark, ref)
}

/** ORC directory (columnar interchange — `src_orc_roundtrip`). */
object OrcSource extends Source {
  def load(spark: SparkSession, ref: String): DataFrame = spark.read.orc(ref)
}

/** JSON-lines with schema inference (`src_json_roundtrip`). */
object JsonSource extends Source {
  def load(spark: SparkSession, ref: String): DataFrame = spark.read.json(ref)
}

/** Spark's built-in JDBC source against a warehouse reachable by `url` —
  * the first REAL connector behind the Source seam (everything else here
  * is a file format): `ref` is the remote table name, and Spark's JDBC
  * relation pushes filters and column pruning INTO the database
  * (`PushedFilters`/selected column list in the scan — proven by
  * SourceRegistrySpec against embedded Derby, the JDBC engine already on
  * Spark's classpath for the Hive metastore). `partitionColumn` options
  * can be layered on per-table for parallel reads at scale; the default
  * single-partition read is right for dim tables, which is what a
  * warehouse-backed `ref` is in this engine (facts stay columnar).
  */
final case class JdbcSource(
    url: String,
    driver: String = "org.apache.derby.jdbc.EmbeddedDriver") extends Source {
  def load(spark: SparkSession, ref: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("driver", driver)
      .option("dbtable", ref)
      .load()
}

object JdbcSource {
  /** Embedded in-memory Derby — the in-sandbox stand-in for a warehouse
    * endpoint. Derby wants to drop a derby.log in user.dir; pin its home
    * to target/ first (idempotent; must happen before the engine boots).
    */
  def derbyMemoryUrl(db: String): String = {
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", "target")
    s"jdbc:derby:memory:$db;create=true"
  }
}

object Sources {

  /** dbt seed: a version-controlled CSV loaded as a table
    * (reference `seeds/` slot, dbt_project.yml:18) — header row + schema
    * inference, like `dbt seed`.
    */
  def seedCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** Register a seed under its table name (dbt seeds are ref()-able). */
  def loadSeed(spark: SparkSession, path: String, name: String): DataFrame = {
    val df = seedCsv(spark, path)
    df.createOrReplaceTempView(name)
    df
  }
}

object Sinks {

  /** Append to a monitoring table — the reference profiler's write mode
    * (profiling_example.py:24-28, `writeMethod=APPEND`).
    */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Full-width console dump (profiling_example.py:31). */
  def console(df: DataFrame): Unit = df.show(truncate = false)
}
