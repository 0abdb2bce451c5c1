package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable scan layer (SURVEY.md §2.1): the reference loads whole
  * tables from a warehouse by name
  * (`spark.read.format("bigquery").load(name)`, dq_sql_notes.md:74) —
  * this trait keeps that format pluggable, so a `bigquery` (or iceberg,
  * jdbc, …) source drops in without touching the engine.
  */
trait Source {
  /** Load a table by reference (path or name, format-defined). */
  def load(spark: SparkSession, ref: String): DataFrame
}

/** Parquet-directory source — the testdata stand-in for the warehouse. */
object ParquetSource extends Source {
  def load(spark: SparkSession, ref: String): DataFrame = spark.read.parquet(ref)
}

/** Header+inferSchema CSV (dbt seeds). */
object CsvSource extends Source {
  def load(spark: SparkSession, ref: String): DataFrame = Sources.seedCsv(spark, ref)
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
