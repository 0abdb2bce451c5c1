package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable scan/sink layer (SURVEY.md §2.1). The warehouse scan
  * (`spark.read.format("bigquery").load(name)`, reference
  * dq_sql_notes.md:74) is stood in by parquet via [[graft.Tables]]; the
  * pieces here fill the remaining capability slots.
  */
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
