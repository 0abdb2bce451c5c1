package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Stands in for the reference's warehouse scan
  * (`spark.read.format("bigquery").load(name)` — reference
  * tests/dq_sql_notes.md:74); the [[graft.sources.Source]] trait keeps the
  * format pluggable.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  // Every spark.read.parquet re-infers the footer schema with a 1-task
  // job; a Verify/Bench pass loads these immutable tables hundreds of
  // times. Memoizing the DataFrame (an immutable plan — downstream
  // operators stack on top without mutating it) makes repeat loads
  // job-free. Keyed by session so a stopped session's plans are never
  // handed to a live one.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Load one testdata table.
    *
    * `events.ts` is TIMESTAMP(NANOS) in the parquet footer, which Spark 4
    * has no native type for — we read nanos as a long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and floor-convert to a
    * microsecond timestamp, matching DuckDB's TIMESTAMP_NS → TIMESTAMP
    * truncation so oracle comparisons agree.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name), _ =>
      if (name == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path(dir, name))
          .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      } else {
        spark.read.parquet(path(dir, name))
      })

  /** Register every testdata table as a temp view so `spark.sql` queries
    * (custom-SQL DQ rules, reference dq_sql_notes.md:228) can address them
    * by bare name — mirroring how the DuckDB oracle sees them.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
