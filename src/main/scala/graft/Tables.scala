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
  // job-free. The cache is a size-bounded LRU (a weak map keyed by session
  // would be self-defeating: a DataFrame strongly references its session,
  // so the value would pin the key and nothing would ever be collected) —
  // at most `maxEntries` plans are retained, so a stopped session's plans
  // age out instead of living for the JVM lifetime.
  // The Source-registry generation is part of the key: a mid-session
  // Source.register("parquet", ...) would otherwise be silently ignored
  // for any table already loaded (the swap-without-call-site-changes
  // seam must also apply to repeat loads). Stale-generation entries age
  // out of the LRU like any other.
  private val maxEntries = 64
  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String, String, Long), DataFrame](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, String, Long), DataFrame]): Boolean =
        size() > maxEntries
    }

  /** Drop every memoized plan for `spark` (all sessions if null). Call after
    * regenerating a table directory in place — a cached plan pins the file
    * listing it was created with, so a rewrite under the same path would
    * otherwise serve stale splits.
    */
  def invalidate(spark: SparkSession = null): Unit = cache.synchronized {
    if (spark == null) cache.clear()
    else {
      val it = cache.keySet().iterator()
      while (it.hasNext) if (it.next()._1 eq spark) it.remove()
    }
  }

  /** Load one testdata table.
    *
    * `events.ts` has drifted across driver fixture generations:
    * TIMESTAMP(NANOS) footers (no native Spark 4 type — read nanos as a
    * long via `spark.sql.legacy.parquet.nanosAsLong`, floor-convert to
    * micros) and plain `timestamp[us]` footers (read natively as
    * TIMESTAMP_NTZ). Both are normalized to the session-timezone
    * `TimestampType` the rest of the engine — and every prior
    * oracle-green round — was built against, by dispatching on the
    * FOOTER-inferred type rather than assuming one generation's schema.
    * Values agree with DuckDB either way: nanos→micros is the same
    * truncation DuckDB applies, and the NTZ→timestamp cast is a no-op
    * re-tag under the UTC session timezone.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = cache.synchronized {
    val key = (spark, dir, name, graft.sources.Source.generation)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      // all table scans resolve through the pluggable Source seam —
      // swapping "parquet" for a registered warehouse format (bigquery,
      // iceberg, jdbc…) needs no call-site changes
      val src = graft.sources.Source("parquet")
      val df =
        if (name == "events") {
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          val raw = src.load(spark, path(dir, name))
          raw.schema("ts").dataType match {
            case org.apache.spark.sql.types.LongType =>
              raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
            case org.apache.spark.sql.types.TimestampNTZType =>
              raw.withColumn("ts", col("ts").cast("timestamp"))
            case _ => raw
          }
        } else {
          src.load(spark, path(dir, name))
        }
      cache.put(key, df)
      df
    }
  }

  /** Register every testdata table as a temp view so `spark.sql` queries
    * (custom-SQL DQ rules, reference dq_sql_notes.md:228) can address them
    * by bare name — mirroring how the DuckDB oracle sees them.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
