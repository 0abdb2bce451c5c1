package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines. `df.sample()` is seed-dependent *per partitioning* — the
  * same corpus re-partitioned samples differently, which breaks
  * reproducibility audits and incremental reprocessing. Hashing a stable
  * key instead makes membership a pure function of the row: any engine,
  * any partitioning, any day recomputes the same sample (the oracle
  * recomputes it in DuckDB to prove exactly that).
  *
  * Both operators are stateless narrow filters/projections — they fuse
  * into the scan under whole-stage codegen, no shuffle, no driver state.
  */
object Sampling {

  private def nibble(keyCol: String) =
    substring(md5(col(keyCol).cast("string")), 1, 1)

  /** Keep rows whose md5(key) first hex nibble < `sixteenths`: a
    * deterministic ~(sixteenths/16) sample.
    */
  def hashSample(df: DataFrame, keyCol: String, sixteenths: Int): DataFrame = {
    require(sixteenths >= 1 && sixteenths <= 15, "sixteenths in [1, 15]")
    df.filter(nibble(keyCol) < lit(Integer.toHexString(sixteenths)))
  }

  /** Label every row 'train' or 'test' by the same nibble rule —
    * complementary by construction (no row lost, none duplicated),
    * stable under reprocessing.
    */
  def trainTestSplit(df: DataFrame, keyCol: String, testSixteenths: Int): DataFrame = {
    require(testSixteenths >= 1 && testSixteenths <= 15, "testSixteenths in [1, 15]")
    df.withColumn("split",
      when(nibble(keyCol) < lit(Integer.toHexString(testSixteenths)), "test")
        .otherwise("train"))
  }

  /** Exact-k-per-group deterministic sample: the k rows with the
    * *smallest md5(key)* in each group — the distributed equivalent of a
    * per-group reservoir sample, but reproducible (bottom-k of a hash is
    * a pure function of the keys, independent of partitioning, arrival
    * order, or cluster size; a reseeded `reservoir` is none of those).
    * Rate-based sampling ([[hashSample]]) can't promise an exact count
    * per group; this can, which is what eval-set construction and
    * per-source spot-check pulls need. The window is PARTITIONED by the
    * group column, so each group ranks locally after the hash shuffle —
    * no global sort at any scale; skew is bounded by the largest group.
    */
  def bottomKPerGroup(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Deterministic stratified sample: a per-stratum rate (in sixteenths)
    * applied with the same hash rule — `df.stat.sampleBy` with
    * reproducibility. Strata absent from `rates` are dropped, matching
    * sampleBy. The class-rebalancing primitive for skewed corpora.
    */
  def stratifiedHashSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      rates: Map[String, Int]): DataFrame = {
    require(rates.values.forall(r => r >= 1 && r <= 15), "rates in [1, 15]")
    val threshold = rates.foldLeft(lit(null).cast("string")) {
      case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit(Integer.toHexString(r))).otherwise(acc)
    }
    df.filter(nibble(keyCol) < threshold)
  }

  /** Weighted priority sample (A-Res, Efraimidis–Spirakis): each row gets
    * priority u^(1/w) with u a *deterministic* uniform derived from
    * md5(key) (first 8 hex digits → 32-bit integer, +0.5, /2^32 — never
    * exactly 0 or 1) and w its weight; the k rows with the LARGEST
    * priority are a weighted sample without replacement — inclusion
    * probability rises with weight, yet membership stays a pure function
    * of (key, weight), reproducible on any engine / partitioning / day.
    * A `rand()`-seeded reservoir is none of those (seed is
    * per-partitioning), which is why importance-weighted corpus pulls
    * need the hash-derived u.
    *
    * Scale shape: one narrow projection (md5 + pow fuse into the scan
    * under codegen) + TakeOrdered(k) — per-partition top-k then a k-row
    * driver merge; nothing corpus-sized shuffles. Weights < 1 are
    * clamped to 1 (u^(1/w) explodes toward 0 as w→0⁺; clamping keeps the
    * priority monotone and the nonpositive-weight case defined).
    */
  def weightedPrioritySample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val u = (conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") + lit(0.5d)) / lit(4294967296.0d)
    val priority = pow(u, lit(1.0d) / greatest(col(weightCol).cast("double"), lit(1.0d)))
    df.withColumn("ares_priority", priority)
      .orderBy(col("ares_priority").desc, col(keyCol))
      .limit(k)
  }
}
