package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band) join — points matched to [lo, hi) intervals. Spark plans
  * a raw `p >= lo AND p < hi` join as a broadcast-nested-loop / cartesian
  * filter: O(|points| × |ranges|) comparisons. Binning turns it into an
  * equi join: each range is exploded into the fixed-width bins it
  * overlaps, points carry their single bin, candidates equi-join on the
  * bin id, and the exact bound predicate verifies. Cost is
  * O(|points| + |ranges| × spans + |candidates|), shuffle-bounded —
  * choose `binWidth` near the typical range width so each range spans
  * O(1) bins and each point meets only ranges it can actually match.
  */
object RangeJoin {

  /** Inner-join `points` to the `ranges` rows whose [loCol, hiCol)
    * interval contains pointCol. All columns of both sides pass through.
    */
  def pointInRange(
      points: DataFrame,
      pointCol: String,
      ranges: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    // hi is exclusive but its bin may still contain in-range points
    // (hi not on a bin boundary) — including it is always safe, the
    // bound predicate removes false candidates
    val r = ranges.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(r, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join: all pairs whose half-open intervals
    * intersect (`lLo < rHi && rLo < lHi`), optionally under equi keys
    * (`usingKeys` must exist on BOTH sides under the same names). A raw
    * overlap conjunct plans as a per-key cartesian; here both sides
    * explode into the fixed-width bins they span and candidates
    * equi-join on (keys, bin). A pair whose intervals span several bins
    * would match in each shared bin, so each pair is emitted ONLY in the
    * bin containing its overlap start (`max(lLo, rLo)`) — exactly-once
    * without a distinct/dedup shuffle. Cost is candidates-bounded; pick
    * `binWidth` near the typical interval width. Bound columns are
    * numeric (e.g. epoch micros).
    */
  def intervalOverlap(
      left: DataFrame,
      lLo: String,
      lHi: String,
      right: DataFrame,
      rLo: String,
      rHi: String,
      binWidth: Long,
      usingKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bins(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    bins(left, lLo, lHi).join(bins(right, rLo, rHi), "__bin" +: usingKeys)
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi))
      .filter(floor(greatest(col(lLo), col(rLo)) / binWidth).cast("long") === col("__bin"))
      .drop("__bin")
  }
}
