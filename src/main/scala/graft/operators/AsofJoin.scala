package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — for each left row, attach the most
  * recent right row with the same key and right.ts <= left.ts. The
  * canonical time-series/feature-store lookup Spark has no built-in for
  * (DuckDB: `ASOF JOIN`; the oracle uses it).
  *
  * Plan shape: tag both sides, UNION, one window over
  * (key) ordered by (ts, side) carrying the right side's payload forward
  * with `last_value(ignoreNulls)`, then keep left rows. ONE shuffle on
  * the join key, zero range explosion — the scalable alternative to the
  * naive `l.ts >= r.ts` range join, whose candidate set is quadratic per
  * key, and to per-key `collect_list` UDFs, which break on hot keys.
  * Right rows sort before left rows at equal ts (side 0 < 1), so a right
  * row effective AT ts is visible to a left row at the same ts —
  * DuckDB's `ON l.ts >= r.ts` inclusive semantics.
  *
  * `right` must be unique per (key, ts) — pre-reduce it otherwise
  * (deterministic output needs a defined winner among same-instant
  * versions; [[latestPerKeyTs]] keeps the max-`tieCol` row).
  */
object AsofJoin {

  // Names the union-window plan claims for itself. A caller column with
  // one of these names would be silently overwritten by the tagging
  // `withColumn`s (wrong results, no error) — so reject it up front.
  private val reservedNames =
    Seq("__k", "__t", "__side", "__p", "__pb", "__pf", "__tb", "__tf")

  private def checkColumns(
      left: DataFrame,
      right: DataFrame,
      payload: Seq[String],
      emitted: Seq[String]): Unit = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      s"payload ${payload.mkString(",")} collides with a left column")
    val clash = (leftCols ++ right.columns).filter(reservedNames.contains).distinct
    require(clash.isEmpty,
      s"column(s) ${clash.mkString(",")} collide with AsofJoin internal names " +
        s"(${reservedNames.mkString(",")}) — rename before joining")
    val outClash = emitted.filter(leftCols.contains)
    require(outClash.isEmpty,
      s"left column(s) ${outClash.mkString(",")} collide with emitted output " +
        s"column(s) ${emitted.mkString(",")}")
  }

  /** Reduce `df` to one row per (key, ts): the max-`tieCol` row wins. */
  def latestPerKeyTs(df: DataFrame, key: String, ts: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(key), col(ts)).orderBy(col(tieCol).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** @param left      probe side; all its columns pass through
    * @param right     build side, unique per (rightKey, rightTs)
    * @param leftKey   equi-key on the left
    * @param rightKey  equi-key on the right
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column
    * @param payload   right columns to attach (null when no right row is
    *                  at-or-before the left row's ts)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    checkColumns(left, right, payload, emitted = Nil)

    // Carry ONE struct of the payload columns forward, not each column
    // independently: per-column last(ignoreNulls) would stitch values from
    // DIFFERENT right rows whenever the latest matching row has a null in
    // one payload column. A struct from a right row is never null (even if
    // every field is), so last(struct, ignoreNulls) skips exactly the
    // left-side rows and returns the whole most-recent right row — the
    // DuckDB ASOF JOIN semantics.
    val pSchema = StructType(payload.map(p => right.schema(p)))
    val lTagged = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(col) :+ lit(null).cast(pSchema).as("__p"): _*)
    val rTagged = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(c => lit(null).as(c)) :+
        struct(payload.map(col): _*).as("__p"): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__p").getField(p).as(p)): _*)
  }

  /** As-of join, FORWARD direction (pandas `merge_asof
    * (direction='forward')`, DuckDB `ASOF JOIN … ON l.ts <= r.ts`): for
    * each left row, attach the EARLIEST right row with the same key and
    * right.ts >= left.ts — the "next touch" attribution / next-scheduled-
    * event lookup, the mirror of [[asof]].
    *
    * Same single-shuffle union-window plan, mirrored: here LEFT rows tag
    * side 0 and RIGHT rows side 1, so at equal ts the right row sorts
    * AFTER the left row and the `first(ignoreNulls)` over
    * (currentRow, unboundedFollowing) sees it — the inclusive `>=`
    * semantics (in [[asof]] the tags are reversed for the same reason in
    * the other direction). ONE shuffle on the key, no range explosion.
    * `right` must be unique per (key, ts) — see [[latestPerKeyTs]].
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    checkColumns(left, right, payload, emitted = Nil)
    val pSchema = StructType(payload.map(p => right.schema(p)))
    val lTagged = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTs))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(col) :+ lit(null).cast(pSchema).as("__p"): _*)
    val rTagged = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTs))
      .withColumn("__side", lit(1))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(c => lit(null).as(c)) :+
        struct(payload.map(col): _*).as("__p"): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__p", first(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 0)
      .select(leftCols.map(col) ++
        payload.map(p => col("__p").getField(p).as(p)): _*)
  }

  /** As-of join, `nearest` direction (pandas `merge_asof
    * (direction='nearest')`, kdb `aj` generalization): for each left row,
    * attach the right row with the same key whose timestamp is CLOSEST to
    * the left row's — before or after — within `toleranceMicros`; ties
    * (equal distance before and after) keep the EARLIER right row. Left
    * rows with no right row in range keep null payload.
    *
    * Plan shape: same single-shuffle union trick as [[asof]], but the one
    * sorted pass carries TWO frames — last-right-at-or-before (backward)
    * and first-right-strictly-after (forward; an equal-ts right row sorts
    * before the left row, so backward catches it at distance 0). Both
    * window frames share the (key) partitioning and (ts, side) sort, so
    * Catalyst plans ONE exchange + ONE sort with two Window operators on
    * top — no range join, no per-key candidate explosion; the two
    * candidates per left row are compared with plain column arithmetic.
    *
    * `right` must be unique per (key, ts) (see [[latestPerKeyTs]]) so the
    * backward/forward candidates — and therefore the output — are
    * deterministic.
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceMicros: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    checkColumns(left, right, payload, emitted = Seq("asof_delta_us"))

    // the carried struct embeds the right timestamp (micros) so distance
    // is computable from the struct alone
    val pSchema = StructType(payload.map(p => right.schema(p)))
    val lTagged = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", unix_micros(col(leftTs)))
      .withColumn("__side", lit(1))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(col) :+ lit(null).cast(pSchema).as("__p"): _*)
    val rTagged = right
      .withColumn("__k", col(rightKey))
      .withColumn("__t", unix_micros(col(rightTs)))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(c => lit(null).as(c)) :+
        struct(payload.map(col): _*).as("__p"): _*)

    val order = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
    val back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val carried = lTagged.unionByName(rTagged)
      .withColumn("__pb", last(col("__p"), ignoreNulls = true).over(back))
      .withColumn("__tb", last(when(col("__side") === 0, col("__t")),
        ignoreNulls = true).over(back))
      .withColumn("__pf", first(col("__p"), ignoreNulls = true).over(fwd))
      .withColumn("__tf", first(when(col("__side") === 0, col("__t")),
        ignoreNulls = true).over(fwd))

    val db = col("__t") - col("__tb") // ≥ 0 (backward)
    val df = col("__tf") - col("__t") // > 0 (forward; equal ts went backward)
    val bOk = col("__tb").isNotNull && db <= toleranceMicros
    val fOk = col("__tf").isNotNull && df <= toleranceMicros
    // tie (db == df) keeps the earlier (backward) row
    val useBack = bOk && (!fOk || db <= df)
    val chosen = when(useBack, col("__pb")).when(fOk, col("__pf"))
    val delta = when(useBack, -db).when(fOk, df).cast("long")

    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => chosen.getField(p).as(p)) :+
        delta.as("asof_delta_us"): _*)
  }
}
