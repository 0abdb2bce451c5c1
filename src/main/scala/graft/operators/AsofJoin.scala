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
    require(!leftCols.exists(payload.contains),
      s"payload ${payload.mkString(",")} collides with a left column")

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
}
