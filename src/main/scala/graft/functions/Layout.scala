package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Space-filling-curve helpers for data layout. Interleaving the bits of
  * two dimension keys gives a single sort key whose ordering clusters
  * BOTH dimensions at once: range-partition + sort files by the Morton
  * code and every file's min/max footer stats span a small rectangle of
  * (x, y) space, so scans prune on either dimension's predicate — the
  * standard multi-dimensional layout move for a 100 TB parquet lake,
  * where a single-column sort only ever prunes one dimension.
  *
  * Composed from built-in shift/mask expressions — fully codegen'd, no
  * UDF, and exactly replayable with integer arithmetic in the oracle.
  */
object Layout {

  /** Spread the low 16 bits of `v` to even bit positions 0,2,…,30
    * (classic mask-shift doubling chain).
    */
  private def spread16(v: Column): Column = {
    val m = v.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton (Z-order) code of two 16-bit keys: `x` occupies the
    * even bits, `y` the odd bits.
    */
  def morton16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Hilbert-curve index (order-8, d ∈ [0, 65535]) of two 8-bit keys,
    * appended as column `out`. Hilbert strictly beats Morton on layout
    * locality — every unit step of the curve moves distance 1 in (x, y)
    * space (Morton's bit-interleave takes long diagonal jumps at power-
    * of-two boundaries), so a contiguous range of d covers a TIGHTER
    * (x, y) bounding box and range-partitioned files get better min/max
    * footer pruning on both dimensions. This is the clustering key
    * Iceberg/Delta reach for past Z-order at lake scale.
    *
    * Classic iterative rotate-and-accumulate (Hamilton's xy2d form):
    * per curve order `s = 128 … 1`, the quadrant bits (rx, ry) add
    * `s²·((3·rx) XOR ry)` to the index and the frame rotates/reflects.
    * Emitted as EIGHT chained projections — each step's (x, y, d)
    * references the previous projection's columns by name, so codegen
    * sees 8 narrow CASE steps instead of one exponentially nested
    * conditional — and the oracle replays the identical chain as eight
    * CTEs of integer CASE arithmetic.
    */
  def hilbert8(df: org.apache.spark.sql.DataFrame, xCol: String,
      yCol: String, out: String): org.apache.spark.sql.DataFrame = {
    val start = df
      .withColumn("_hx", col(xCol).cast("long").bitwiseAND(lit(255L)))
      .withColumn("_hy", col(yCol).cast("long").bitwiseAND(lit(255L)))
      .withColumn(out, lit(0L))
    val walked = (7 to 0 by -1).foldLeft(start) { (d, i) =>
      val s = 1L << i
      val rx = when(d("_hx").bitwiseAND(lit(s)) > 0L, lit(1L)).otherwise(lit(0L))
      val ry = when(d("_hy").bitwiseAND(lit(s)) > 0L, lit(1L)).otherwise(lit(0L))
      // all three exprs read the PREVIOUS projection's _hx/_hy/out —
      // withColumns evaluates the map against the current frame at once
      d.withColumns(Map(
        out -> (d(out) + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)),
        "_hx" -> when(ry === 0L,
            when(rx === 1L, lit(s - 1) - d("_hy")).otherwise(d("_hy")))
          .otherwise(d("_hx")),
        "_hy" -> when(ry === 0L,
            when(rx === 1L, lit(s - 1) - d("_hx")).otherwise(d("_hx")))
          .otherwise(d("_hy"))))
    }
    walked.drop("_hx", "_hy")
  }

  /** DuckDB twin of [[hilbert8]]: the eight rotate-and-accumulate CTEs
    * seeded by `seedCte` (which must emit `x8`, `y8` masked to 8 bits
    * and `d8 = 0`, plus any carried columns named in `carry`). Each
    * step reads (x{i+1}, y{i+1}, d{i+1}) and emits UNIQUELY named
    * (x{i}, y{i}, d{i}) — sibling aliases never shadow source columns,
    * so DuckDB's lateral alias resolution can't diverge from Spark's
    * all-from-previous-frame semantics. Returns the full `WITH … h0`
    * chain; the caller appends a final SELECT reading `h0.d0`.
    */
  def hilbert8OracleCtes(seedCte: String, carry: String): String = {
    val steps = (7 to 0 by -1).map { i =>
      val s = 1L << i
      val prev = if (i == 7) "seed" else s"h${i + 1}"
      val (x, y, d) = (s"x${i + 1}", s"y${i + 1}", s"d${i + 1}")
      s"""h$i AS (SELECT $carry,
         |  CASE WHEN ($y & $s) = 0 THEN
         |      (CASE WHEN ($x & $s) > 0 THEN ${s - 1} - $y ELSE $y END)
         |    ELSE $x END AS x$i,
         |  CASE WHEN ($y & $s) = 0 THEN
         |      (CASE WHEN ($x & $s) > 0 THEN ${s - 1} - $x ELSE $x END)
         |    ELSE $y END AS y$i,
         |  $d + ${s * s} * xor(3 * (CASE WHEN ($x & $s) > 0 THEN 1 ELSE 0 END),
         |    (CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END)) AS d$i
         |FROM $prev)""".stripMargin
    }
    s"WITH seed AS ($seedCte),\n${steps.mkString(",\n")}"
  }
}
