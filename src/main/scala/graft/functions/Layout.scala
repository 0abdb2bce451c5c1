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
}
