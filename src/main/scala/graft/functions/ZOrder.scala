package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve encoding — the multi-dimensional data-layout
  * key behind clustered table layouts (Delta OPTIMIZE ZORDER BY, Hudi
  * space-filling curves): interleaving the bits of two sort keys makes
  * rows close in BOTH dimensions close on the curve, so range predicates
  * on either column prune most files via min/max statistics — at 100 TB
  * the difference between scanning everything and scanning a few
  * percent.
  *
  * Pure 64-bit integer shift/mask arithmetic (the standard bit-spread
  * magic constants) built from codegen'd Spark built-ins — no UDF — and
  * bit-identical in any engine, so a SQL oracle replays the exact
  * z-values. Inputs are masked to their low 31 BITS (not 32: bit 31
  * would land on the sign bit after the final interleave shift, where
  * signed-overflow behavior differs across engines). */
object ZOrder {

  /** The spread masks: after `x = (x | x << s) & m` for each (s, m) pair,
    * the 31 input bits occupy every second position of a 64-bit word. */
  val SpreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 31 bits of `c` to the even bit positions. */
  def spreadBits(c: Column): Column =
    SpreadSteps.foldLeft(c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (x, (s, m)) => (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
    }

  /** 62-bit Morton code of two 31-bit nonnegative keys: x on even bits,
    * y on odd bits. z(x,y) preserves 2-D locality — the layout key. */
  def zValue(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** The identical computation as oracle SQL (DuckDB), generated from
    * the same constants so the two can never drift. */
  def zValueSql(x: String, y: String): String = {
    def spread(e: String): String =
      SpreadSteps.foldLeft(s"(CAST($e AS BIGINT) & 2147483647)") {
        case (acc, (s, m)) => s"((($acc | ($acc << $s)) & $m))"
      }
    s"(${spread(x)} | (${spread(y)} << 1))"
  }
}
