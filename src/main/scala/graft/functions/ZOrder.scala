package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve column builders — multi-dimensional data
  * skipping for range predicates, the layout-level complement to
  * partition pruning (one dimension, categorical) and bucketing (join
  * co-location): rows clustered by interleaved bit order of several
  * numeric dimensions land in files whose per-column min/max footers
  * are TIGHT in every dimension at once, so a box predicate (x in
  * [a,b] AND y in [c,d]) lets the parquet reader skip whole row groups
  * on BOTH columns. A single-column sort only ever skips on that
  * column; at 100 TB the difference is scanning a tile instead of a
  * stripe. (The technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`;
  * Morton 1966.)
  *
  * Everything here is pure built-in Column arithmetic (shifts, masks,
  * ors) — codegen'd, no UDFs, no custom expressions.
  */
object ZOrder {

  /** Bits of interleaved precision per dimension (16 ⇒ a 32-bit z-value
    * for 2 dimensions — 65k cells per axis, far finer than any file
    * count a table produces). */
  val BitsPerDim = 16

  /** Scale a numeric column to an integer cell id in [0, 2^16) given
    * its global [min, max]. Linear scaling — adequate for roughly
    * uniform dimensions; skewed dimensions should pass a pre-ranked
    * column instead (the interleave does not care what the cell ids
    * mean). NULL maps to cell 0 (sorts first, like NULLS FIRST). */
  def cell16(c: Column, min: Double, max: Double): Column = {
    val span = if (max > min) max - min else 1.0
    val scaled = floor((coalesce(c.cast("double"), lit(min)) - lit(min))
      / lit(span) * lit((1 << BitsPerDim) - 1))
    greatest(lit(0L), least(lit(((1 << BitsPerDim) - 1).toLong), scaled.cast("long")))
  }

  /** Interleave the low 16 bits of two cell-id columns: bit i of `u`
    * lands at position 2i+1, bit i of `v` at 2i. 32 shift/mask/or terms
    * — constant-folded by Catalyst where possible, whole-stage
    * codegen'd otherwise. */
  def interleave2(u: Column, v: Column): Column =
    (0 until BitsPerDim).map { i =>
      shiftleft(u.bitwiseAND(lit(1L << i)), i + 1)
        .bitwiseOR(shiftleft(v.bitwiseAND(lit(1L << i)), i))
    }.reduce(_ bitwiseOR _)

  /** The z-value of two numeric columns given their global ranges. */
  def zvalue2(c1: Column, min1: Double, max1: Double,
      c2: Column, min2: Double, max2: Double): Column =
    interleave2(cell16(c1, min1, max1), cell16(c2, min2, max2))
}
