package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact integer arithmetic for driver-portable quantized outputs.
  *
  * Motivation (round-12 postmortem): any output value produced by
  * `round(<raw IEEE double expr>, n)` and cast to DECIMAL sits one ulp
  * away from flipping on a different DuckDB/libm build — rows+schema
  * match, hash doesn't. The portable discipline is the one x99 proved
  * driver-green: quantize every double-derived value ONCE onto an
  * integer grid (BIGINT micro-units), then keep ALL downstream
  * arithmetic — sums, ratios, thresholds, tie-breaks — in exact
  * integer ops that both engines replay digit-for-digit. Division is
  * the only step that can leave the grid, so it is re-rounded with
  * [[divHalfUp]], whose result is defined by integer arithmetic alone.
  */
object ExactMath {

  /** round-half-up(num/den) for NON-NEGATIVE integral `num` and
    * POSITIVE integral `den`, as pure integer arithmetic:
    * `(2·num + den) div (2·den)`. `div` is Spark's IntegralDivide —
    * exact LongType division, no IEEE anywhere, so the result is
    * bit-identical on every engine that replays the same expression
    * (DuckDB: `(2*num + den) // (2*den)`). Callers must guarantee the
    * sign contract; all in-tree uses divide non-negative quantized
    * sums by positive counts/totals. */
  def divHalfUp(num: Column, den: Column): Column =
    call_function("div", num * lit(2L) + den, den * lit(2L))

  /** [[divHalfUp]] extended to signed numerators (den still > 0):
    * rounds half AWAY FROM ZERO — Spark's `round()`/BigDecimal
    * HALF_UP convention — as sign(num)·divHalfUp(|num|, den), all in
    * exact integer ops (DuckDB twin: the same CASE over `//`). Use for
    * log-prob/score grids whose sums are negative. */
  def divHalfUpSigned(num: Column, den: Column): Column =
    when(num < 0L, -divHalfUp(-num, den)).otherwise(divHalfUp(num, den))

  /** Quantize an IEEE double onto the 1e-6 grid as BIGINT micro-units
    * — the x99 `cq` pattern (`CAST(round(x*1e6) AS BIGINT)` in
    * DuckDB). A single nearest-integer rounding of a double both
    * engines computed bit-identically is portable; what is NOT
    * portable is `round(x, 6)` re-expressed as a DECIMAL, which
    * different builds resolve differently at the .5 boundary. */
  def microQ(x: Column): Column =
    round(x * lit(1000000d)).cast("long")
}
