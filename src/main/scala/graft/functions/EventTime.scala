package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical-representation shim for event-time columns.
  *
  * The `events` table's `ts` column has shipped in two parquet
  * encodings across dataset generations:
  *
  *   - TIMESTAMP(NANOS), which Spark has no native type for — surfaced
  *     as a raw long (ns since epoch) via
  *     `spark.sql.legacy.parquet.nanosAsLong` ([[graft.engine.GraftSession]]);
  *   - TIMESTAMP(MICROS) (isAdjustedToUTC=false) — surfaced as
  *     TIMESTAMP_NTZ.
  *
  * Engine queries do exact integer event-time arithmetic (bucketing,
  * session gaps, as-of slicing, z-order bounds), so the representation
  * is normalized ONCE, at the scan edge: downstream, `ts` is always a
  * long in epoch NANOSECONDS. The conversion is pure integer work
  * (`unix_micros * 1000` — no long→double rounding; epoch-ns magnitudes
  * exceed 2^53 where double loses integer exactness). NTZ wall-clock
  * values are interpreted as UTC, which matches both the pinned session
  * timezone (GraftSession sets `spark.sql.session.timeZone=UTC`) and
  * DuckDB's naive-TIMESTAMP `epoch_ns`/`epoch_us`, so oracle SQL is
  * representation-independent.
  *
  * At 100 TB this is a zero-cost map expression fused into the scan
  * projection by whole-stage codegen; filters that must reach parquet
  * footers (x49) are written against derived LAYOUT tables whose `ts`
  * is already a plain long, so pushdown is unaffected.
  */
object EventTime {

  /** `c` (of static type `dt`) as epoch nanoseconds (long). */
  def nanosCol(dt: DataType, c: Column): Column = dt match {
    case LongType => c
    case TimestampNTZType => unix_micros(c.cast(TimestampType)) * lit(1000L)
    case TimestampType => unix_micros(c) * lit(1000L)
    case other => throw new IllegalArgumentException(
      s"EventTime: unsupported event-time column type $other " +
        "(expected long ns, timestamp, or timestamp_ntz)")
  }

  /** `df` with column `name` rewritten in place to epoch-ns long
    * (no-op when already long). Works on batch and streaming frames —
    * the branch is on the static schema. */
  def withNanos(df: DataFrame, name: String = "ts"): DataFrame =
    df.schema(name).dataType match {
      case LongType => df
      case dt => df.withColumn(name, nanosCol(dt, col(name)))
    }
}
