package graft

import org.apache.spark.sql.functions._

import graft.functions.EventTime

/** The ts-representation shim that absorbed the round-8 testdata change
  * (TIMESTAMP(NANOS)-as-long → TIMESTAMP(MICROS)/NTZ): conversion must
  * be EXACT integer work at epoch-2026 magnitudes (beyond 2^53, where a
  * double roundtrip silently shifts by ~128 ns), and a long column must
  * pass through untouched. */
class EventTimeSpec extends SparkTestBase {
  import spark.implicits._

  test("timestamp_ntz ts surfaces as exact epoch-ns long (UTC semantics, no double rounding)") {
    // 2026-01-01T00:00:00.123456 UTC = 1767225600.123456 s since epoch;
    // the odd trailing microsecond digits are the exactness probe
    val us = 1767225600123456L
    val df = Seq(Tuple1(us)).toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val out = EventTime.withNanos(df).select(col("ts")).head.getLong(0)
    assert(out == us * 1000L, s"expected ${us * 1000L}, got $out")
  }

  test("long ts passes through unchanged; unsupported types fail loudly") {
    val ns = 1767225600123456789L
    val df = Seq(Tuple1(ns)).toDF("ts")
    assert(EventTime.withNanos(df).head.getLong(0) == ns)
    val bad = Seq(Tuple1("2026-01-01")).toDF("ts")
    intercept[IllegalArgumentException] { EventTime.withNanos(bad) }
  }

  test("fixture events table: normalized ns column floors to the same microsecond DuckDB reads") {
    // cross-representation invariant behind every event-time oracle:
    // ns div 1000 must equal the parquet file's raw micros
    val ev = graft.functions.EventTime.withNanos(
      graft.catalog.Catalog(spark, sf).table("events"))
    val probe = ev.select(col("event_id"), expr("ts div 1000").as("us"))
      .orderBy(col("event_id")).limit(5).collect()
    // the raw side must branch on the file's encoding itself (a blind
    // cast('timestamp') would read a NANOS-as-long generation as epoch
    // SECONDS) — long ns divides, native timestamps go through
    // unix_micros
    val rawDf = spark.read.parquet(s"$sf/events.parquet")
    val usCol = rawDf.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    val raw = rawDf.select(col("event_id"), usCol.as("us"))
      .orderBy(col("event_id")).limit(5).collect()
    assert(probe.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      raw.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }
}
