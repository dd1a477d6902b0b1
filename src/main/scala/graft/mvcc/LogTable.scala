package graft.mvcc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MVCC log-table: the reference's log-structured storage semantics
  * (reference: src/storage/log_file/log_entry.rs:7-28 entry kinds,
  * src/operators/sourcing/table_scan.rs:65-123 snapshot visibility,
  * src/storage/log_file/log_compaction.rs:9-64 compaction) re-expressed
  * as pure DataFrame recipes over an append-only table.
  *
  * Schema contract: a log DataFrame has
  *   - `txn`  LONG   — monotonically increasing transaction id (the
  *                     analogue of time-ordered UUIDv7; SURVEY §7.5.5)
  *   - `op`   STRING — "U" upsert row-version | "D" tombstone |
  *                     "C" commit marker | "R" explicit rollback marker
  *                     (reference log_entry.rs:39-45 Rollbacked; a txn
  *                     with neither marker is in-flight — invisible to
  *                     snapshots, preserved by compaction)
  *   - `rid`  LONG   — row identity (reference Row.id uuid)
  *   - payload columns (arbitrary; null on "C"/"R"/"D" rows)
  *
  * A transaction carries at most one of C/R (exclusive by contract, as in
  * the reference where a txn's final log record is one TransactionEntry).
  *
  * Scale notes (100 TB): the only shuffle is the per-rid window in
  * [[snapshot]] — the unavoidable "newest version per key" exchange. The
  * committed/rolled-back txn sets are tiny (one row per transaction) and
  * broadcast. Compaction rewrites the settled prefix of the log as its
  * own snapshot — keep-newest-committed/drop-tombstones — and drops
  * aborted versions eagerly (possible *because* the R marker is
  * explicit; marker-absence alone can't distinguish aborted from
  * in-flight).
  */
object LogTable {

  val Upsert = "U"
  val Delete = "D"
  val Commit = "C"
  val Rollback = "R"

  /** Committed transaction ids visible at `asOf`. */
  def committedTxns(log: DataFrame, asOf: Long): DataFrame =
    log.filter(col("op") === Commit && col("txn") <= asOf)
      .select("txn").distinct()

  /** Explicitly rolled-back transaction ids (reference Rollbacked,
    * log_entry.rs:44-45). */
  def rolledBackTxns(log: DataFrame): DataFrame =
    log.filter(col("op") === Rollback).select("txn").distinct()

  /** Snapshot visible at transaction `asOf`: newest committed version per
    * rid, tombstones suppress older versions (reference
    * table_scan.rs:65-123 backward-scan visibility, as a window).
    */
  def snapshot(log: DataFrame, asOf: Long): DataFrame = {
    val vis = log
      .filter(col("op").isin(Upsert, Delete) && col("txn") <= asOf)
      .join(broadcast(committedTxns(log, asOf)), Seq("txn"), "left_semi")
    // deterministic tie-break when one txn carries both an upsert and a
    // tombstone for the same rid: "D" < "U", so the tombstone wins —
    // never a partition-order-dependent outcome
    val newestFirst = Window.partitionBy("rid")
      .orderBy(col("txn").desc, col("op").asc)
    vis
      .withColumn("__rn", row_number().over(newestFirst))
      .filter(col("__rn") === 1 && col("op") === Upsert)
      .drop("__rn", "op")
  }

  /** Compaction (reference log_compaction.rs:9-64): rewrite the settled
    * prefix (committed, txn ≤ `asOf`) as its snapshot — one Upsert per
    * live rid stamped at its original txn, plus those commit markers.
    * Superseded versions and tombstoned history are dropped; entries of
    * explicitly rolled-back transactions are dropped EAGERLY (data and
    * marker — the abort is final at any snapshot point); in-flight and
    * future (txn > asOf) entries are preserved verbatim, so a
    * still-running transaction can commit after a compaction pass.
    *
    * Invariant (LogTableSpec): for every t,
    * snapshot(compact(log, asOf), t) == snapshot(log, t) whenever t ≥
    * the compacted prefix's settled point or t ≤ asOf.
    */
  def compact(log: DataFrame, asOf: Long): DataFrame = {
    val keptTxns = log.join(broadcast(rolledBackTxns(log)), Seq("txn"), "left_anti")
    val live = snapshot(keptTxns, asOf).withColumn("op", lit(Upsert))
    val markers = keptTxns.filter(col("op") === Commit && col("txn") <= asOf)
    // not settled at asOf: in-flight (no marker yet) or txn > asOf
    val pending = keptTxns
      .join(broadcast(committedTxns(keptTxns, asOf)), Seq("txn"), "left_anti")
    // a settled tombstone must SURVIVE compaction when a preserved
    // pending entry for the same rid has a lower txn: dropping it would
    // resurrect the deleted row once that in-flight txn commits (the
    // tombstone is what shadows it). Kept as its original D entry.
    val newestFirst = Window.partitionBy("rid")
      .orderBy(col("txn").desc, col("op").asc)
    val settledNewest = keptTxns
      .filter(col("op").isin(Upsert, Delete) && col("txn") <= asOf)
      .join(broadcast(committedTxns(keptTxns, asOf)), Seq("txn"), "left_semi")
      .withColumn("__rn", row_number().over(newestFirst))
      .filter(col("__rn") === 1 && col("op") === Delete)
      .drop("__rn")
    val shadowTombstones = settledNewest.as("t")
      .join(pending.filter(col("op").isin(Upsert, Delete))
        .select(col("rid").as("p_rid"), col("txn").as("p_txn")).as("p"),
        col("t.rid") === col("p_rid") && col("p_txn") < col("t.txn"),
        "left_semi")
    live.unionByName(markers, allowMissingColumns = true)
      .unionByName(pending, allowMissingColumns = true)
      .unionByName(shadowTombstones, allowMissingColumns = true)
  }

  /** Redundancy statistics — the compact-when signal (reference
    * CollectionStatistics::should_compact,
    * collection_statistics.rs:11-14: compact when redundant/total ≥ the
    * configured percentage). Redundant = data entries [[compact]] would
    * actually RECLAIM: superseded versions, tombstoned history, aborted
    * rows. In-flight (unmarked) transactions are excluded from the
    * denominator — compaction preserves them verbatim, so counting them
    * as redundant would make a compact-when-signaled loop re-trigger
    * forever while reclaiming nothing. Two count() probes — a
    * driver-side control decision like the reference's counters, not a
    * data-plane collect.
    */
  def redundancyRatio(log: DataFrame, asOf: Long): Double = {
    val settledTxns = committedTxns(log, asOf).unionByName(rolledBackTxns(log))
    val settled = log.filter(col("op").isin(Upsert, Delete))
      .join(broadcast(settledTxns.distinct()), Seq("txn"), "left_semi")
      .count()
    if (settled == 0) 0.0
    else 1.0 - snapshot(log, asOf).count().toDouble / settled
  }

  def shouldCompact(log: DataFrame, asOf: Long, redundancyThreshold: Double): Boolean =
    redundancyRatio(log, asOf) >= redundancyThreshold

  /** Entry builders — the write path (reference Collection::set_objects,
    * src/collection/mod.rs:46-93: upsert-or-tombstone + commit marker).
    * `payload` columns ride along; rollback = simply never emit Commit.
    */
  def upserts(rows: DataFrame, txn: Long, ridCol: Column): DataFrame =
    rows.withColumn("txn", lit(txn)).withColumn("op", lit(Upsert))
      .withColumn("rid", ridCol)

  def deletes(rids: DataFrame, txn: Long, ridCol: Column): DataFrame =
    rids.select(ridCol.as("rid"))
      .withColumn("txn", lit(txn)).withColumn("op", lit(Delete))

  def commitMarker(spark: org.apache.spark.sql.SparkSession, txn: Long): DataFrame = {
    import spark.implicits._
    Seq((txn, Commit)).toDF("txn", "op")
  }

  /** Explicit abort (reference LogEntry::rollback, log_entry.rs:44-45).
    * Snapshot-equivalent to never committing, but lets [[compact]] drop
    * the aborted versions eagerly instead of carrying them forever. */
  def rollbackMarker(spark: org.apache.spark.sql.SparkSession, txn: Long): DataFrame = {
    import spark.implicits._
    Seq((txn, Rollback)).toDF("txn", "op")
  }
}
