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
  *                     "C" commit marker (rollback = no marker, matching
  *                     the reference where only Committed makes entries
  *                     visible, table_scan.rs:50-51)
  *   - `rid`  LONG   — row identity (reference Row.id uuid)
  *   - payload columns (arbitrary; null on "C"/"D" rows)
  *
  * Scale notes (100 TB): the only shuffle is the per-rid window in
  * [[snapshot]] — the unavoidable "newest version per key" exchange. The
  * committed-txn set is tiny (one row per transaction) and broadcast.
  * Compaction rewrites the log as its own snapshot, exactly the
  * reference's keep-newest-committed/drop-tombstones semantics.
  */
object LogTable {

  val Upsert = "U"
  val Delete = "D"
  val Commit = "C"

  /** Committed transaction ids visible at `asOf`. */
  def committedTxns(log: DataFrame, asOf: Long): DataFrame =
    log.filter(col("op") === Commit && col("txn") <= asOf)
      .select("txn").distinct()

  /** Snapshot visible at transaction `asOf`: newest committed version per
    * rid, tombstones suppress older versions (reference
    * table_scan.rs:65-123 backward-scan visibility, as a window).
    */
  def snapshot(log: DataFrame, asOf: Long): DataFrame = {
    val vis = log
      .filter(col("op").isin(Upsert, Delete) && col("txn") <= asOf)
      .join(broadcast(committedTxns(log, asOf)), Seq("txn"), "left_semi")
    val newestFirst = Window.partitionBy("rid").orderBy(col("txn").desc)
    vis
      .withColumn("__rn", row_number().over(newestFirst))
      .filter(col("__rn") === 1 && col("op") === Upsert)
      .drop("__rn", "op")
  }

  /** Compaction (reference log_compaction.rs:9-64): rewrite the log as
    * its snapshot — one Upsert per live rid stamped at its original txn,
    * plus the commit markers still ≤ `asOf`. Uncommitted and tombstoned
    * history is dropped.
    */
  def compact(log: DataFrame, asOf: Long): DataFrame = {
    val live = snapshot(log, asOf).withColumn("op", lit(Upsert))
    val markers = log.filter(col("op") === Commit && col("txn") <= asOf)
    live.unionByName(markers, allowMissingColumns = true)
  }

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
}
