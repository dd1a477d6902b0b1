package graft

import org.apache.spark.sql.functions._

import graft.mvcc.LogTable

/** MVCC log-table semantics (reference table_scan.rs:65-123 visibility,
  * log_compaction.rs:9-64): upsert/tombstone/commit/rollback/snapshot/
  * compaction on a hand-built log.
  */
class LogTableSpec extends SparkTestBase {

  import spark.implicits._

  // rid 1: v1 then updated in txn2; rid 2: deleted in txn3;
  // rid 3: updated in *uncommitted* txn4 (no marker = rollback);
  // rid 4: inserted in txn4 (invisible).
  private lazy val log = {
    val t1 = LogTable.upserts(
      Seq((1L, "a1"), (2L, "b1"), (3L, "c1")).toDF("rid", "v"), 1L, col("rid"))
    val t2 = LogTable.upserts(Seq((1L, "a2")).toDF("rid", "v"), 2L, col("rid"))
    val t3 = LogTable.deletes(Seq(Tuple1(2L)).toDF("rid"), 3L, col("rid"))
    val t4 = LogTable.upserts(
      Seq((3L, "c2"), (4L, "d1")).toDF("rid", "v"), 4L, col("rid"))
    t1.unionByName(t2)
      .unionByName(t3, allowMissingColumns = true)
      .unionByName(t4)
      .unionByName(LogTable.commitMarker(spark, 1L), allowMissingColumns = true)
      .unionByName(LogTable.commitMarker(spark, 2L), allowMissingColumns = true)
      .unionByName(LogTable.commitMarker(spark, 3L), allowMissingColumns = true)
  }

  private def snap(asOf: Long): Map[Long, String] =
    LogTable.snapshot(log, asOf).select("rid", "v")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("snapshot at txn1: base versions only") {
    assert(snap(1L) == Map(1L -> "a1", 2L -> "b1", 3L -> "c1"))
  }

  test("snapshot at txn2: sees the update") {
    assert(snap(2L) == Map(1L -> "a2", 2L -> "b1", 3L -> "c1"))
  }

  test("snapshot at txn3: tombstone removes rid 2") {
    assert(snap(3L) == Map(1L -> "a2", 3L -> "c1"))
  }

  test("snapshot at txn4: uncommitted txn invisible (rollback semantics)") {
    assert(snap(4L) == Map(1L -> "a2", 3L -> "c1"))
  }

  test("compaction keeps newest committed versions, drops tombstoned + uncommitted history") {
    val compacted = LogTable.compact(log, 4L)
    // entity rows: exactly the live set
    val live = compacted.filter(col("op") === LogTable.Upsert)
      .select("rid", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(live == Map(1L -> "a2", 3L -> "c1"))
    // snapshot of the compacted log equals snapshot of the full log
    val resnap = LogTable.snapshot(compacted, 4L).select("rid", "v")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(resnap == snap(4L))
  }
}
