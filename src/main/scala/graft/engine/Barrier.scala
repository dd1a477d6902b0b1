package graft.engine

import org.apache.spark.sql.DataFrame

/** Centralized plan barriers — the ONE place the engine truncates
  * lineage or blocks predicate pushdown, so the mechanism can be
  * switched per deployment instead of hard-coding
  * `localCheckpoint` at ~15 call sites.
  *
  * Two distinct contracts, two entry points:
  *
  *  - [[pushdownBarrier]] (lazy): stops Catalyst from substituting a
  *    heavy defining expression (chargram/shingle sets, simhash,
  *    md5-of-normalized-text) into a filter pushed below the frame —
  *    the r17 pathology where `isnotnull(simhash60(split(...)))` or
  *    `size(el_set) > 0` landed on the single-task scan side of a
  *    rebalance exchange and serialized the whole map phase. Lazy:
  *    construction stays job-free; the first action materializes.
  *  - [[lineageBarrier]] (eager): truncates the logical plan of
  *    iterative algorithms (k-means rounds, connected-components
  *    rounds, BPE merges) whose plan would otherwise double per round.
  *    Eager: runs a job now, returns a frame whose plan is a block scan.
  *
  * Mechanism switch (`SPARK_GRAFT_BARRIER`):
  *
  *  - `local` (default): `localCheckpoint` — blocks stored
  *    UNREPLICATED on executors, lineage gone. Right for local mode and
  *    for clusters with stable executors; an executor loss makes the
  *    job unrecoverable, and blocks stay pinned until unpersisted or
  *    swept (callers on preemptible executors: see `reliable`).
  *  - `reliable`: `Dataset.checkpoint` — blocks written to the
  *    configured checkpoint directory (HDFS/object store), recoverable
  *    across executor loss, compatible with dynamic allocation. Needs
  *    `spark.sparkContext.setCheckpointDir(...)` (or
  *    `spark.checkpoint.dir`) set by the deployment; we fail loudly at
  *    first use otherwise rather than silently degrading.
  *
  * The switch is read once per JVM (deployment-level property, not a
  * per-query knob).
  */
object Barrier {

  private lazy val mode: String =
    sys.env.getOrElse("SPARK_GRAFT_BARRIER", "local") match {
      case m @ ("local" | "reliable") => m
      case other =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_BARRIER must be 'local' or 'reliable', got '$other'")
    }

  /** Lazy pushdown barrier: Catalyst cannot push or substitute
    * predicates below the returned frame. No job runs at call time.
    * Storage note (`local` mode): once materialized, blocks are pinned
    * executor-local for the session with no automatic unpersist —
    * long-lived sessions should sweep (`getPersistentRDDs` /
    * `unpersist`) between unrelated jobs, as `graft.Bench` does. */
  def pushdownBarrier(df: DataFrame): DataFrame = mode match {
    case "reliable" => df.checkpoint(eager = false)
    case _          => df.localCheckpoint(eager = false)
  }

  /** Eager lineage truncation for iterative plans: runs a job NOW and
    * returns a frame whose plan is a scan of the materialized blocks.
    * Use for round-structured algorithms where the plan (and its
    * re-analysis cost) would otherwise grow per round. */
  def lineageBarrier(df: DataFrame): DataFrame = mode match {
    case "reliable" => df.checkpoint(eager = true)
    case _          => df.localCheckpoint(eager = true)
  }
}
