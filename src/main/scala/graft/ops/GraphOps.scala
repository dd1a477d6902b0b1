package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph primitives for dedup-cluster resolution.
  *
  * The near-dup pair queries (MinHash-LSH x07, SimHash banding x23, IVF
  * cosine x22) emit *edges*; a dedup pipeline ultimately needs the
  * *components* — "these 17 documents are all the same article" — so the
  * keep/drop decision can pick one canonical per cluster instead of
  * per-pair (pairwise min-id dropping over-keeps on transitive chains:
  * a~b, b~c with a≁c keeps a AND c even though all three are one
  * cluster).
  */
object GraphOps {

  /** Connected components by iterative min-label propagation: every
    * node starts labeled with itself; each round a node adopts the
    * minimum label among itself and its neighbors; at fixpoint the label
    * is the component's minimum node id — the canonical document.
    *
    * Scale shape (100 TB): each propagation hop is one equi-join of the
    * edge list against the label table plus one groupBy-min — all
    * shuffles on uniform node ids, no driver-side data. The driver
    * holds only a per-round convergence WITNESS (the label sum, which
    * is monotone under min-propagation: unchanged ⟺ fixpoint — one tiny
    * aggregate, no diff join), the same control pattern as
    * Pregel/GraphX. Each round runs TWO hops between lineage
    * checkpoints; hops needed = component diameter; near-dup clusters
    * are shallow (dup clusters are
    * near-cliques), so a handful of rounds settles 100 TB corpora. For
    * adversarially long path graphs the published refinement is
    * large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce"), which converges in O(log n) rounds with
    * the same per-round join shape — the knob to swap in, not a plan
    * change.
    *
    * @param pairs edge list, one row per undirected edge
    * @param maxRounds hard iteration cap (2 hops per round)
    * @return (node, cluster_id) — one row per node that appears in any
    *         edge; cluster_id = min node id of the component
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxRounds: Int = 20): DataFrame = {
    val fwd = pairs.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
    val edges = fwd.unionByName(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint (eager) TRUNCATES LINEAGE each round — without it
    // the logical plan doubles per iteration (labels appears twice per
    // round) and planning itself blows up exponentially. On a cluster
    // with lineage-reliability needs, swap for reliable checkpoint()
    // (HDFS-backed); the algorithm is unchanged.
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("cluster_id", col("node"))
      .localCheckpoint(true)

    // labels only ever DECREASE (min-propagation is monotone), so the
    // label sum is a strictly-decreasing convergence witness: an
    // unchanged sum ⟺ fixpoint — one tiny aggregate on the cached
    // table per round instead of a join-based diff.
    // decimal sum: 64-bit ids over trillion-node graphs would overflow
    // a long sum
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head.getDecimal(0)
    // one propagation step: every node adopts the min label among
    // itself and its neighbors
    def step(l: DataFrame): DataFrame = {
      val prop = edges.join(l, edges("dst") === l("node"))
        .select(edges("src").as("node"), col("cluster_id"))
      l.unionByName(prop)
        .groupBy("node").agg(min(col("cluster_id")).as("cluster_id"))
    }
    // empty edge set: sum() over zero rows is null — no components to
    // resolve, return the (empty) label table without iterating
    var prevSum = labelSum(labels)
    var converged = prevSum == null
    var round = 0
    while (!converged && round < maxRounds) {
      // two steps per checkpoint: halves the per-round action overhead
      // (the lineage doubles per step, so only a constant number of
      // steps may run between checkpoints)
      val next = step(step(labels)).localCheckpoint(true)
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      round += 1
    }
    // labels is materialized as checkpoint blocks; the edge cache is no
    // longer needed (superseded blocks are dropped by the ContextCleaner
    // as their RDDs are garbage-collected)
    edges.unpersist()
    labels
  }
}
