package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    * adversarially long path graphs (crawl rings, boilerplate
    * gradients) use [[connectedComponentsStar]] — star contraction
    * converges in O(log² n) rounds regardless of diameter, with the
    * same per-round join shape.
    *
    * Hitting `maxRounds` without reaching the fixpoint RAISES
    * (IllegalStateException) — un-converged labels are silently wrong
    * cluster ids, never a value a dedup decision may act on.
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
      .transform(graft.engine.Barrier.lineageBarrier)

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
      val next = step(step(labels)).transform(graft.engine.Barrier.lineageBarrier)
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
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxRounds rounds " +
        s"(${2 * maxRounds} hops) — the graph has a component of diameter " +
        "> 2*maxRounds. Raise maxRounds, or use connectedComponentsStar " +
        "(O(log^2 n) rounds regardless of diameter).")
    labels
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14) — the diameter-independent form: converges
    * in O(log² n) rounds on ANY graph, where min-label propagation
    * ([[connectedComponents]]) needs O(diameter) hops. Use this for
    * adversarial shapes (crawl rings, long boilerplate-gradient
    * chains); the label-prop form is cheaper per round on the shallow
    * near-clique graphs dedup pipelines usually produce.
    *
    * Per round, on the canonical (lo < hi) distinct edge set:
    *  - large-star: every node u links each STRICTLY-GREATER neighbor
    *    to m(u) = min(N(u) ∪ {u}) — one groupBy-min + one equi-join;
    *  - small-star: orient edges at their larger endpoint (hi → lo);
    *    every center u links its smaller neighbors AND ITSELF to
    *    m(u) = min — same shape.
    * Both preserve connectivity; the combined fixpoint is the star
    * forest where every node points at its component minimum (the
    * canonical doc id). All shuffles are on uniform node-id keys; the
    * driver holds a 3-field witness per round. Each round's edge set is
    * `localCheckpoint`ed (lineage truncation — see
    * [[connectedComponents]]).
    *
    * Convergence detection: a (count, Σlo, Σhi) witness gates an exact
    * set-equality confirm (one left-anti probe, only run when the
    * witness matches — distinct sets of equal size are equal iff the
    * difference is empty). Hitting `maxRounds` raises, as in
    * [[connectedComponents]].
    *
    * @return (node, cluster_id) — one row per node that appears in any
    *         edge; cluster_id = min node id of the component. Identical
    *         contract (and spec-checked identical output) to
    *         [[connectedComponents]].
    */
  def connectedComponentsStar(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxRounds: Int = 50): DataFrame = {
    val raw = pairs.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
    // every endpoint is a node (self-loop-only nodes included: they are
    // their own singleton component, as in connectedComponents)
    val nodes = raw.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct().transform(graft.engine.Barrier.lineageBarrier)
    def canon(src: Column, dst: Column): Seq[Column] =
      Seq(least(src, dst).as("lo"), greatest(src, dst).as("hi"))
    var edges = raw.filter(col("src") =!= col("dst"))
      .select(canon(col("src"), col("dst")): _*)
      .distinct().transform(graft.engine.Barrier.lineageBarrier)

    // large-star: m(u) ≤ u < v for every emitted (v, m(u)) pair, so the
    // canonical orientation is immediate and self-loops are impossible
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("lo").as("src"), col("hi").as("dst"))
        .unionByName(e.select(col("hi").as("src"), col("lo").as("dst")))
      val mins = sym.groupBy("src").agg(min(col("dst")).as("mnd"))
        .select(col("src"), least(col("mnd"), col("src")).as("m"))
      sym.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("m").as("lo"), col("dst").as("hi"))
        .distinct()
    }
    // small-star: center = hi endpoint; all its neighbors here are
    // strictly smaller, so m = min(N(u)) ≤ every emitted node
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(col("hi").as("src"), col("lo").as("dst"))
      val mins = dir.groupBy("src").agg(min(col("dst")).as("m"))
      dir.join(mins, "src")
        .select(col("dst"), col("m"))
        .unionByName(mins.select(col("src").as("dst"), col("m")))
        .filter(col("dst") =!= col("m"))
        .select(col("m").as("lo"), col("dst").as("hi"))
        .distinct()
    }
    def witness(e: DataFrame): (Long, java.math.BigDecimal, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(col("lo").cast("decimal(38,0)")),
        sum(col("hi").cast("decimal(38,0)"))).head
      (r.getLong(0), r.getDecimal(1), r.getDecimal(2))
    }

    var w = witness(edges)
    var converged = w._1 == 0L // no non-loop edges: all singletons
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges)).transform(graft.engine.Barrier.lineageBarrier)
      val nw = witness(next)
      // distinct sets of equal witness are equal iff the one-sided
      // difference is empty; the anti probe runs only on witness match
      converged = nw == w && next.exceptAll(edges).head(1).isEmpty
      edges = next
      w = nw
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge within $maxRounds rounds " +
        "— raise maxRounds (O(log^2 n) rounds suffice for n nodes).")
    // fixpoint = star forest: every non-root appears exactly once as hi,
    // pointing at its component min; roots (and singletons) label
    // themselves
    nodes.join(edges.select(col("hi").as("node"), col("lo").as("cid")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("cid"), col("node")).as("cluster_id"))
  }
}
