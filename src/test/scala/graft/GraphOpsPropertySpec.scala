package graft

/** Property-style check of distributed connected components: over
  * randomized graphs (seeded, reproducible), the Pregel-style
  * min-label propagation in [[graft.ops.GraphOps]] must produce
  * exactly the components of a trivially-correct in-memory union-find.
  * Graph shapes are drawn to stress the iteration: sparse edges over a
  * node range produce long path fragments (deep propagation), dense
  * ranges produce near-cliques (wide fan-in).
  */
class GraphOpsPropertySpec extends SparkTestBase {

  import spark.implicits._

  private final class UnionFind(n: Int) {
    private val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    def union(a: Int, b: Int): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    /** min node id of x's component (parents always point to smaller
      * ids, so the root IS the minimum). */
    def canonical(x: Int): Int = find(x)
  }

  test("connectedComponents matches brute-force union-find on randomized graphs") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val nNodes = 30 + rnd.nextInt(40)
      val nEdges = 10 + rnd.nextInt(50)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      val uf = new UnionFind(nNodes)
      edges.foreach { case (a, b) => uf.union(a.toInt, b.toInt) }
      val expected = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        .map(n => n -> uf.canonical(n.toInt).toLong).toMap

      val got = graft.ops.GraphOps
        .connectedComponents(edges.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed nodes=$nNodes edges=$nEdges")
    }
  }

  test("connectedComponentsStar matches union-find on randomized graphs (self-loops included)") {
    for (seed <- 11 to 16) {
      val rnd = new scala.util.Random(seed)
      val nNodes = 30 + rnd.nextInt(40)
      val nEdges = 10 + rnd.nextInt(50)
      // keep self-loops: singleton components must surface as themselves
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
      val uf = new UnionFind(nNodes)
      edges.foreach { case (a, b) => uf.union(a.toInt, b.toInt) }
      val expected = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        .map(n => n -> uf.canonical(n.toInt).toLong).toMap

      val got = graft.ops.GraphOps
        .connectedComponentsStar(edges.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed nodes=$nNodes edges=$nEdges")
    }
  }

  test("star contraction converges on a long path in O(log n) rounds; label-prop raises at its cap") {
    // 300-node chain: diameter 299. Label-prop does 2 hops/round — a
    // 5-round cap reaches only 10 hops and MUST raise (silently wrong
    // labels are the failure mode being bought out). Star contraction
    // is diameter-independent: 12 rounds ≪ 299 must fully converge.
    val chain = (0L until 299L).map(i => (i, i + 1))
    val df = chain.toDF("a_id", "b_id")
    val ex = intercept[IllegalStateException] {
      graft.ops.GraphOps.connectedComponents(df, maxRounds = 5)
    }
    assert(ex.getMessage.contains("did not converge"))
    val labels = graft.ops.GraphOps.connectedComponentsStar(df, maxRounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 300 && labels.forall(_._2 == 0L))
  }

  test("both component algorithms agree on the fixture near-dup pair graph") {
    val pairs = SparkEntry.queries("x07_minhash_lsh_pairs")(spark, sf)
    val a = graft.ops.GraphOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = graft.ops.GraphOps.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
