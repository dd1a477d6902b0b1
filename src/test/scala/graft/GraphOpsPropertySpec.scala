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
}
