package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog

/** Sketch surface for approximate analytics at scale: HyperLogLog++
  * distinct counts and t-digest quantiles — constant memory per group,
  * one map-side-combinable pass, the 100 TB substitutes for exact
  * distinct/percentile. (No DuckDB oracle: sketch internals differ per
  * engine; correctness = bounded error vs the exact answer.)
  */
class SketchSpec extends SparkTestBase {

  private lazy val li = Catalog(spark, sf).table("lineitem")

  test("approx_count_distinct within its rsd bound of the exact count") {
    val exact = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), rsd = 0.02))
      .collect().head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.06, s"exact=$exact approx=$approx err=$err (3×rsd bound)")
  }

  test("approx_percentile brackets the exact median") {
    val exactMedian = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val approx = li.select(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .collect().head.getDouble(0)
    assert(math.abs(approx - exactMedian) / exactMedian < 0.02,
      s"exact=$exactMedian approx=$approx")
  }

  test("SketchOps.mgSummary: bounded size, undercount bound, heavy-hitter superset") {
    // k=2 over "a b c a b c a": every c arrival decrements the full
    // summary away; the survivor is a with residual 1 — undercounted by
    // 2 ≤ n/(k+1) = 7/3, and the only item above the n/(k+1) share (a,
    // count 3) IS in the summary.
    val out = graft.ops.SketchOps
      .mgSummary(2)(Iterator("a", "b", "c", "a", "b", "c", "a")).toMap
    assert(out == Map("a" -> 1L), out)
    // random-ish longer stream: size ≤ k and every residual ≤ true count
    val stream = (1 to 500).map(i => s"w${i % 13 % (1 + i % 7)}")
    val truth = stream.groupBy(identity).map { case (w, g) => w -> g.size }
    val mg = graft.ops.SketchOps.mgSummary(4)(stream.iterator).toMap
    assert(mg.size <= 4)
    mg.foreach { case (w, r) =>
      assert(r <= truth(w), s"$w residual $r > true ${truth(w)}")
      assert(truth(w) - r <= stream.size / 5,
        s"$w undercount ${truth(w) - r} breaks the n/(k+1) bound")
    }
  }

  test("SketchOps.heavyHitters: exact output, strict threshold, partition-invariant") {
    import spark.implicits._
    // a×30 b×10 c×5 + 15 singletons: N=60. k=5 → cnt·6 > 60 keeps only
    // a (b sits exactly ON the boundary: 10·6 = 60, strict > excludes).
    // k=11 → cnt·12 > 60 keeps a and b (c again exactly on it).
    val words = Seq.fill(30)("a") ++ Seq.fill(10)("b") ++
      Seq.fill(5)("c") ++ (1 to 15).map(i => s"s$i")
    for (parts <- Seq(1, 7)) {
      val df = words.toDF("w").repartition(parts)
      val k5 = graft.ops.SketchOps.heavyHitters(df, "w", k = 5)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(k5.toSeq == Seq(("a", 30L, 0.5)), s"parts=$parts: ${k5.toSeq}")
      val k11 = graft.ops.SketchOps.heavyHitters(df, "w", k = 11)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(k11 == Map("a" -> 30L, "b" -> 10L), s"parts=$parts: $k11")
    }
  }

  test("SketchOps property: MG bounds and exact heavy-hitter output on randomized skewed streams") {
    import spark.implicits._
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val k = 2 + rnd.nextInt(15)
      // Zipf-ish skew: item i drawn with weight ~ 1/(i+1)
      val vocab = 5 + rnd.nextInt(40)
      val weights = Array.tabulate(vocab)(i => 1.0 / (i + 1))
      val wSum = weights.sum
      val n = 200 + rnd.nextInt(800)
      val stream = Seq.fill(n) {
        var u = rnd.nextDouble() * wSum; var i = 0
        while (u > weights(i) && i < vocab - 1) { u -= weights(i); i += 1 }
        s"w$i"
      }
      val truth = stream.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      // MG single-pass bounds
      val mg = graft.ops.SketchOps.mgSummary(k)(stream.iterator).toMap
      assert(mg.size <= k, s"seed=$seed size ${mg.size} > k=$k")
      mg.foreach { case (w, r) =>
        assert(r <= truth(w), s"seed=$seed $w overcounted")
        assert(truth(w) - r <= n / (k + 1), s"seed=$seed $w undercount bound")
      }
      truth.foreach { case (w, c) =>
        if (c > n / (k + 1))
          assert(mg.contains(w), s"seed=$seed heavy $w missing from summary")
      }
      // distributed two-pass = brute force, at an arbitrary partitioning
      val parts = 1 + rnd.nextInt(8)
      val got = graft.ops.SketchOps
        .heavyHitters(stream.toDF("w").repartition(parts), "w", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = truth.filter { case (_, c) => c * (k + 1) > n }
      assert(got == want, s"seed=$seed k=$k parts=$parts: $got != $want")
    }
  }

  test("sketches merge across groups (partial aggregation shape)") {
    // per-flag sketches vs global: the merged global count must be >= any
    // per-group count and <= the sum (set-union semantics, mergeable state)
    val per = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("d"))
      .collect().map(_.getLong(1))
    val global = li.select(approx_count_distinct(col("l_partkey")))
      .collect().head.getLong(0)
    assert(per.forall(_ <= global * 1.05) && global <= per.sum)
  }

  test("SketchOps.cmSketch/cmEstimate: never undercounts, bucketwise-mergeable, partition-invariant") {
    import spark.implicits._
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(graft.functions.TextFunctions.words(col("text")))
        .as("word"))
    val exact = words.groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = graft.ops.SketchOps.cmSketch(words, "word")
    val est = graft.ops.SketchOps.cmEstimate(sk,
      words.select("word").distinct(), "word")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (w, c) =>
      assert(est(w) >= c, s"CM UNDERCOUNTED '$w': est ${est(w)} < true $c")
    }
    // deterministic given the seeds: a different physical layout yields
    // the identical sketch table (the merge/algebraic property)
    def skRows(df: org.apache.spark.sql.DataFrame) =
      graft.ops.SketchOps.cmSketch(df, "word").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(skRows(words) == skRows(words.repartition(13)),
      "sketch depends on partitioning")
    // bucketwise merge: sketch(A) + sketch(B) == sketch(A ∪ B)
    val a = words.limit(500); val b = words.exceptAll(a)
    val merged = graft.ops.SketchOps.cmSketch(a, "word")
      .unionByName(graft.ops.SketchOps.cmSketch(b, "word"))
      .groupBy("row", "bucket").agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == skRows(words), "bucketwise merge != whole-corpus sketch")
    // a value never seen still answers (with colliding mass only)
    val unseen = graft.ops.SketchOps.cmEstimate(sk,
      Seq("zzz_never_in_corpus").toDF("word"), "word").head().getLong(1)
    assert(unseen >= 0L)
  }

  test("cmEstimate derives the sketch's geometry; a mixed-width frame fails fast") {
    import spark.implicits._
    val df = Seq("a", "a", "a", "b").toDF("word")
    // NON-default geometry: if cmEstimate hashed with its old default
    // (4×64) against this 3×8 sketch, probes would miss buckets and the
    // never-undercount guarantee would break
    val sk = graft.ops.SketchOps.cmSketch(df, "word", depth = 3, width = 8)
    val est = graft.ops.SketchOps
      .cmEstimate(sk, Seq("a", "b").toDF("word"), "word")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") >= 3L && est("b") >= 1L,
      s"undercount against a non-default-geometry sketch: $est")
    val mixed = sk.unionByName(
      graft.ops.SketchOps.cmSketch(df, "word", depth = 3, width = 16))
    intercept[IllegalArgumentException] {
      graft.ops.SketchOps.cmEstimate(mixed, Seq("a").toDF("word"), "word")
    }
    // mixed DEPTH, same width: the extra row holds only one sketch's
    // mass, so min() over it would silently undercount — the per-row
    // total-mass gate must fail fast (same contract as the width gate)
    val mixedDepth = sk.unionByName(
      graft.ops.SketchOps.cmSketch(df, "word", depth = 4, width = 8))
    intercept[IllegalArgumentException] {
      graft.ops.SketchOps.cmEstimate(mixedDepth, Seq("a").toDF("word"),
        "word")
    }
    // ... while a well-formed same-geometry bucketwise merge (summed
    // counts, width carried through) still passes the gate
    val ok = sk.unionByName(
        graft.ops.SketchOps.cmSketch(df, "word", depth = 3, width = 8))
      .groupBy("row", "bucket")
      .agg(sum(col("cnt")).as("cnt"), min(col("width")).as("width"))
    val est2 = graft.ops.SketchOps
      .cmEstimate(ok, Seq("a").toDF("word"), "word").head().getLong(1)
    assert(est2 >= 6L, s"merged same-geometry sketch undercounted: $est2")
  }
}
