package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.functions.{VectorFunctions => VF}

/** Custom Catalyst pieces installed via GraftExtensions: the codegen'd
  * cosine_sim expression and the epsilon-equality pushdown rule.
  */
class CatalystSpec extends SparkTestBase {

  test("cosine_sim is bit-identical to the declarative zip_with form") {
    val e = Catalog(spark, sf).table("embeddings")
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_e"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_e"))
    val pairs = a.crossJoin(b).filter(col("a_id") < col("b_id")).limit(2000)
    val diff = pairs
      .select(
        VF.cosineFast(col("a_e"), col("b_e")).as("fast"),
        VF.cosine(col("a_e"), col("b_e")).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0L)
  }

  test("cosine_sim survives whole-stage codegen (no fallback)") {
    val e = Catalog(spark, sf).table("embeddings")
    val df = e.select(VF.cosineFast(col("embedding"), col("embedding")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [cosine_sim"), plan)
    val self = df.filter(col("c") > 0.999999).count()
    assert(self == e.count(), "self-cosine must be ~1 for every row")
  }

  test("text-hash kernels are codegen'd, not CodegenFallback: generated code calls the static kernels") {
    import org.apache.spark.sql.execution.debug._
    import graft.functions.{TextFunctions => TF}
    val d = Catalog(spark, sf).table("documents")
    val df = d.select(
      TF.simhashFast(col("text")).as("sh"),
      TF.minhashSigsFast(TF.words(col("text")), 3, 8).as("mh"),
      TF.shingleSetFast(TF.words(col("text")), 3).as("ss"))
    val gen = codegenString(df.queryExecution.executedPlan)
    assert(gen.contains("graft.plans.Md5Hash60.simhash60"), gen.take(2000))
    assert(gen.contains("graft.plans.Md5Hash60.minhashSigs"), gen.take(2000))
    assert(gen.contains("graft.plans.Md5Hash60.shingleSet"), gen.take(2000))
    // the whole projection is inside one WholeStageCodegen span
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"),
      df.queryExecution.executedPlan.toString)
    // and it executes (Janino compiles the kernel calls)
    assert(df.count() > 0)
    // jaccard_sorted inlines its merge loop into the generated code
    val jdf = d.select(call_function("jaccard_sorted",
      TF.shingleSetFast(TF.words(col("text")), 3),
      TF.shingleSetFast(TF.words(col("text")), 3)).as("j"))
    val jgen = codegenString(jdf.queryExecution.executedPlan)
    assert(!jgen.contains("jaccard_sorted.eval"), "must not fall back to interpreted eval")
    assert(jdf.filter(col("j") > 0.999).count() == d.count(), "self-jaccard must be 1")
  }

  test("cosine_sim: mismatched-length arrays yield NULL (as the declarative form), not a prefix score") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)))
      .toDF("id", "a", "b")
      .select(col("id"), VF.cosineFast(col("a"), col("b")).as("c"))
    val rows = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!rows(1L) && rows(2L), rows.toString)
    // declarative twin agrees
    val decl = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(VF.cosine(col("a"), col("b")).as("c")).collect()
    assert(decl.head.isNullAt(0))
  }

  test("MinHashPerms: coefficients in range, deterministic, distinct across hash indexes") {
    val n = 64
    val (a, b) = graft.plans.MinHashPerms.coeffs(n)
    val M = graft.plans.MinHashPerms.M
    assert(a.forall(x => x >= 1 && x < M), "a_i must be in [1, M)")
    assert(b.forall(x => x >= 0 && x < M), "b_i must be in [0, M)")
    assert(a.distinct.length == n && b.distinct.length == n,
      "64 mixes colliding would mean a broken mixer")
    val (a2, b2) = graft.plans.MinHashPerms.coeffs(n)
    assert(a.sameElements(a2) && b.sameElements(b2), "must be deterministic")
    // the product bound the portable-arithmetic claim rests on
    assert(a.max * (M - 1) > 0 && a.max <= M - 1 && (M - 1) * (M - 1) > 0,
      "a_i*(x%M) must not overflow signed 64-bit")
  }

  test("minhash_from_set: affine perms over the element hashes; -1 signature for the empty set") {
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val df = Seq(
      (1L, Seq(7L, 99L, 1L << 59)),
      (2L, Seq.empty[Long])).toDF("id", "s")
      .select(col("id"), TF.minhashFromSetFast(col("s"), 4).as("mh"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val (a, b) = graft.plans.MinHashPerms.coeffs(4)
    val M = graft.plans.MinHashPerms.M
    val expected = (0 until 4).map(i =>
      Seq(7L, 99L, 1L << 59).map(x => (a(i) * (x % M) + b(i)) % M).min)
    assert(rows(1L) == expected, s"${rows(1L)} != $expected")
    assert(rows(2L) == Seq(-1L, -1L, -1L, -1L))
  }

  test("hashCached: memoized digests equal fresh md5 across prefix/string splits of one byte stream") {
    import org.apache.spark.unsafe.types.UTF8String
    // "ab"+"cd" and "abc"+"d" are the SAME md5 input — the cache keys by
    // the concatenation, so both must return the identical hash, from
    // cache or not, in any call order
    val h1 = graft.plans.Md5Hash60.hashCached(
      graft.plans.Md5Hash60.prefixBytes("ab"), UTF8String.fromString("cd"))
    val h2 = graft.plans.Md5Hash60.hashCached(
      graft.plans.Md5Hash60.prefixBytes("abc"), UTF8String.fromString("d"))
    val fresh = graft.plans.Md5Hash60.hash(
      graft.plans.Md5Hash60.prefixBytes(""), UTF8String.fromString("abcd"))
    assert(h1 == fresh && h2 == fresh)
    // eviction: blow far past the cache bound, then re-verify stability
    var i = 0
    while (i < 70000) {
      graft.plans.Md5Hash60.hashCached(
        graft.plans.Md5Hash60.EmptyPrefix, UTF8String.fromString(s"k$i"))
      i += 1
    }
    assert(graft.plans.Md5Hash60.hashCached(
      graft.plans.Md5Hash60.EmptyPrefix, UTF8String.fromString("abcd")) == fresh)
  }

  test("epsilon rewrite skips the degenerate case (eps below ulp(v)/2): exact match preserved") {
    import spark.implicits._
    val df = Seq(1e12, 2e12).toDF("x")
    // eps 1e-6 << ulp(1e12)/2: unrewritten form must still match x == 1e12
    val n = df.filter(VF.approxEqual(col("x"), lit(1e12), 1e-6)).count()
    assert(n == 1, s"exact match lost by degenerate epsilon rewrite (got $n)")
  }

  test("approxEqual(abs form) is rewritten to a pushdown-friendly range") {
    val li = Catalog(spark, sf).table("lineitem")
    val df = li.filter(VF.approxEqual(col("l_quantity"), lit(25.0), 0.5))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThan(l_quantity,24.5)") &&
      scan.contains("LessThan(l_quantity,25.5)"), scan)
    // semantics unchanged vs the un-rewritten predicate evaluated manually
    val expected = li.filter(col("l_quantity") > 24.5 && col("l_quantity") < 25.5).count()
    assert(df.count() == expected && expected > 0)
  }
}
