package graft

import org.apache.spark.sql.catalyst.expressions.{BRound, Cast, Expression, Round}
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}

/** Determinism audit for the round-12 failure class: a value produced
  * by `round(<raw IEEE double expr>, n)` and cast to DECIMAL sits one
  * ulp from flipping on a different DuckDB/libm build — the driver's
  * oracle environment resolved three such boundaries differently than
  * the local DuckDB and CORRECTNESS_r12 came back 171/174 with
  * rows+schema green and hash red (x98_doremi, x100_margin_mine,
  * x102_sem_decontaminate). The portable discipline is
  * [[graft.functions.ExactMath]]: quantize each double ONCE to BIGINT
  * micro-units (a single nearest-integer rounding both engines compute
  * identically), keep everything downstream in exact integer ops.
  *
  * This spec makes the fragile pattern impossible to reintroduce
  * silently: it walks the ANALYZED plan of every registered query and
  * flags any Cast(Round|BRound(double/float child, scale), DecimalType)
  * — the exact shape all three r12 reds shared. Queries that still
  * carry the pattern must be allowlisted HERE with a justification;
  * the allowlist is the audited debt register, and additions to it are
  * a review event, not a default.
  */
class RoundingAuditSpec extends SparkTestBase {

  /** Queries that retain a round(double)→DECIMAL in their plan, each
    * with why it is tolerated: every entry below has been DRIVER-green
    * (rows+schema+hash) in the shipped CORRECTNESS artifacts for at
    * least two rounds — their fixture values sit far from rounding
    * boundaries at the sf0.01 gate (BENCH_NOTES catalogs the sf0.1
    * ".xx5" near-misses on the same families). Shrinking this list by
    * migrating families to ExactMath micro-units is tracked debt;
    * GROWING it needs the same scrutiny the r12 postmortem applied.
    */
  private val allowlisted: Map[String, String] = Map.empty
  // EMPTY since round 13 retired every entry: the LM/KN scores, the NB
  // classifier, DSIR, the quality/entropy/drift/zipf diagnostics, BM25
  // terms, the sqrt mixtures, and the PCA projection all run on BIGINT
  // integer grids (graft.functions.ExactMath). Any future entry must
  // carry a justification the r12 postmortem would accept.

  private def fragile(e: Expression): Boolean = e match {
    case c: Cast if c.dataType.isInstanceOf[DecimalType] =>
      c.child match {
        case r: Round =>
          r.child.dataType == DoubleType || r.child.dataType == FloatType
        case r: BRound =>
          r.child.dataType == DoubleType || r.child.dataType == FloatType
        case _ => false
      }
    case _ => false
  }

  test("no unaudited round(double, n) -> DECIMAL anywhere in any registered query plan") {
    val flagged = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.analyzed
      var hit = false
      plan.foreach(node =>
        node.expressions.foreach(_.foreach(e => if (fragile(e)) hit = true)))
      hit
    }
    val unaudited = flagged.filterNot(allowlisted.contains)
    val stale = allowlisted.keySet -- flagged
    assert(unaudited.isEmpty,
      s"queries with a NEW round(double,n)->DECIMAL (the r12 hash-red " +
        s"class) — quantize to BIGINT micro-units via ExactMath " +
        s"instead, or allowlist with a justification: $unaudited")
    assert(stale.isEmpty,
      s"allowlist entries whose pattern is gone — delete them: $stale")
  }

  test("the three r12 hash-red queries emit no DECIMAL and no raw-double columns at all") {
    for (name <- Seq("x98_doremi", "x100_margin_mine",
        "x102_sem_decontaminate", "x103_doremi_mixture")) {
      val schema = SparkEntry.queries(name)(spark, sf).schema
      val bad = schema.fields.filter(f =>
        f.dataType.isInstanceOf[DecimalType] || f.dataType == DoubleType ||
          f.dataType == FloatType)
      assert(bad.isEmpty,
        s"$name must stay on the exact BIGINT grid, found: ${bad.toSeq}")
    }
  }
}
