package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Abs, Add, And, BloomFilterMightContain, Expression, ExpressionInfo, GreaterThan, LessThan, Literal, Subtract}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Epsilon float equality, pushdown-friendly (SURVEY §1.2): the
  * reference defines Decimal equality as `|a - b| < 1e-6`
  * (reference: src/objects/object_field.rs:87-91). Written literally as
  * `abs(col - v) < eps`, the `abs` call blocks parquet filter pushdown;
  * this rule rewrites it into the equivalent open range
  * `col > v - eps AND col < v + eps`, which the parquet source accepts
  * (row-group min/max skipping at 100 TB).
  *
  * Semantics-preserving for all doubles: NaN fails both forms; ±Inf and
  * overflowing bounds degrade to always-false/always-true consistently.
  * Degenerate-rounding guard: when eps < ulp(v)/2 the bounds v±eps both
  * round to exactly v and the open range would wrongly exclude x == v
  * (which |x-v| < eps accepts) — such predicates are left unrewritten
  * (no pushdown, correct semantics).
  */
object EpsilonEqualityRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.BINARY_COMPARISON)) {
      case LessThan(Abs(Subtract(x, Literal(v: Double, DoubleType), f), _),
          Literal(eps: Double, DoubleType))
          if !x.foldable && v - eps < v && v + eps > v =>
        range(x, v, eps)
      case LessThan(Abs(Subtract(Literal(v: Double, DoubleType), x, f), _),
          Literal(eps: Double, DoubleType))
          if !x.foldable && v - eps < v && v + eps > v =>
        range(x, v, eps)
    }

  private def range(x: Expression, v: Double, eps: Double): Expression =
    And(
      GreaterThan(x, Literal(v - eps, DoubleType)),
      LessThan(x, Literal(v + eps, DoubleType)))
}

/** Engine extension point (SparkSessionExtensions): registers the
  * custom Catalyst pieces — the `cosine_sim` native expression and the
  * epsilon-equality pushdown rule. Installed by
  * [[graft.engine.GraftSession]]; also usable via
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (children: Seq[Expression]) =>
        MinHashSigs(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("minhash_from_set"),
      new ExpressionInfo(classOf[MinHashFromSet].getName, "minhash_from_set"),
      (children: Seq[Expression]) =>
        MinHashFromSet(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      (children: Seq[Expression]) => ShingleSet(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("chargram_set"),
      new ExpressionInfo(classOf[CharGramSet].getName, "chargram_set"),
      (children: Seq[Expression]) => CharGramSet(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (children: Seq[Expression]) => SimHash60(children(0))))
    ext.injectFunction((
      FunctionIdentifier("jaccard_sorted"),
      new ExpressionInfo(classOf[JaccardSorted].getName, "jaccard_sorted"),
      (children: Seq[Expression]) => JaccardSorted(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("hash60_all"),
      new ExpressionInfo(classOf[Hash60All].getName, "hash60_all"),
      (children: Seq[Expression]) => Hash60All(children(0), children(1))))
    // Spark's Bloom-filter sketch pair, surfaced as SQL functions. The
    // engine ships both expressions (they power runtime join pruning)
    // but registers neither; injecting them makes the map-side
    // set-membership prefilter a first-class query tool:
    //   bloom_filter_agg(h [, est_items [, num_bits]])  -> binary sketch
    //   might_contain(<scalar subquery sketch>, h)      -> boolean
    // might_contain requires its sketch input to be foldable or a
    // scalar subquery (Spark's own analysis rule), which is exactly the
    // broadcast-scalar shape the 100 TB plan wants: one tiny sketch
    // shipped to every scan task, corpus rows pruned before any join.
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c)       => new BloomFilterAggregate(c)
        case Seq(c, n)    => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          s"bloom_filter_agg takes 1-3 arguments, got ${children.length}")
      }))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[Expression]) =>
        BloomFilterMightContain(children(0), children(1))))
    ext.injectOptimizerRule(_ => EpsilonEqualityRewrite)
  }
}
