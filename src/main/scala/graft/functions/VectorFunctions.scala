package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity column builders over `array<float>` embedding
  * columns — native higher-order functions only (zip_with + aggregate),
  * codegen-friendly, no UDFs.
  *
  * Determinism: elements are cast to double *before* multiply/accumulate
  * and summed strictly left-to-right (Catalyst `aggregate` semantics), so
  * any engine that folds the same way (DuckDB's list_aggregate does)
  * reproduces the value bit-for-bit; results surfaced to the correctness
  * harness are additionally rounded to absorb representation drift.
  *
  * Scale notes (100 TB): cosine is per-pair map-side work. What decides
  * scalability is pair *generation*:
  *   - brute-force top-k = crossJoin — correct baseline, O(n·q);
  *   - the scale path buckets vectors first (sign-LSH here, IVF with
  *     learned centroids in production) so the join is equi on bucket id
  *     — a plain shuffle-hash join Catalyst handles at any n.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Fused native form of [[cosine]] — the codegen'd custom Expression
    * ([[graft.plans.CosineSimilarity]], registered as `cosine_sim` by
    * GraftExtensions). Bit-identical to the declarative form (same
    * float→double widening and fold order), one loop, no intermediate
    * array allocation.
    */
  def cosineFast(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Epsilon float equality — the reference's Decimal `==` semantics
    * (reference object_field.rs:87-91: |a-b| < 1e-6). The literal `abs`
    * form is rewritten to a pushdown-friendly range by
    * [[graft.plans.EpsilonEqualityRewrite]].
    */
  def approxEqual(a: Column, b: Column, eps: Double = 1e-6): Column =
    abs(a - b) < lit(eps)

  /** Axis-sign LSH bucket key: the sign bits of the first `nBits`
    * coordinates packed into a string key. Crude but deterministic and
    * engine-portable; production swaps in random hyperplanes from a
    * broadcast seed matrix — the join shape (equi on bucket) is identical.
    */
  def signBucket(a: Column, nBits: Int): Column =
    array_join(
      transform(slice(a, 1, nBits), x => when(x >= 0f, lit("1")).otherwise(lit("0"))),
      "")
}
