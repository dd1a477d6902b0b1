package graft.dsl

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}

import graft.conditions.Condition

/** Reference entry point B — the declarative `Query<Item>`
  * (reference: src/query/mod.rs:30-55): accumulate `Condition`s, then
  * collect into typed structs. In the reference, `filter` normalizes and
  * stores conjuncts but `collect()` ignores them entirely
  * (query/mod.rs:52-54 — the planner embryo never wired). Here the same
  * surface is complete: each condition is CNF-normalized, compiled to a
  * Catalyst `Column`, and pushed into the scan by the optimizer.
  */
final case class TypedQuery[T <: Product](
    private val df: DataFrame,
    private val conds: Seq[Condition])(implicit enc: Encoder[T]) {

  /** Accumulate a conjunct (normalized, as the reference does on entry —
    * query/mod.rs:39-50). */
  def filter(c: Condition): TypedQuery[T] = copy(conds = conds :+ c.normalize)

  /** The typed dataset: conjuncts ANDed into the plan, fields projected
    * positionally-tolerantly (≡ serde deserialize, §2.1 #10). */
  def ds: Dataset[T] = {
    val filtered = conds.foldLeft(df)((d, c) => d.filter(c.column))
    Q(filtered).as[T]
  }

  def collect(): Array[T] = ds.collect()
  def count(): Long = ds.count()
}

object TypedQuery {
  def apply[T <: Product: Encoder](
      catalog: graft.catalog.Catalog, table: String): TypedQuery[T] =
    TypedQuery[T](catalog.table(table), Nil)
}
