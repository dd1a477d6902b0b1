package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key mitigation for equi-joins — the explicit form of the skew
  * handling the rest of the library gets implicitly (AQE's skew-join
  * split only rebalances SORT-MERGE partitions; a hash aggregation or
  * a broadcast-ineligible join on a Zipfian key still funnels every
  * hot-key row through one task).
  *
  * The split-join pattern: route the top-K heaviest keys around the
  * shuffle entirely — their (tiny) build-side slice broadcasts, so hot
  * probe rows never co-locate — and let the cold remainder take the
  * normal shuffle path. Output is row-identical to the plain join
  * (x63 hash-checks it against a DuckDB oracle that knows nothing of
  * the split).
  *
  * 100 TB shape: `hotKeys` is one aggregation producing K rows (the
  * driver holds K key values, nothing data-sized); the hot build slice
  * is ≤K rows → broadcast; both probe-side filters are map-side
  * partition-local. Worst case (uniform keys, empty hot set) degrades
  * to exactly the plain join. The stopword joins (x51/x59) measured
  * sub-linear WITHOUT this ([[ScaleCheck]] — volume-bound, not
  * hot-key-bound), which is why they don't use it; this op is for the
  * corpora where the measurement says otherwise. */
object SkewOps {

  /** The `k` heaviest values of `keyCol`, heaviest first; weight =
    * row count, or `sum(weightCol)` when the frame is pre-aggregated
    * (one row per key carrying its mass). Deterministic tie-break
    * (weight desc, key asc). One aggregation + a K-row collect. */
  def hotKeys(df: DataFrame, keyCol: String, k: Int,
      weightCol: Option[String] = None): Seq[Any] = {
    val w = weightCol.map(c => sum(col(c))).getOrElse(count(lit(1)))
    df.groupBy(col(keyCol)).agg(w.as("__n"))
      .orderBy(col("__n").desc, col(keyCol).asc)
      .limit(k).collect().map(_.get(0)).toSeq
  }

  /** Inner equi-join on `key` with the `hot` keys taking a broadcast
    * path: `left ⋈ right` split into (hot probe ⋈ broadcast hot build)
    * ∪ (cold ⋈ cold). Row-identical to `left.join(right, Seq(key))`
    * for any `hot` (null keys never match an inner equi-join on either
    * path). `hot` must be small enough that the matching `right` slice
    * broadcasts — it comes from [[hotKeys]], so it is ≤K rows per
    * right-side key. */
  def hotColdJoin(left: DataFrame, right: DataFrame, key: String,
      hot: Seq[Any]): DataFrame = {
    // A null in `hot` (hotKeys keeps the null group, which can be the
    // heaviest) would poison the split: `key IN (null, …)` is NULL for
    // every non-hot key, and a bare `!isHot` filter rejects NULL — both
    // paths would drop all cold rows. Null keys never match an inner
    // equi-join anyway, so strip them from the hot set AND route
    // null-keyed rows down the cold path with a null-safe predicate.
    val hotKs = hot.filterNot(_ == null)
    if (hotKs.isEmpty) left.join(right, Seq(key))
    else {
      val isHot: Column = col(key).isInCollection(hotKs)
      val isCold: Column = !(isHot <=> true)
      left.filter(isHot)
        .join(broadcast(right.filter(isHot)), Seq(key))
        .unionByName(
          left.filter(isCold).join(right.filter(isCold), Seq(key)))
    }
  }
}
