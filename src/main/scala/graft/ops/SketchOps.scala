package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Bounded-state frequency sketching — the mergeable-summary tier of
  * the corpus-analytics stack (WIMBD-style "what's in my big data"
  * token audits run exactly this shape at web scale).
  *
  * The exact heavy-hitter pipeline here is the classic two-pass form:
  * a per-partition Misra–Gries summary (capacity `k`, O(k) state per
  * task regardless of input size) proposes a candidate set that
  * PROVABLY contains every item with true count > N/(k+1) — by
  * pigeonhole some partition holds more than its share n_p/(k+1) of a
  * global heavy hitter, and MG's undercount bound (≤ n_p/(k+1))
  * guarantees a positive residual there — then a broadcast-pruned
  * exact recount replaces the sketch estimates with true counts and an
  * INTEGER threshold comparison (cnt·(k+1) > N, no float boundary)
  * emits exactly the true heavy hitters. The result is therefore
  * partition-order and partition-count INVARIANT even though each MG
  * summary individually is not.
  */
object SketchOps {

  /** Per-partition Misra–Gries: ≤ `k` (item, residual) rows out,
    * residual undercounts the partition-local true count by at most
    * n_p/(k+1). Package-visible for the property spec. */
  private[graft] def mgSummary(k: Int)(
      it: Iterator[String]): Iterator[(String, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    while (it.hasNext) {
      val w = it.next()
      m.get(w) match {
        case Some(c) => m.update(w, c + 1)
        case None if m.size < k => m.update(w, 1L)
        case None =>
          // decrement-all step: k+1 distinct items each lose one count
          val dead = List.newBuilder[String]
          m.foreach { case (key, c) =>
            if (c == 1L) dead += key else m.update(key, c - 1)
          }
          dead.result().foreach(m.remove)
      }
    }
    m.iterator.map { case (w, c) => (w, c) }
  }

  /** EXACT heavy hitters of `valueCol` in `rows`: every value whose
    * count satisfies cnt·(k+1) > N (strictly more than an N/(k+1)
    * share), with its exact count and 6-decimal corpus fraction.
    *
    * 100 TB shape: pass 1 is map-only (O(k) task state) into a
    * summary union of ≤ k·partitions rows — never a corpus-sized
    * shuffle; the candidate set (≤ k·partitions values) broadcasts
    * back and PRUNES pass 2's recount shuffle to candidate-matched
    * rows only, so the one groupBy moves a candidates-grain volume,
    * not the corpus' value-grain. The 1-row total-count frame rides a
    * broadcast (allowlisted scalar BNLJ, the x85 shape). Contrast with
    * the naive `groupBy(value).count.filter`: that shuffles the FULL
    * value-grain — at heavy skew exactly the grain AQE has to split —
    * to keep mostly rows the filter then discards. */
  def heavyHitters(rows: DataFrame, valueCol: String,
      k: Int = 64): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val vals = rows.select(col(valueCol).cast("string").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ds: Dataset[String] = vals.as[String]
    val cand = ds.mapPartitions(mgSummary(k))
      .toDF("v", "residual")
      .select(col("v")).distinct()
    val total = vals.groupBy().agg(count(lit(1)).as("n_total"))
    vals.join(broadcast(cand), Seq("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * (k + 1) > col("n_total"))
      .select(col("v").as(valueCol), col("cnt"),
        round(col("cnt").cast("double") /
          col("n_total").cast("double"), 6).as("frac"))
  }
}
