package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Corpus-trained byte-pair encoding (Sennrich et al., ACL 2016) — the
  * real subword tokenizer behind the `n_bpe` ESTIMATE x01 ships (a
  * regex proxy, `TextFunctions.bpeishCount`): learn the top-N merges
  * from the corpus's own word distribution, then tokenize by replaying
  * them.
  *
  * Scale shape (the part that matters at 100 TB): training NEVER
  * iterates over the corpus. One corpus pass builds the distinct-word
  * count table (vocab-sized — millions of rows where the corpus has
  * trillions of tokens); every merge round is an aggregation over that
  * table (adjacent symbol pairs weighted by word count → argmax), and
  * applying the chosen merge is a vocab-sized map. Tokenization is the
  * same trick: the merge replay runs once per DISTINCT word, and
  * per-document counts come from an equi-join of the (doc, word) grain
  * against the tokenized vocab — the corpus is scanned once for word
  * counts and once for the join, never per merge round.
  *
  * Determinism: the argmax tie-break is total (count desc, then left
  * asc, right asc), so the learned merge table is a pure function of
  * the corpus — reproducible across runs, partitionings, and cluster
  * sizes, and replayable by any independent implementation (OpsSpec
  * pins the distributed trainer against a naive single-node reference).
  *
  * The driver-side loop holds only N merge rules (the convergence
  * witnesses); per-round frames are eagerly checkpointed — the
  * documented iterative-loop contract ([[GraphOps]]): without lineage
  * truncation the plan doubles per round and planning OOMs.
  */
object BpeOps {

  /** One learned merge: apply in `rank` order; `left`+`right` concat
    * into the merged symbol. */
  final case class Merge(rank: Int, left: String, right: String)

  /** Greedy left-to-right, non-overlapping replay of ONE merge rule
    * over a symbol array — the classic BPE pass, as a native fold
    * (stays inside codegen; no UDF):
    * acc ends with `l` and the next symbol is `r` → replace the tail
    * with the merged symbol, else append. Non-overlap falls out of the
    * fold: the merged symbol `l||r` no longer equals `l` (r nonempty),
    * so a fresh `l` must arrive before the rule can fire again. */
  def applyMerge(syms: Column, l: String, r: String): Column = {
    val lLit = lit(l); val rLit = lit(r)
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lLit && x === rLit,
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(lLit, rLit))))
          .otherwise(concat(acc, array(x))))
  }

  /** Replay a whole merge table (rank order) over a symbol array. The
    * expression nests one fold per merge — run it on the DISTINCT-word
    * table, not the corpus. */
  def applyMerges(syms: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(syms)((c, m) => applyMerge(c, m.left, m.right))

  /** Distinct-word count table — the training input (and the frame
    * tokenization joins against): one corpus pass, vocab-sized output. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TF.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Learn up to `numMerges` merges from the corpus. Stops early when
    * no adjacent pair occurs more than once (merging a unique pair
    * learns nothing). Returns the merges in application order.
    *
    * Round-loop storage contract: each round's symbol table is
    * `persist`ed (NOT localCheckpoint — the plan chain here is a
    * LINEAR projection stack, so there is no lineage explosion to
    * truncate, and Dataset.unpersist actually frees a persisted
    * frame's blocks where it is a no-op on a checkpointed one). The
    * argmax action of round k materializes words(k), after which
    * words(k-1) is unpersisted — at any moment at most two vocab-sized
    * tables hold blocks, and train() exits with ZERO blocks pinned. */
  def train(docs: DataFrame, textCol: String = "text",
      numMerges: Int = 32): Seq[Merge] = {
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var words = wordCounts(docs, textCol)
      .select(col("cnt"), split(col("w"), "").as("syms"))
      .persist(level)
    var prev: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      var rank = 0
      var done = false
      while (rank < numMerges && !done) {
        val top = words
          .select(col("cnt"), explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        // words(k) is materialized by the action above: the superseded
        // round's blocks can be freed without forcing a recompute
        if (prev != null) { prev.unpersist(false); prev = null }
        if (top.isEmpty || top.head.getLong(2) < 2) done = true
        else {
          val (l, r) = (top.head.getString(0), top.head.getString(1))
          merges += Merge(rank, l, r)
          prev = words
          words = prev
            .select(col("cnt"), applyMerge(col("syms"), l, r).as("syms"))
            .persist(level)
          rank += 1
        }
      }
      merges.toSeq
    } finally {
      if (prev != null) prev.unpersist(false)
      words.unpersist(false)
    }
  }

  /** Persist a learned merge table as parquet — the train-once /
    * tokenize-forever form: training is paid once per corpus
    * generation (like the signature index, [[TextDedup
    * .writeSignatureIndex]]), and every later tokenization replays the
    * stored merges. 16–32k rows of (rank, left, right) — driver-tiny. */
  def writeMerges(spark: org.apache.spark.sql.SparkSession, path: String,
      merges: Seq[Merge]): Unit =
    spark.createDataFrame(merges)
      .select(col("rank"), col("left"), col("right"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Reload a [[writeMerges]] table, in application order. */
  def readMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Merge] =
    spark.read.parquet(path).orderBy(col("rank"))
      .collect().map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .toSeq

  /** Per-document BPE token counts under a learned merge table:
    * (doc_id, n_words, n_bpe). The merge replay runs once per DISTINCT
    * word; documents join against it on the word key. */
  def tokenCounts(docs: DataFrame, merges: Seq[Merge],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val perDocWord = docs
      .select(col(idCol).as("doc_id"), explode(TF.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
    val vocabToks = perDocWord.select(col("w")).distinct()
      .select(col("w"),
        size(applyMerges(split(col("w"), ""), merges)).cast("long").as("n_sub"))
    perDocWord.join(vocabToks, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("n_sub")).as("n_bpe"))
  }
}
