package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.functions.{TextFunctions => TF}
import graft.ops.{CorpusOps, GraphOps, TextDedup}

/** End-to-end training-data preparation pipeline — the composition a
  * real corpus build runs, chained through the graft.ops library API on
  * the fixture corpus:
  *
  *   near-dup pairs → components → cluster dedup decision →
  *   benchmark decontamination → sequence packing → epoch shuffle
  *
  * Each stage is individually oracle-checked (x07/x36/x41/x37/x38/x40);
  * this spec checks the stages COMPOSE: ids flow through, drop sets
  * apply cleanly, and conservation invariants hold end to end.
  */
class PipelineSpec extends SparkTestBase {

  test("corpus prep pipeline: dedup -> decontaminate -> pack -> shuffle composes with conserved rows") {
    val docs = Catalog(spark, sf).table("documents")
    val nDocs = docs.count()

    // 1. near-dup clusters -> transitive drop set
    val pairs = TextDedup.minhashLshPairs(docs)
    val drops = CorpusOps.clusterDedupDecision(
      GraphOps.connectedComponents(pairs))
    val deduped = docs.join(drops.select(col("drop_id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    val nDropped = drops.count()
    assert(deduped.count() == nDocs - nDropped, "dedup conserves rows")
    // every canonical survives its own decision
    assert(drops.join(deduped, drops("canonical_id") === deduped("doc_id"),
      "left_anti").isEmpty, "no canonical may be dropped")

    // 2. decontaminate vs the benchmark slice, then drop the benchmark
    //    docs themselves from the training pool
    val bench = deduped.filter(col("doc_id") % 5 === 0)
    val train = deduped.filter(col("doc_id") % 5 =!= 0)
    val contaminated = CorpusOps.decontaminate(train, bench, shingleK = 8)
    val clean = train.join(contaminated.select("doc_id"), Seq("doc_id"), "left_anti")
    assert(clean.count() == train.count() - contaminated.count())

    // 3. pack into 128-token sequences: token mass is conserved and
    //    offsets are gapless in id order
    val packed = CorpusOps.packSequences(clean, seqLen = 128)
    val totTokens = clean.select(sum(TF.tokenCount(col("text"))))
      .head.getLong(0)
    assert(packed.select(sum(col("n_tokens"))).head.getLong(0) == totTokens)
    val gapless = packed
      .withColumn("end", col("start_tok") + col("n_tokens"))
      .withColumn("next_start",
        lead(col("start_tok"), 1).over(
          org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
      .filter(col("next_start").isNotNull && col("next_start") =!= col("end"))
    assert(gapless.isEmpty, "token stream must be gapless in id order")

    // 4. epoch shuffle: a permutation (every clean doc exactly once)
    val shuffled = CorpusOps.epochShuffle(clean, nShards = 4, epoch = 1)
    assert(shuffled.count() == clean.count())
    assert(shuffled.select("doc_id").distinct().count() == clean.count())
    // downstream loader order: (shard, pos) is a dense unique key
    assert(shuffled.groupBy("shard", "pos").count()
      .filter(col("count") > 1).isEmpty)
  }
}
