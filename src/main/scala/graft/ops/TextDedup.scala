package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Parameterized corpus-dedup operations — the library API behind the
  * `x04`/`x07`/`x23`/`x32` demo queries ([[graft.ExtensionQueries]]):
  * callers bring their own DataFrame and column names; the fixture
  * queries are these ops applied to the test tables.
  *
  * All ops follow the scale recipe: map-side signatures → equi
  * self-join on a band/bucket key (never a data-sized block) → cheap
  * verify. Self-joins are aliased over ONE subtree so the signature
  * work and its shuffle are computed once (ReusedExchange) with a
  * shuffle_hash hint (AQE would otherwise broadcast the fat side).
  */
object TextDedup {

  /** Exact dedup: one hash-groupBy on the normalized-content hash.
    * Output: (content_hash, keep_id = min id, n_copies). */
  def exact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(md5(TF.normText(col(textCol))).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Content-defined chunk dedup — the insertion-robust sibling of the
    * fixed-window chunker (x35): chunk boundaries are picked by
    * CONTENT (a word `w` closes a chunk iff hash60("cdc|"+w) mod
    * `modulus` = 0 — expected chunk length `modulus` words; the doc
    * end always closes the final chunk), so inserting or deleting a
    * word reshapes only the ONE chunk it lands in, while every chunk
    * after it re-aligns and keeps deduplicating — a fixed-stride
    * chunker shifts every downstream window and loses them all. This
    * is the rolling-hash/CDC idea backup and dedup storage systems run
    * (gear/Rabin chunking), applied at word grain so both engines
    * reproduce it exactly. Output mirrors x35:
    * (chunk_fp, keep_doc, keep_chunk, n_sites) per distinct chunk,
    * keep = lexicographic min (doc_id, chunk_idx).
    *
    * 100 TB shape: chunking is entirely MAP-SIDE array work inside
    * whole-stage codegen (boundary scan + slice per doc — no window,
    * no per-word explode/shuffle); the only shuffle is the final
    * chunk-fingerprint groupBy (uniform md5 keys, map-side partial
    * agg), identical to x35's. */
  def cdcChunkDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", modulus: Int = 8): DataFrame =
    cdcChunkFps(
      docs.select(col(idCol).as("doc_id"), TF.words(col(textCol)).as("ws")),
      modulus)
      .groupBy(col("chunk_fp"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("keep"),
        count(lit(1)).as("n_sites"))
      .select(col("chunk_fp"), col("keep.doc_id").as("keep_doc"),
        col("keep.chunk_idx").as("keep_chunk"), col("n_sites"))

  /** The chunking half of [[cdcChunkDedup]] as a reusable frame
    * transform: input is any frame with a `ws` word-array column;
    * output keeps every OTHER input column and adds (chunk_idx,
    * chunk_fp) — one row per content-defined chunk. Shared by the
    * batch dedup and the streaming ingest gate so the two can never
    * disagree on what a chunk is. Entirely map-side. */
  private[graft] def cdcChunkFps(toks: DataFrame,
      modulus: Int): DataFrame = {
    val isB = (w: Column) => TF.hash60(w, "cdc|") % modulus === 0
    val withN = toks.withColumn("__n", size(col("ws")))
    // ascending boundary positions; append n only when the last word
    // is not itself a boundary (keeps the list duplicate-free without
    // an order-fragile distinct)
    val bnds = concat(
      filter(sequence(lit(1), col("__n")),
        i => isB(element_at(col("ws"), i))),
      when(isB(element_at(col("ws"), -1)), array().cast("array<int>"))
        .otherwise(array(col("__n"))))
    withN
      .withColumn("__bnds", bnds)
      .withColumn("__c", explode(transform(col("__bnds"), (b, j) =>
        struct(j.cast("long").as("chunk_idx"),
          concat_ws(" ", slice(col("ws"),
            when(j === 0, lit(1))
              .otherwise(element_at(col("__bnds"), j) + 1),
            b - when(j === 0, lit(0))
              .otherwise(element_at(col("__bnds"), j))))
            .as("chunk_text")))))
      .withColumn("chunk_idx", col("__c.chunk_idx"))
      .withColumn("chunk_fp", md5(col("__c.chunk_text")))
      .drop("ws", "__n", "__bnds", "__c")
  }

  /** Bag-of-words dedup — the permutation-invariant tier between
    * [[exact]] (byte-identical) and MinHash (set-based, count-blind):
    * the fingerprint is the hash of the SORTED word multiset, so docs
    * that are word-order shuffles of one another — templated spam and
    * machine-scrambled boilerplate routinely are — collapse into one
    * group while genuinely different docs sharing vocabulary (same
    * set, different counts) do not. Exact-dup groups are a strict
    * subset of bag groups by construction. Output mirrors [[exact]]:
    * (bag_hash, keep_id = min id, n_copies). One map + one
    * hash-groupBy — x04's plan with a sort_array in the key. */
  def bagDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(md5(concat_ws(" ",
        sort_array(TF.words(col(textCol))))).as("bag_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash+LSH near-dup pairs: `numHashes` minhashes over
    * `shingleK`-word shingles, banded `bands` × (numHashes/bands);
    * candidates share a band key; verified with true shingle-set
    * Jaccard ≥ `threshold`. Output: (a_id, b_id, jac).
    * ([[planBands]] derives the banding from the threshold when the
    * caller doesn't want to pick it.) */
  def minhashLshPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleK: Int = 3, numHashes: Int = 8,
      bands: Int = 4, threshold: Double = 0.8): DataFrame = {
    val sigs = TF.minhashSigsFast(TF.words(col(textCol)), shingleK, numHashes)
    val sets = TF.shingleSetFast(TF.words(col(textCol)), shingleK)
    bandJoinVerify(docs.select(col(idCol).as("doc_id"),
      sets.as("el_set"), sigs.as("mh")), numHashes, bands, threshold)
  }

  /** [[minhashLshPairs]] generalized to a PRECOMPUTED element-set column
    * (sorted distinct `array<bigint>`, e.g.
    * [[graft.functions.TextFunctions.chargramSetFast]] output) — the
    * banded scale path for any set-similarity family (char-gram Jaccard,
    * token sets, ...), not just word shingles. Same plan shape: map-side
    * signatures, equi band join, merge-scan Jaccard verify. */
  def minhashLshPairsFromSets(docs: DataFrame, idCol: String = "doc_id",
      setCol: String = "el_set", numHashes: Int = 8, bands: Int = 4,
      threshold: Double = 0.8): DataFrame =
    bandJoinVerify(docs.select(col(idCol).as("doc_id"),
      col(setCol).as("el_set"),
      TF.minhashFromSetFast(col(setCol), numHashes).as("mh")),
      numHashes, bands, threshold)

  /** Shared LSH core: band the minhash signature, equi self-join on the
    * band key, verify true set Jaccard. `sig` columns: doc_id,
    * el_set (sorted distinct array<bigint>), mh (array<bigint>, length
    * numHashes).
    *
    * Plan shape (the element sets are the FAT payload — a char-gram set
    * is ~n_chars longs — so they must never ride the band explode):
    *  1. materialize (doc_id, el_set, mh) once (LAZY `localCheckpoint`;
    *     it feeds the band join and both verify sides — without it,
    *     column pruning re-runs the scan + signature hashing per
    *     consumer). Lazy means constructing the returned DataFrame stays
    *     side-effect-free (explain/dry-run usage runs no job); the
    *     signature scan materializes on the FIRST action and its blocks
    *     stay pinned for the session (executor-local, no lineage —
    *     callers running on preemptible executors should persist the
    *     signature frame themselves with MEMORY_AND_DISK and pass it
    *     through [[minhashLshPairsFromSets]]);
    *  2. self-join SLIM (doc_id, band, key) rows — one aliased subtree,
    *     its exchange shuffles ~3 small columns × `bands` rows/doc;
    *  3. `distinct()` the candidate id pairs BEFORE verification (a true
    *     near-dup pair collides in several bands; verify it once);
    *  4. join the element sets back by id for the Jaccard verify — the
    *     fat arrays move once per side (AQE broadcasts the candidate
    *     side when it is small, so commonly they don't move at all).
    */
  /** Band key expressions over a minhash signature column (`bands`
    * strings, each joining its `numHashes / bands` signature rows) —
    * the LSH bucket space. Shared by the batch band join
    * ([[bandJoinVerify]]) and the streaming bucket keying
    * ([[graft.streaming.EventStreams.minhashLshPairsStream]]) so the
    * two paths can never disagree on which docs collide. */
  def minhashBandKeyExprs(mh: Column, numHashes: Int,
      bands: Int): Seq[Column] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rpb = numHashes / bands
    (0 until bands).map(b =>
      concat_ws(":", (0 until rpb).map(r =>
        element_at(mh, rpb * b + r + 1)): _*))
  }

  private def bandJoinVerify(sig0: DataFrame, numHashes: Int, bands: Int,
      threshold: Double): DataFrame = {
    // docs with an EMPTY element set all share the degenerate all--1
    // signature — banding them would funnel every such doc into one
    // quadratic bucket; they can never verify anyway (empty sets have
    // Jaccard 0), so drop them before banding.
    // Filter AFTER the checkpoint boundary, not inside its lineage:
    // inside, the predicate is pushed below the caller's rebalance
    // exchange and below the signature projection, substituting the
    // heavy set expression into the filter — the whole
    // chargram/shingle hashing then runs a second time on the
    // UNREBALANCED scan side (one task on a single-row-group source)
    // just to evaluate `size(...) > 0`. Past the checkpoint the filter
    // reads the materialized array — one cheap comparison per row.
    // (r17 profile, x43: a 1.8 s single-task stage ahead of the 0.35 s
    // 32-task signature stage; gone after this reorder.)
    val sig = graft.engine.Barrier.pushdownBarrier(sig0)
      .filter(size(col("el_set")) > 0)
    val slim = sig.select(col("doc_id"),
      posexplode(array(minhashBandKeyExprs(col("mh"), numHashes, bands): _*))
        .as(Seq("band", "key")))
    val cand = slim.as("a").join(slim.as("b").hint("shuffle_hash"),
      col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    cand
      .join(sig.select(col("doc_id").as("a_id"), col("el_set").as("a_set")), "a_id")
      .join(sig.select(col("doc_id").as("b_id"), col("el_set").as("b_set")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(call_function("jaccard_sorted", col("a_set"), col("b_set")), 4)
          .as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** (bit shift, width) decomposition of the 60-bit simhash into
    * `nChunks` near-equal chunks (wider chunks first). */
  def simhashChunksN(nChunks: Int): Seq[(Int, Int)] = {
    val base = 60 / nChunks
    val widths = Seq.tabulate(nChunks)(i => if (i < 60 % nChunks) base + 1 else base)
    widths.scanLeft(0)(_ + _).zip(widths)
  }

  /** (bit shift, width) decomposition of the 60-bit simhash into
    * `maxHamming + 1` chunks — the pigeonhole guarantee: any pair
    * within `maxHamming` differing bits shares at least one identical
    * chunk. Shared by the batch pair-join ([[simhashBandedPairs]]) and
    * the streaming bucket state
    * ([[graft.streaming.EventStreams.nearDupPairsStream]]). */
  def simhashChunks(maxHamming: Int): Seq[(Int, Int)] = simhashChunksN(maxHamming + 1)

  /** Pigeonhole-exact SimHash banding (Manku et al., WWW'07): the
    * 60-bit simhash splits into `maxHamming + 1` chunks, so any pair
    * within `maxHamming` shares ≥ 1 identical chunk — exact candidate
    * generation, equi-join only. Output: (a_id, b_id, hamming).
    *
    * `pairKeys = true` is the extreme-scale refinement (Manku WWW'07
    * §3.1.1's multi-block keys): split into `maxHamming + 2` chunks and
    * key each doc by every CHUNK PAIR — C(maxHamming+2, 2) keys/doc of
    * roughly DOUBLE the bit width. The pigeonhole guarantee re-derives:
    * ≤ `maxHamming` differing bits corrupt at most `maxHamming` of the
    * `maxHamming + 2` chunks, so at least TWO chunks stay identical —
    * and that surviving pair of chunks is one of the emitted keys, so
    * every true pair still collides (exact, same output). What changes
    * is bucket cardinality: for maxHamming=6, 28 keys of ~15 bits
    * (2^15-ary buckets) instead of 7 keys of ~8.6 bits — expected
    * candidate volume per corpus drops ~2^6-2^7× (sum over keys of
    * n_k²/|buckets|), the difference between a workable and a quadratic
    * candidate join at billion-doc corpora. The single-chunk form stays
    * the default: at moderate scale its 7 slim explode rows/doc beat
    * the pair form's 28. */
  /** Banding key expressions over a simhash column: single-chunk values
    * (`maxHamming + 1` keys, the pigeonhole default) or chunk-PAIR
    * values (`C(maxHamming+2, 2)` keys of ~double width, the
    * extreme-scale form — see [[simhashBandedPairs]]). Shared by the
    * batch band join and the streaming bucket keying
    * ([[graft.streaming.EventStreams.nearDupPairsStream]]) so the two
    * paths can never disagree on the bucket space. */
  def simhashKeyExprs(sh: Column, maxHamming: Int,
      pairKeys: Boolean): Seq[Column] = {
    def cval(c: (Int, Int)): Column = c match {
      case (off, w) =>
        shiftrightunsigned(sh, off).bitwiseAND(lit((1L << w) - 1))
    }
    if (!pairKeys) simhashChunks(maxHamming).map(cval)
    else {
      val chunks = simhashChunksN(maxHamming + 2)
      for {
        i <- 0 until chunks.size
        j <- (i + 1) until chunks.size
      } yield shiftleft(cval(chunks(i)), chunks(j)._2)
        .bitwiseOR(cval(chunks(j)))
    }
  }

  def simhashBandedPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 6,
      pairKeys: Boolean = false): DataFrame = {
    val keyExprs = simhashKeyExprs(col("sh"), maxHamming, pairKeys)
    // Pushdown barrier below the band self-join: the join's implicit
    // isnotnull(cval) null-filters otherwise push below the caller's
    // rebalance exchange with the chunk expression SUBSTITUTED — i.e.
    // the full simhash (a per-word 60-bit vote aggregate) re-evaluated
    // on the un-rebalanced single scan split of each side, the x43
    // pushdown pathology with simhash in place of chargrams. Past the
    // barrier the filter reads the materialized sh column. Lazy:
    // construction stays job-free. Storage caveat (same as
    // [[bandJoinVerify]]'s): in the default local mode the signature
    // blocks stay pinned executor-local for the session once
    // materialized — callers on preemptible executors should switch
    // the barrier mode or persist the signature frame themselves
    // (see [[graft.engine.Barrier]]).
    val sh = graft.engine.Barrier.pushdownBarrier(docs.select(
      col(idCol).as("doc_id"), TF.simhashFast(col(textCol)).as("sh")))
    val chunked = sh.select(col("doc_id"), col("sh"),
      posexplode(array(keyExprs: _*)).as(Seq("chunk", "cval")))
    chunked.as("a").join(chunked.as("b").hint("shuffle_hash"),
      col("a.chunk") === col("b.chunk") && col("a.cval") === col("b.cval") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Near-dup keep/drop DECISION from any verified pair set
    * ((a_id, b_id) with a_id < b_id): drop every doc that has a
    * lower-id verified near-duplicate; canonical = the lowest such id.
    * One groupBy on the dropped id — the step that turns pair lists
    * (minhashLshPairs / simhashBandedPairs) into the thing a cleaning
    * pipeline acts on. */
  def dedupDecision(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("b_id").as("drop_id"))
      .agg(min(col("a_id")).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Choose the (bands, rowsPerBand) split of a `numHashes`-hash MinHash
    * signature for a target Jaccard `threshold` — the executable form of
    * the LSH S-curve rule (Leskovec/Rajaraman/Ullman, "Mining of Massive
    * Datasets" ch. 3.4): a pair with true similarity `s` becomes a
    * candidate with probability P(s) = 1 - (1 - s^r)^b, and the best
    * banding puts the curve's rise at the threshold. Minimizes the
    * expected selection error under a uniform similarity prior —
    * false-positive area ∫₀ᵗ P(s) ds (candidates below the threshold
    * that verification must pay to reject) plus false-negative area
    * ∫ᵗ¹ (1 − P(s)) ds (true near-dups LSH never surfaces; verification
    * can't recover these) — over all divisor pairs b·r = numHashes.
    * Returns (bands, rowsPerBand).
    *
    * Callers trading candidate volume against recall at fixed hashes
    * can weight the two areas: `fnWeight` > 1 biases toward recall
    * (more bands), < 1 toward fewer candidates. */
  def planBands(numHashes: Int, threshold: Double,
      fnWeight: Double = 1.0): (Int, Int) = {
    require(numHashes > 0, "numHashes must be positive")
    require(threshold > 0 && threshold < 1, "threshold must be in (0, 1)")
    require(fnWeight > 0, "fnWeight must be positive")
    val n = 2000
    def err(b: Int): Double = {
      val r = numHashes / b
      var fp = 0.0; var fn = 0.0
      var i = 0
      while (i < n) {
        val s = (i + 0.5) / n
        val p = 1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)
        if (s < threshold) fp += p else fn += 1.0 - p
        i += 1
      }
      (fp + fnWeight * fn) / n
    }
    val b = (1 to numHashes).filter(numHashes % _ == 0).minBy(err)
    (b, numHashes / b)
  }

  /** Single-column LSH bucket keys: each band's key string prefixed
    * with its band ordinal (`"<band>:<sig rows>"`), so one string column
    * carries the whole (band, key) identity. Derived from
    * [[minhashBandKeyExprs]] — the index write path and the probe path
    * share this, so a persisted index and a later probe can never
    * disagree on the bucket space. */
  def minhashBucketKeys(mh: Column, numHashes: Int, bands: Int): Column =
    array(minhashBandKeyExprs(mh, numHashes, bands).zipWithIndex.map {
      case (k, b) => concat_ws(":", lit(b), k)
    }: _*)

  /** Persist a near-dup SIGNATURE INDEX over a corpus — the incremental
    * path for ingest-time near-dedup: hash the 100 TB historical corpus
    * ONCE, then dedup each arriving batch against the stored signatures
    * without touching (or re-shuffling) the history again. Two bucketed
    * tables under `cat` ([[graft.catalog.Catalog.writeBucketed]], with
    * the cross-session sidecar restore):
    *
    *  - `<name>_bands` (bkey, doc_id) BUCKETED BY bkey — the exploded
    *    LSH bucket membership, `bands` slim rows per doc. Bucketing by
    *    bkey means a probe join on bkey never shuffles the index side:
    *    the scan's output partitioning already satisfies the join.
    *  - `<name>_sets` (doc_id, el_set) BUCKETED BY doc_id — the shingle
    *    sets for the Jaccard verify, fetched by candidate id with the
    *    index side again shuffle-free.
    *
    * The reference's dedup surface is whole-corpus
    * (`src/query/` batch scans); the index form is the lake-engine
    * upgrade: the build cost (one corpus pass + two bucketed writes) is
    * paid once per corpus generation, and per-batch probe cost scales
    * with the BATCH, not the corpus. */
  def writeSignatureIndex(cat: graft.catalog.Catalog, name: String,
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 3, numHashes: Int = 8, bands: Int = 4,
      buckets: Int = 64): Unit = {
    // one corpus pass computes sets + signatures; the lazy checkpoint
    // materializes on the first write and is reused by the second
    val sig = docs.select(col(idCol).as("doc_id"),
      TF.shingleSetFast(TF.words(col(textCol)), shingleK).as("el_set"),
      TF.minhashSigsFast(TF.words(col(textCol)), shingleK, numHashes).as("mh"))
      .filter(size(col("el_set")) > 0) // degenerate empty-set docs can't verify
      .transform(graft.engine.Barrier.pushdownBarrier)
    // rows carry their write generation (per-table counters) — the
    // delete tier's graves kill only gens <= their own, so a deleted
    // doc can be RE-INGESTED by a plain append, no compaction
    cat.writeBucketed(s"${name}_bands",
      sig.select(col("doc_id"),
        explode(minhashBucketKeys(col("mh"), numHashes, bands)).as("bkey"))
        .withColumn("gen", lit(cat.nextGen(s"${name}_bands"))),
      buckets, Seq("bkey"))
    cat.writeBucketed(s"${name}_sets",
      sig.select(col("doc_id"), col("el_set"))
        .withColumn("gen", lit(cat.nextGen(s"${name}_sets"))),
      buckets, Seq("doc_id"))
  }

  /** Dedup an incoming batch against a [[writeSignatureIndex]] index:
    * signature the batch (map-side), probe the stored bucket table on
    * the single bkey column, verify candidates with true Jaccard against
    * the stored shingle sets. Output: (in_id, match_id, jac) — every
    * verified (incoming doc, historical doc) near-dup match.
    *
    * Scale shape: the index side of BOTH joins is bucketed on the join
    * key, so the historical corpus never re-shuffles — only the batch
    * (small) moves. Same hash family + bucket keys as the write path
    * ([[minhashBucketKeys]]), so probe and index agree by construction. */
  def dedupAgainstIndex(cat: graft.catalog.Catalog, name: String,
      incoming: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 3, numHashes: Int = 8, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val sig = incoming.select(col(idCol).as("in_id"),
      TF.shingleSetFast(TF.words(col(textCol)), shingleK).as("in_set"),
      TF.minhashSigsFast(TF.words(col(textCol)), shingleK, numHashes).as("mh"))
      .filter(size(col("in_set")) > 0)
      // feeds the probe and the verify join back
      .transform(graft.engine.Barrier.pushdownBarrier)
    val probe = sig.select(col("in_id"),
      explode(minhashBucketKeys(col("mh"), numHashes, bands)).as("bkey"))
    val liveBands =
      cat.minusTombstones(s"${name}_bands", cat.bucketedTable(s"${name}_bands"))
    val liveSets =
      cat.minusTombstones(s"${name}_sets", cat.bucketedTable(s"${name}_sets"))
    val cand = probe.join(liveBands, Seq("bkey"))
      .select(col("in_id"), col("doc_id").as("match_id"))
      .distinct() // a true match collides in several bands; verify once
    cand
      .join(liveSets
        .select(col("doc_id").as("match_id"), col("el_set")), Seq("match_id"))
      .join(sig.select(col("in_id"), col("in_set")), Seq("in_id"))
      .select(col("in_id"), col("match_id"),
        round(call_function("jaccard_sorted", col("in_set"), col("el_set")), 4)
          .as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** Keep/drop decision over [[dedupAgainstIndex]] matches: an incoming
    * doc with ANY verified historical near-dup is dropped in favor of
    * its lowest-id match. Output: (in_id, canonical_id, n_matches). */
  def indexDedupDecision(matches: DataFrame): DataFrame =
    matches.groupBy(col("in_id"))
      .agg(min(col("match_id")).as("canonical_id"),
        count(lit(1)).as("n_matches"))

  /** Append a batch's signatures into an existing
    * [[writeSignatureIndex]] index ([[graft.catalog.Catalog
    * .appendBucketed]] on both tables — bucket layout preserved, no
    * existing data rewritten). The batch pass is shared by the two
    * appends via one lazy checkpoint. */
  def appendToSignatureIndex(cat: graft.catalog.Catalog, name: String,
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 3, numHashes: Int = 8, bands: Int = 4): Unit = {
    val sig = docs.select(col(idCol).as("doc_id"),
      TF.shingleSetFast(TF.words(col(textCol)), shingleK).as("el_set"),
      TF.minhashSigsFast(TF.words(col(textCol)), shingleK, numHashes).as("mh"))
      .filter(size(col("el_set")) > 0)
      .transform(graft.engine.Barrier.pushdownBarrier)
    cat.appendBucketed(s"${name}_bands",
      sig.select(col("doc_id"),
        explode(minhashBucketKeys(col("mh"), numHashes, bands)).as("bkey"))
        .withColumn("gen", lit(cat.nextGen(s"${name}_bands"))))
    cat.appendBucketed(s"${name}_sets",
      sig.select(col("doc_id"), col("el_set"))
        .withColumn("gen", lit(cat.nextGen(s"${name}_sets"))))
  }

  /** Delete documents from a [[writeSignatureIndex]] index: their ids
    * land in BOTH bucketed tables' tombstone sidecars (bands + sets —
    * each table compacts independently, so each carries its own
    * grave list), [[dedupAgainstIndex]] anti-joins them from this
    * moment on (a deleted historical doc stops flagging incoming
    * near-dups), and [[compactSignatureIndex]] makes the delete
    * physical. The index-tier mirror of [[graft.mvcc.LogTable]]'s
    * tombstone semantics, closing the loop with the x82 flow: a doc
    * the MVCC dedup application tombstones can now leave the
    * signature index without a rebuild. */
  def deleteFromSignatureIndex(cat: graft.catalog.Catalog, name: String,
      ids: DataFrame, idCol: String = "doc_id"): Unit = {
    // An existing `gen` column (captured at enqueue time) is honored
    // verbatim for BOTH sidecars — the bands/sets counters are minted
    // in lock-step by build/append, so one captured value names the
    // same write on each; see CorpusOps.stampGraveGen for why this
    // makes replayed deletes idempotent under interleaved re-ingest.
    def stamped(tbl: String): DataFrame =
      if (ids.columns.contains("gen"))
        ids.select(col(idCol).cast("long").as("doc_id"),
          col("gen").cast("long").as("gen")).distinct()
      else
        ids.select(col(idCol).cast("long").as("doc_id")).distinct()
          .withColumn("gen", lit(cat.currentGen(tbl)))
    cat.addTombstones(s"${name}_bands", stamped(s"${name}_bands"))
    cat.addTombstones(s"${name}_sets", stamped(s"${name}_sets"))
  }

  /** Physical delete + small-file maintenance for a signature index:
    * tombstone-aware [[graft.catalog.Catalog.compactBucketed]] on both
    * tables. Returns total file-count savings. */
  def compactSignatureIndex(cat: graft.catalog.Catalog,
      name: String): Int = {
    val saved = cat.compactBucketed(s"${name}_bands") +
      cat.compactBucketed(s"${name}_sets")
    // streaming ingest (graft.streaming.EventStreams.nearDupIngestStream)
    // accumulates one hwm marker row per micro-batch — fold to one here
    cat.collapseHwm(s"${name}_hwm")
    saved
  }

  /** One ingest step of the incremental near-dedup loop — the
    * production shape of corpus maintenance: probe the batch against
    * the index ([[dedupAgainstIndex]] → [[indexDedupDecision]]), then
    * append the KEPT docs' signatures so later batches dedup against
    * them too ([[appendToSignatureIndex]]). Returns the decisions
    * (in_id, canonical_id, n_matches) — every flagged batch doc with
    * its historical canonical.
    *
    * EAGER: the decisions are materialized (eager checkpoint) before
    * the append — the probe must see the index WITHOUT the batch in it
    * (otherwise every batch doc would match its own just-appended
    * signature), so this call runs jobs rather than returning a lazy
    * plan. Intra-batch duplicates are NOT resolved here (neither doc is
    * in the index yet, so neither is flagged and both are appended) —
    * run a batch-level pass first ([[exact]] / [[dedupDecision]]) when
    * batches can self-collide, the same split the MVCC ingest stream
    * makes (graft.streaming.EventStreams.ingestDedupToLog dedups within
    * the batch before the log anti-join). */
  def ingestNearDup(cat: graft.catalog.Catalog, name: String,
      batch: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 3, numHashes: Int = 8, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val decisions = indexDedupDecision(
      dedupAgainstIndex(cat, name, batch, idCol, textCol,
        shingleK, numHashes, bands, threshold))
      // materialize BEFORE the index gains the batch
      .transform(graft.engine.Barrier.lineageBarrier)
    val kept = batch.join(
      decisions.select(col("in_id").as(idCol)), Seq(idCol), "left_anti")
    appendToSignatureIndex(cat, name, kept, idCol, textCol,
      shingleK, numHashes, bands)
    decisions
  }

  /** Ingest-time dedup: keep only incoming rows whose content
    * fingerprint is absent from `existingFps` (a 1-column `fp` frame,
    * e.g. built from an MVCC snapshot). Output: incoming's id + fp. */
  def ingestFilter(incoming: DataFrame, existingFps: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    incoming.withColumn("fp", md5(TF.normText(col(textCol))))
      .join(existingFps, Seq("fp"), "left_anti")
      .select(col(idCol), col("fp"))
}
