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

  /** MinHash+LSH near-dup pairs: `numHashes` minhashes over
    * `shingleK`-word shingles, banded `bands` × (numHashes/bands);
    * candidates share a band key; verified with true shingle-set
    * Jaccard ≥ `threshold`. Output: (a_id, b_id, jac). */
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
    // Jaccard 0), so drop them before banding
    val sig = sig0.filter(size(col("el_set")) > 0).localCheckpoint(false)
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
    val sh = docs.select(col(idCol).as("doc_id"),
      TF.simhashFast(col(textCol)).as("sh"))
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

  /** Ingest-time dedup: keep only incoming rows whose content
    * fingerprint is absent from `existingFps` (a 1-column `fp` frame,
    * e.g. built from an MVCC snapshot). Output: incoming's id + fp. */
  def ingestFilter(incoming: DataFrame, existingFps: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    incoming.withColumn("fp", md5(TF.normText(col(textCol))))
      .join(existingFps, Seq("fp"), "left_anti")
      .select(col(idCol), col("fp"))
}
