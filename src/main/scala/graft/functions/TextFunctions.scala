package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis / dedup column builders for the training-data pipeline
  * extensions (the capability envelope beyond the reference's §2 surface).
  *
  * Every builder composes *native* Catalyst expressions (higher-order
  * array functions, regexp, md5) — no UDFs — so the whole pipeline stays
  * inside whole-stage codegen and is reproducible bit-for-bit in any ANSI
  * engine (the DuckDB oracle recomputes identical values).
  *
  * Hashing discipline: all content hashes derive from `md5(seed || text)`
  * with the first 15 hex chars parsed as a 60-bit non-negative long —
  * engine-portable (unlike xxhash/murmur whose seeds differ per engine)
  * and uniform enough for MinHash/SimHash statistics.
  *
  * Scale notes (100 TB): everything here is per-row (map-side, no
  * shuffle). The only shuffles in the downstream dedup pipelines are the
  * LSH band-key groupBy / self-join, which is the standard scalable
  * formulation (band key cardinality ~ n_docs × bands / bucket_size).
  */
object TextFunctions {

  /** Whitespace-collapsed, lower-cased canonical text. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Word array of the normalized text. */
  def words(text: Column): Column = split(normText(text), " ")

  /** Whitespace token count (as long, to match SQL BIGINT). */
  def tokenCount(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish token estimate: letter runs, single digits, single
    * non-alphanumeric marks — the standard cheap proxy for subword
    * count. This is the fast map-only ESTIMATE (x01, oracle-checked);
    * the real corpus-trained tokenizer is [[graft.ops.BpeOps]] (x62).
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast("long")

  /** Portable 60-bit content hash: first 15 hex chars of md5(seed||s). */
  def hash60(s: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed), s)), 1, 15), 16, 10).cast("long")

  /** `k`-word shingles of the normalized text, space-joined. Documents
    * shorter than `k` words yield an empty array (guarded: Spark's
    * `sequence(1, 0)` would otherwise produce a *descending* [1,0]).
    */
  def shingles(text: Column, k: Int): Column = {
    val ws = words(text)
    when(size(ws) >= k,
      transform(
        sequence(lit(1), size(ws) - (k - 1)),
        i => array_join(slice(ws, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** One MinHash value: min over shingles of hash60(seed_i || shingle);
    * -1 for shingle-less docs. `numHashes` of these form the signature.
    */
  def minhash(shingleCol: Column, seedIdx: Int): Column =
    coalesce(
      array_min(transform(shingleCol, s => hash60(s, s"mh$seedIdx|"))),
      lit(-1L))

  /** 60-bit SimHash over the word multiset: bit i is set iff the sum of
    * (+1 / -1) votes from each word-hash's bit i is positive. Near-dup
    * docs differ in few bits (hamming distance via bit_count(xor)).
    */
  def simhash(text: Column): Column = {
    val hashes = transform(words(text), w => hash60(w, "sh|"))
    // shiftright/shiftleft with a *column* shift amount need call_function
    // (the Scala helpers only accept Int literals).
    def shr(v: Column, i: Column) = call_function("shiftright", v, i)
    def shl(v: Column, i: Column) = call_function("shiftleft", v, i)
    aggregate(
      transform(
        sequence(lit(0), lit(59)),
        i =>
          when(
            aggregate(hashes, lit(0L),
              (acc, h) => acc + when(shr(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
              > 0,
            shl(lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc + b)
  }

  // ---- native fused forms (graft.plans.TextHashExpressions, registered
  // by GraftExtensions) — identical values, one JVM loop per row instead
  // of per-element interpreted HOF lambdas. Use these in hot paths.

  /** All `n` MinHash values over k-word shingles at once as array<long>
    * (≡ n × [[minhash]] over [[shingles]]); shingle strings never
    * materialize. */
  def minhashSigsFast(wordsCol: Column, k: Int, n: Int): Column =
    call_function("minhash_sigs", wordsCol, lit(k), lit(n))

  /** Sorted distinct hash60 set of k-word shingles — jaccard_sorted-ready
    * (≡ sort_array(array_distinct(hash60_all([[shingles]], "")))). */
  def shingleSetFast(wordsCol: Column, k: Int): Column =
    call_function("shingle_set", wordsCol, lit(k))

  /** Sorted distinct hash60 set of character n-grams. */
  def chargramSetFast(strCol: Column, n: Int): Column =
    call_function("chargram_set", strCol, lit(n))

  /** All `n` MinHash values over a PRECOMPUTED element set
    * (array<bigint> of 60-bit hashes, e.g. [[chargramSetFast]] /
    * [[shingleSetFast]] output) — the generalization of
    * [[minhashSigsFast]] to any set-valued column. Pure-arithmetic
    * affine permutations of the element hashes
    * ([[graft.plans.MinHashPerms]]): no further digests per element. */
  def minhashFromSetFast(setCol: Column, n: Int): Column =
    call_function("minhash_from_set", setCol, lit(n))

  /** Fused [[simhash]] (≡ simhash(text), native). */
  def simhashFast(text: Column): Column =
    call_function("simhash60", words(text))

  /** Element-wise hash60 with constant prefix (≡ transform(arr, hash60)). */
  def hash60AllFast(arr: Column, prefix: String): Column =
    call_function("hash60_all", arr, lit(prefix))

  /** Stopword-hit count against a fixed list (langid / quality). */
  def stopwordHits(wordArr: Column, stops: Seq[String]): Column =
    size(filter(wordArr, w => w.isin(stops.map(x => x: Any): _*))).cast("long")

  /** Tiny deterministic language-ID heuristic: argmax of stopword hits
    * per language, fixed priority order on ties, "und" when all zero.
    * (A real system swaps in character-n-gram profiles; the *shape* —
    * per-row score + argmax, no shuffle — is the 100 TB-relevant part.)
    */
  val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"))

  def langId(text: Column): Column = {
    val ws = words(text)
    val hits = langStops.map { case (lang, stops) => lang -> stopwordHits(ws, stops) }
    val maxHit = greatest(hits.map(_._2): _*)
    // fixed priority: first language reaching the max wins
    hits.foldRight(lit("und")) { case ((lang, h), els) =>
      when(maxHit > 0 && h === maxHit, lang).otherwise(els)
    }
  }
}
