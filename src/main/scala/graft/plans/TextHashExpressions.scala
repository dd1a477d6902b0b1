package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused forms of the md5-based text-hash pipeline
  * ([[graft.functions.TextFunctions]]): the declarative
  * `transform`/`aggregate` higher-order functions evaluate their lambda
  * per element *interpreted* — at sf0.1 the MinHash/SimHash pair queries
  * spent ~60s/70s in that dispatch. These expressions compute the exact
  * same values (same md5, same 60-bit hex-prefix parse, same fold order,
  * DuckDB-oracle-identical) in one JVM loop per row.
  *
  * All expressions implement real `doGenCode` (not CodegenFallback): the
  * generated code calls the kernel's static forwarder (`Md5Hash60` is a
  * top-level object, so `graft.plans.Md5Hash60.simhash60(...)` is a
  * plain static call from generated Java), or inlines the loop where it
  * is trivial (jaccard_sorted). That keeps the expression inside the
  * whole-stage-codegen span — no per-row interpreted dispatch, no
  * boxing, no fallback InternalRow copy — while the hot loop stays
  * JIT-compiled Scala. Constant arguments (k, n, seed prefixes) are
  * resolved once at plan time and attached via `addReferenceObj`.
  *
  * 60-bit hash contract (must match `conv(substring(md5(x),1,15),16,10)`
  * and DuckDB `('0x'||substring(md5(x),1,15))::BIGINT`): the first 15
  * hex chars of the md5 = big-endian u64 of digest bytes 0..7, shifted
  * right by one nibble.
  */
object Md5Hash60 {
  private val mdPool: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val Space = Array(' '.toByte)
  val EmptyPrefix: Array[Byte] = Array.emptyByteArray

  def hash(prefix: Array[Byte], s: UTF8String): Long = {
    val md = mdPool.get()
    md.reset()
    md.update(prefix)
    md.update(s.getBytes)
    digest60(md)
  }

  /** hash60 of the k-word shingle `words[start..start+k)` joined with a
    * single space — byte-identical to hashing
    * `array_join(slice(words, start+1, k), " ")` without materializing
    * the shingle string. */
  def hashShingle(prefix: Array[Byte], words: ArrayData, start: Int, k: Int): Long = {
    val md = mdPool.get()
    md.reset()
    md.update(prefix)
    var i = 0
    while (i < k) {
      if (i > 0) md.update(Space)
      md.update(words.getUTF8String(start + i).getBytes)
      i += 1
    }
    digest60(md)
  }

  private def digest60(md: MessageDigest): Long = {
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def prefixBytes(p: String): Array[Byte] = p.getBytes(StandardCharsets.UTF_8)

  // Memoized hash60 for SINGLE-string call sites (char-grams, words):
  // md5 is a pure function of the input bytes (prefix ++ s), and corpus
  // text is Zipfian — the same grams and words recur constantly (a
  // 4-char-gram universe is vocabulary-bounded), so a bounded
  // thread-local table short-circuits the digest for repeats. Cleared
  // wholesale when full — no LRU bookkeeping; a Zipfian workload refills
  // the hot set immediately. 32k entries ≈ 2 MB per task thread.
  // NOT used for streamed multi-word shingles (hashShingle): shingle
  // diversity is combinatorial, so a cache would mostly thrash, and
  // keying would force materializing the shingle string the streaming
  // digest exists to avoid.
  private val CacheBound = 1 << 15
  private val h60Cache: ThreadLocal[java.util.HashMap[String, java.lang.Long]] =
    ThreadLocal.withInitial(() =>
      new java.util.HashMap[String, java.lang.Long](CacheBound * 2))

  def hashCached(prefix: Array[Byte], s: UTF8String): Long = {
    // the key IS the md5 input (prefix ++ s). Decoded as ISO-8859-1 —
    // byte-bijective, so two DIFFERENT byte strings can never share a
    // key (UTF-8 decoding would fold all malformed sequences into
    // U+FFFD, and crawl-corpus "strings" are not guaranteed valid UTF-8)
    val sb = s.getBytes
    val key =
      if (prefix.isEmpty) new String(sb, StandardCharsets.ISO_8859_1)
      else {
        val all = java.util.Arrays.copyOf(prefix, prefix.length + sb.length)
        System.arraycopy(sb, 0, all, prefix.length, sb.length)
        new String(all, StandardCharsets.ISO_8859_1)
      }
    val c = h60Cache.get()
    val hit = c.get(key)
    if (hit ne null) hit.longValue()
    else {
      val h = hash(prefix, s)
      if (c.size() >= CacheBound) c.clear()
      c.put(key, h)
      h
    }
  }

  /** Sort + dedup in place semantics: returns sorted distinct copy. */
  def sortedDistinct(a: Array[Long]): Array[Long] = {
    if (a.isEmpty) return a
    java.util.Arrays.sort(a)
    var n = 1
    var i = 1
    while (i < a.length) {
      if (a(i) != a(n - 1)) { a(n) = a(i); n += 1 }
      i += 1
    }
    if (n == a.length) a else java.util.Arrays.copyOf(a, n)
  }

  // ---- expression kernels (static forwarders used by generated code)

  def minhashSigs(words: ArrayData, k: Int, n: Int,
      prefixes: Array[Array[Byte]]): ArrayData = {
    val nShingles = words.numElements() - (k - 1)
    if (nShingles <= 0) return new GenericArrayData(Array.fill(n)(-1L))
    val out = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < nShingles) {
      var i = 0
      while (i < n) {
        val h = hashShingle(prefixes(i), words, j, k)
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def shingleSet(words: ArrayData, k: Int): ArrayData = {
    val nShingles = words.numElements() - (k - 1)
    if (nShingles <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nShingles)
    var j = 0
    while (j < nShingles) {
      out(j) = hashShingle(EmptyPrefix, words, j, k)
      j += 1
    }
    new GenericArrayData(sortedDistinct(out))
  }

  def chargramSet(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    val nGrams = len - (n - 1)
    if (nGrams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      out(i) = hashCached(EmptyPrefix, s.substringSQL(i + 1, n))
      i += 1
    }
    new GenericArrayData(sortedDistinct(out))
  }

  def minhashFromSet(set: ArrayData, n: Int,
      a: Array[Long], b: Array[Long]): ArrayData = {
    val len = set.numElements()
    if (len == 0) return new GenericArrayData(Array.fill(n)(-1L))
    val M = MinHashPerms.M
    val out = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < len) {
      val h = set.getLong(j) % M
      var i = 0
      while (i < n) {
        val v = (a(i) * h + b(i)) % M
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def simhash60(words: ArrayData, prefix: Array[Byte]): Long = {
    val votes = new Array[Int](60)
    var j = 0
    val len = words.numElements()
    while (j < len) {
      val h = hashCached(prefix, words.getUTF8String(j))
      var i = 0
      while (i < 60) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var sh = 0L
    var i = 0
    while (i < 60) { if (votes(i) > 0) sh |= (1L << i); i += 1 }
    sh
  }

  def hash60All(strings: ArrayData, prefix: Array[Byte]): ArrayData = {
    val out = new Array[Long](strings.numElements())
    var j = 0
    while (j < out.length) {
      out(j) = hashCached(prefix, strings.getUTF8String(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_sigs(words, k, n)` → `array<bigint>`: the n MinHash values
  * over k-word shingles, min_s(hash60("mh<i>|" ++ s)); -1 per hash when
  * the doc has fewer than k words. Shingle strings are never
  * materialized — the digest streams word bytes + space separators. */
case class MinHashSigs(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType.isInstanceOf[ArrayType] &&
      first.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      second.dataType == IntegerType && second.foldable &&
      third.dataType == IntegerType && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "minhash_sigs expects (array<string> words, int k literal, int n literal)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  @transient private lazy val k = second.eval(null).asInstanceOf[Int]
  @transient private lazy val n = third.eval(null).asInstanceOf[Int]
  @transient private lazy val prefixes =
    (0 until n).map(i => Md5Hash60.prefixBytes(s"mh$i|")).toArray

  override def nullSafeEval(words: Any, kAny: Any, nAny: Any): Any =
    Md5Hash60.minhashSigs(words.asInstanceOf[ArrayData], k, n, prefixes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (words, _, _) => {
      val pref = ctx.addReferenceObj("mhPrefixes", prefixes, "byte[][]")
      s"${ev.value} = graft.plans.Md5Hash60.minhashSigs($words, $k, $n, $pref);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** The affine-permutation family behind [[MinHashFromSet]]:
  * v_i(x) = (a_i·(x mod M) + b_i) mod M over the Mersenne-free prime
  * M = largest prime < 2^30 — the standard universal-hashing MinHash
  * construction (one base hash per element, n cheap permutations;
  * cf. Broder '97). With a_i, x mod M < 2^30 the product stays < 2^60,
  * so the SAME arithmetic is exact in any engine's signed 64-bit
  * integers — the DuckDB mirror is literally
  * `(a_i*(x%M)+b_i)%M`. Coefficients derive deterministically from the
  * hash index via a splitmix-style mix, identical on both sides because
  * the oracle SQL is generated from THIS code. */
object MinHashPerms {
  val M: Long = 1073741789L // largest prime < 2^30

  /** (a, b) coefficient arrays for hash functions 0..n-1; a_i ∈ [1, M),
    * b_i ∈ [0, M). */
  def coeffs(n: Int): (Array[Long], Array[Long]) = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = Array.tabulate(n)(i => 1L + java.lang.Long.remainderUnsigned(mix(2L * i), M - 1))
    val b = Array.tabulate(n)(i => java.lang.Long.remainderUnsigned(mix(2L * i + 1), M))
    (a, b)
  }
}

/** `minhash_from_set(set, n)` → `array<bigint>`: the n MinHash values
  * over a PRECOMPUTED element set (`array<bigint>` of 60-bit hashes,
  * e.g. the output of `chargram_set` or `shingle_set`):
  * min_x((a_i·(x mod M) + b_i) mod M) per [[MinHashPerms]]; -1 per hash
  * for an empty set. The generalization of [[MinHashSigs]] to any
  * set-valued column. Unlike the md5-per-(element, hash) scheme this is
  * pure integer arithmetic — elements were already uniformized by the
  * set-builder's md5, so re-hashing per permutation buys nothing and
  * costs n digests per element. */
case class MinHashFromSet(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == LongType &&
      right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "minhash_from_set expects (array<bigint> set, int n literal)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_set"

  @transient private lazy val n = right.eval(null).asInstanceOf[Int]
  @transient private lazy val ab = MinHashPerms.coeffs(n)

  override def nullSafeEval(set: Any, nAny: Any): Any =
    Md5Hash60.minhashFromSet(set.asInstanceOf[ArrayData], n, ab._1, ab._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (set, _) => {
      val aRef = ctx.addReferenceObj("mhpA", ab._1, "long[]")
      val bRef = ctx.addReferenceObj("mhpB", ab._2, "long[]")
      s"${ev.value} = graft.plans.Md5Hash60.minhashFromSet($set, $n, $aRef, $bRef);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `shingle_set(words, k)` → sorted distinct `array<bigint>` of
  * hash60(k-word shingle) — the verify-set for LSH candidates, ready for
  * `jaccard_sorted`. ≡ sort_array(array_distinct(hash60_all(shingles))). */
case class ShingleSet(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "shingle_set expects (array<string> words, int k literal)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_set"

  @transient private lazy val k = right.eval(null).asInstanceOf[Int]

  override def nullSafeEval(words: Any, kAny: Any): Any =
    Md5Hash60.shingleSet(words.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (words, _) =>
      s"${ev.value} = graft.plans.Md5Hash60.shingleSet($words, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `chargram_set(str, n)` → sorted distinct `array<bigint>` of
  * hash60(character n-gram). ≡ the declarative
  * sort_array(array_distinct(hash60_all(substring-grams))). Character
  * semantics: code points (matches Spark/DuckDB `substring`). */
case class CharGramSet(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType &&
      right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "chargram_set expects (string, int n literal)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "chargram_set"

  @transient private lazy val n = right.eval(null).asInstanceOf[Int]

  override def nullSafeEval(str: Any, nAny: Any): Any =
    Md5Hash60.chargramSet(str.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, _) =>
      s"${ev.value} = graft.plans.Md5Hash60.chargramSet($str, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `simhash60(words)` → 60-bit SimHash: per-word hash60("sh|" ++ w),
  * ±1 votes per bit, bit set iff votes positive. */
case class SimHash60(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("simhash60 expects array<string>")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  @transient private lazy val prefix = Md5Hash60.prefixBytes("sh|")

  override def nullSafeEval(words: Any): Any =
    Md5Hash60.simhash60(words.asInstanceOf[ArrayData], prefix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, words => {
      val pref = ctx.addReferenceObj("shPrefix", prefix, "byte[]")
      s"${ev.value} = graft.plans.Md5Hash60.simhash60($words, $pref);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `jaccard_sorted(a, b)` → double: set Jaccard |a∩b| / |a∪b| of two
  * *sorted, distinct* `array<bigint>` columns via a single merge scan —
  * no per-pair hash-set allocation (`array_intersect`/`array_union`
  * build one per evaluation, the dominant cost of the brute-force
  * near-dup pair queries). Callers sort once map-side
  * (`sort_array(array_distinct(...))`); the pairwise join then does
  * O(n) comparisons per pair. The merge loop is inlined straight into
  * the generated code — it is the innermost loop of every pair query. */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "jaccard_sorted expects (array<bigint>, array<bigint>), sorted distinct")
  }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |int $union = $nx + $ny - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `hash60_all(strings, prefix)` → `array<bigint>`: element-wise hash60
  * with a constant seed prefix — the native form of
  * `transform(arr, s -> hash60(prefix ++ s))`. */
case class Hash60All(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      right.dataType == StringType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "hash60_all expects (array<string>, string literal)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash60_all"

  @transient private lazy val prefix =
    right.eval(null).asInstanceOf[UTF8String].getBytes.clone()

  override def nullSafeEval(strings: Any, p: Any): Any =
    Md5Hash60.hash60All(strings.asInstanceOf[ArrayData], prefix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (strings, _) => {
      val pref = ctx.addReferenceObj("h60Prefix", prefix, "byte[]")
      s"${ev.value} = graft.plans.Md5Hash60.hash60All($strings, $pref);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
