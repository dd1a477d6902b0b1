package graft

/** Property-style check of the positional-index probe family
  * ([[graft.ops.CorpusOps.searchPhrase]] exact adjacency,
  * [[graft.ops.CorpusOps.searchPhraseSlop]] ordered gaps,
  * [[graft.ops.CorpusOps.searchProximity]] order-free window): over
  * randomized corpora (seeded, reproducible) and randomized probes,
  * each index-served result must EXACTLY equal an in-memory brute
  * force over the tokenized documents — corpus shapes the fixture
  * doesn't cover (empty docs, single-word docs, heavy repetition of a
  * tiny vocabulary, probes of absent words) and the cross-op
  * invariants (slop 0 ≡ exact phrase; a phrase match implies a
  * proximity match at window = phrase span).
  */
class PositionalPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def toks(t: String): Array[String] =
    t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** positions (1-based) of `w` in `ws` */
  private def posOf(ws: Array[String], w: String): Seq[Int] =
    ws.zipWithIndex.collect { case (x, i) if x == w => i + 1 }.toSeq

  private def bruteProximity(docs: Seq[(Long, String)],
      terms: Seq[String], window: Int): Map[Long, Long] =
    docs.flatMap { case (id, t) =>
      val ws = toks(t)
      val poss = terms.map(posOf(ws, _))
      if (poss.exists(_.isEmpty)) None
      else {
        // all tuples (one position per term) — corpora are small here
        val tuples = poss.foldLeft(Seq(Seq.empty[Int])) { (acc, ps) =>
          acc.flatMap(tp => ps.map(tp :+ _))
        }
        val spans = tuples.map(tp => tp.max - tp.min + 1)
          .filter(_ <= window)
        if (spans.isEmpty) None else Some(id -> spans.min.toLong)
      }
    }.toMap

  /** anchors p0 that begin an IN-ORDER match with total stretch ≤ slop */
  private def bruteSlop(docs: Seq[(Long, String)], phrase: Seq[String],
      slop: Int): Map[Long, Long] = {
    def completes(ws: Array[String], rest: Seq[String], prev: Int,
        limit: Int): Boolean =
      rest.isEmpty || posOf(ws, rest.head)
        .exists(p => p > prev && p <= limit &&
          completes(ws, rest.tail, p, limit))
    docs.flatMap { case (id, t) =>
      val ws = toks(t)
      val anchors = posOf(ws, phrase.head).count(p0 =>
        completes(ws, phrase.tail, p0, p0 + phrase.size - 1 + slop))
      if (anchors == 0) None else Some(id -> anchors.toLong)
    }.toMap
  }

  test("phrase/slop/proximity probes equal brute force on randomized corpora") {
    val vocab = Array("ant", "bee", "cat", "dog", "elk")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      val docs: Seq[(Long, String)] = (1L to (8 + rnd.nextInt(8)).toLong)
        .map(id => id -> Array.fill(rnd.nextInt(18))(
          vocab(rnd.nextInt(vocab.length))).mkString(" "))
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_posprop$seed").toString
      val cat = graft.catalog.Catalog(spark, dir)
      graft.ops.CorpusOps.writePositionalPostings(cat, "ppost",
        docs.toDF("doc_id", "text"))
      def m(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (trial <- 1 to 6) {
        // phrase may repeat words ("zzz" probes the absent-word path)
        val extended = vocab :+ "zzz"
        val m0 = 1 + rnd.nextInt(3)
        val phrase = Seq.fill(m0)(extended(rnd.nextInt(extended.length)))
        val slop = rnd.nextInt(4)
        assert(m(graft.ops.CorpusOps.searchPhraseSlop(
          cat, "ppost", phrase, slop)) == bruteSlop(docs, phrase, slop),
          s"slop mismatch seed=$seed trial=$trial phrase=$phrase slop=$slop")
        assert(m(graft.ops.CorpusOps.searchPhrase(cat, "ppost", phrase))
          == bruteSlop(docs, phrase, 0),
          s"exact-phrase mismatch seed=$seed phrase=$phrase")
        // proximity wants distinct terms
        val terms = rnd.shuffle(extended.toSeq).take(1 + rnd.nextInt(3))
        val window = terms.size + rnd.nextInt(4)
        assert(m(graft.ops.CorpusOps.searchProximity(
          cat, "ppost", terms, window))
          == bruteProximity(docs, terms, window),
          s"proximity mismatch seed=$seed terms=$terms window=$window")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
