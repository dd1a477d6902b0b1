package graft

import org.apache.spark.sql.functions._

/** Property-style check of the prefix-filtered all-pairs similarity
  * join ([[graft.ops.CorpusOps.allPairsCosine]]): over randomized
  * corpora (seeded, reproducible) and a grid of thresholds, the pruned
  * result must EXACTLY equal an in-memory brute force that evaluates
  * the same integer test dot²·10⁸ ≥ τ²₁ₑ₈·‖a‖²·‖b‖² over every doc
  * pair — the soundness (no qualifying pair lost to the prefix bound)
  * and exactness (no sub-threshold pair admitted) of the Bayardo
  * pruning, under corpus shapes the fixture doesn't cover: tiny docs
  * below the shingle width, heavy duplication, near-uniform text
  * (saturated features), and high/low thresholds.
  */
class AllPairsPropertySpec extends SparkTestBase {

  import spark.implicits._

  /** In-memory brute force with the op's exact feature and test
    * semantics: shingle-tf vectors over hash60 fingerprints, integer
    * τ² comparison in BigInt. */
  private def brute(docs: Seq[(Long, String)], k: Int,
      tau2E8: Long): Set[(Long, Long)] = {
    def shingles(text: String): Seq[String] = {
      val ws = text.trim.toLowerCase.split("\\s+").toSeq
      if (ws.length < k) Seq.empty
      else (0 to ws.length - k).map(i => ws.slice(i, i + k).mkString(" "))
    }
    val tf: Map[Long, Map[String, Long]] = docs.map { case (id, t) =>
      id -> shingles(t).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val ss: Map[Long, BigInt] = tf.view.mapValues(m =>
      m.values.map(w => BigInt(w) * w).sum).toMap
    val ids = docs.map(_._1).filter(id => tf(id).nonEmpty)
    (for {
      a <- ids; b <- ids if a < b
      dot = BigInt(tf(a).keySet.intersect(tf(b).keySet).toSeq
        .map(g => tf(a)(g) * tf(b)(g)).sum)
      if dot * dot * 100000000L >= ss(a) * ss(b) * tau2E8
    } yield (a, b)).toSet
  }

  test("allPairsCosine equals integer-test brute force on randomized corpora across thresholds") {
    val vocab = Array("red", "blue", "green", "fast", "slow", "big")
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val nDocs = 12 + rnd.nextInt(12)
      val docs: Seq[(Long, String)] =
        (1L to nDocs.toLong).foldLeft(Seq.empty[(Long, String)]) {
          (acc, id) =>
            // every third doc near-clones a prior one (duplication
            // pressure); others draw random text, including lengths
            // below the shingle width and the empty doc
            val text =
              if (id % 3 == 0 && acc.nonEmpty)
                acc(rnd.nextInt(acc.length))._2 + " " +
                  vocab(rnd.nextInt(vocab.length))
              else Seq.fill(rnd.nextInt(14))(
                vocab(rnd.nextInt(vocab.length))).mkString(" ")
            acc :+ (id -> text)
        }
      val df = docs.toDF("doc_id", "text")
      for (tauS <- Seq("0.3", "0.6", "0.9")) {
        val tau = new java.math.BigDecimal(tauS)
        val t2e8 = tau.pow(2).movePointRight(8)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
        val got = graft.ops.CorpusOps.allPairsCosine(df, tau)
          .select("doc_a", "doc_b")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = brute(docs, 3, t2e8)
        assert(got == want,
          s"seed=$seed tau=$tauS: missing=${(want -- got).take(3)} " +
            s"extra=${(got -- want).take(3)}")
      }
    }
  }
}
