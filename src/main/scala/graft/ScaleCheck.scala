package graft

import org.apache.spark.sql.functions._

/** Scale-amortization experiment main: replicates the sf0.1
  * lineitem/orders tables K× into /tmp with disjoint order keys (join
  * selectivity per replica unchanged, so work scales linearly) and
  * times the core queries at both sizes.
  *
  * Purpose: the sf0.1 bench wall-times are dominated by a fixed
  * ~0.1-0.3 s planning/session cost per query; this main measures how
  * far from linear the scale-up actually is — the evidence behind
  * BENCH_NOTES' "fixed overhead amortizes at scale" claim. A
  * scaleFactor column far below K means per-row throughput RISES with
  * data size, which is the property that matters at 100 TB.
  *
  *   sbt "runMain graft.ScaleCheck [K]"   (default K=16)
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val K = args.headOption.map(_.toInt).getOrElse(16)
    val spark = graft.engine.GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = s"/tmp/graft_scale$K"

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val maxKey = ord.agg(max("o_orderkey")).head.getLong(0) + 1
    val rep = spark.range(K).select(col("id").as("__r"))
    li.crossJoin(rep).withColumn("l_orderkey", col("l_orderkey") + col("__r") * maxKey)
      .drop("__r").write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    ord.crossJoin(rep).withColumn("o_orderkey", col("o_orderkey") + col("__r") * maxKey)
      .drop("__r").write.mode("overwrite").parquet(s"$dst/orders.parquet")
    println(s"replicated rows: ${spark.read.parquet(s"$dst/lineitem.parquet").count()}")

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq("q01_scan", "q02_filter", "q08_hash_join", "q14_pipeline", "q04_agg")) {
      time(n, src) // warm
      val tSmall = time(n, src)
      val tBig = time(n, dst)
      println(f"$n%-14s base=$tSmall%5.2f s  x$K%d=$tBig%6.2f s  " +
        f"scaleFactor=${tBig / tSmall}%5.2f (ideal $K%d; lower = overhead amortized)")
    }

    // Dup-heavy corpus: replicate documents D× with NEW ids but IDENTICAL
    // text — every doc gains D-1 exact twins. The stress case for dedup:
    // LSH buckets grow D×, candidate pairs grow ~D² per original — but
    // per-bucket, bounded by D, never corpus-sized. Measures that the
    // dedup queries degrade with OUTPUT size (real duplicate pairs), not
    // quadratically with corpus size.
    val D = math.max(2, K / 4)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1
    docs.crossJoin(spark.range(D).select(col("id").as("__r")))
      .withColumn("doc_id", col("doc_id") + col("__r") * maxDoc)
      .drop("__r").write.mode("overwrite").parquet(s"$dst/documents.parquet")
    for (n <- Seq("x04_dedup_exact", "x07_minhash_lsh_pairs", "x23_simhash_banded",
        "x47_simhash_pairbanded", "x36_dup_clusters", "x38_pack_sequences",
        "x39_repetition", "x43_chargram_lsh", "x10_ngram_jaccard")) {
      time(n, src) // warm
      val tSmall = time(n, src)
      val tBig = time(n, dst)
      println(f"$n%-22s base=$tSmall%5.2f s  x$D%d-dups=$tBig%6.2f s  " +
        f"scaleFactor=${tBig / tSmall}%5.2f (corpus x$D%d, every doc has ${D - 1}%d exact twins)")
    }
    // x36 on the dup-heavy corpus is the interesting one: the pair graph
    // gains D-cliques per original near-dup cluster (components MERGE
    // across replicas through the exact twins), yet propagation depth
    // stays shallow — cliques have diameter 1 — so the round count, not
    // just the per-round cost, is what the measurement pins.
    spark.stop()
  }
}
