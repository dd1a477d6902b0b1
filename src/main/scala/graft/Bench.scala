package graft

/** Benchmark main: one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR (driver contract).
  *
  * Methodology:
  *  - each query is forced through `queryExecution.toRdd.count()`, which
  *    executes the full physical plan and materializes output rows —
  *    `df.count()` would let Catalyst prune every column and turn scan
  *    benchmarks into metadata-only row counts;
  *  - a warm-up pass at sf0.001 first, so JIT/codegen compilation cost
  *    is not charged to whichever query happens to run first;
  *  - queries run in sorted name order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach(run(_, "/root/testdata/sf0.001")) // warm-up
    val results = names.map(n => n -> run(n, sfDir))

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
