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
    // SPARK_GRAFT_BENCH_REPS > 1 reports the per-query MEDIAN of k runs
    // (local variance control); the driver default stays single-shot.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    // A failed query must NOT masquerade as a fast passing timing: record
    // the error and surface it in the JSON (value -1, errors map).
    def runOnce(name: String, dir: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name: $e")
          Left(e.toString.takeWhile(_ != '\n').take(200))
      }
    }
    def run(name: String, dir: String): Either[String, Double] = {
      val rs = (1 to reps).map(_ => runOnce(name, dir))
      rs.collectFirst { case Left(e) => Left(e) }.getOrElse {
        val ts = rs.collect { case Right(t) => t }.sorted
        Right(ts(ts.length / 2))
      }
    }

    names.foreach(runOnce(_, "/root/testdata/sf0.001")) // warm-up
    val results = names.map(n => n -> run(n, sfDir))

    val qs = results.map {
      case (k, Right(v)) => "\"" + k + "\":" + v
      case (k, Left(_))  => "\"" + k + "\":-1"
    }.mkString("{", ",", "}")
    // full JSON string escape (backslash, quote, ALL control chars —
    // Spark failure messages routinely contain tabs/CRs)
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val errs = results.collect { case (k, Left(m)) =>
      "\"" + k + "\":\"" + esc(m) + "\""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val nFailed = results.count(_._2.isLeft)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_failed":$nFailed,"sf":"$sfDir"}"""
    println(line)
    // belt-and-braces: stdout may be interleaved with runner/log noise
    // (round 1's captured bench output failed to parse); persist the
    // same line as a file artifact too.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
