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

    // SPARK_GRAFT_BENCH_ONLY=substr1,substr2 filters the query set for
    // targeted profiling (local tool; the driver runs the full set).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').toSeq.filter(_.nonEmpty))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.contains)))
    // SPARK_GRAFT_BENCH_REPS: per-query MEDIAN of k runs. Default 3 —
    // round 3's single-shot artifact was captured on a loaded machine and
    // read 30% slow (65.2s committed vs 49.3s judge re-run), so the
    // published number is now median-of-3 by default; set to 1 for quick
    // local profiling.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Load sentinel: a fixed, single-threaded, data-independent spin
    // (xorshift64* over 2^27 steps) timed before and after the query runs.
    // Its wall time is a machine-load calibration constant — on an idle
    // host both readings land within a few percent of each other and of
    // any other idle capture; an inflated or divergent pair flags the
    // whole artifact as load-contaminated. Round 5's artifact had a clean
    // before/after pair yet a mid-sweep regression cluster that could not
    // be attributed, so the sentinel now ALSO samples every
    // SPARK_GRAFT_BENCH_CALIB_EVERY queries (default 10) — the series is
    // emitted in both artifacts, making a transient mid-sweep load spike
    // visible next to the queries it would have contaminated.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9e3779b97f4a7c15L; var acc = 0L; var i = 0
      while (i < (1 << 27)) {
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        acc += x * 0x2545f4914f6cdd1dL; i += 1
      }
      if (acc == 42L) System.err.println("calib") // defeat dead-code elim
      (System.nanoTime() - t0) / 1e9
    }
    // Storage-block hygiene: ~30 queries localCheckpoint small frames
    // (signature scans, k-means centroids, CC frontiers). Checkpoint
    // blocks have no lineage, so Spark PINS them — across 94 queries × 3
    // reps the session accumulates hundreds of dead pinned blocks unless
    // the ContextCleaner's GC happens to fire. Each query builds its
    // DataFrame from scratch per rep, so nothing cached is ever reused
    // across timed runs: sweeping every persistent RDD between runs
    // (outside the timed region, blocking so the next run starts from a
    // deterministic empty storage state) is both safe and the fix for
    // cross-query memory-state drift. SPARK_GRAFT_BENCH_SWEEP=0 restores
    // the accumulating behavior for A/B attribution.
    val sweepOn = sys.env.getOrElse("SPARK_GRAFT_BENCH_SWEEP", "1") != "0"
    def sweep(): Unit = if (sweepOn) {
      // Two layers of storage state to reset:
      //  1. catalog.clearCache() empties the SQL CacheManager REGISTRY
      //     (logical plan → InMemoryRelation). Unpersisting RDD blocks
      //     alone leaves the registry populated, so a later query whose
      //     plan matches an earlier query's persisted frame (the
      //     x51/x59/x61 family all persist the same (doc,word) tf
      //     plan) logs `CacheManager: Asked to cache already cached
      //     data` and silently plans against the stale entry — the
      //     warning the r9 bench tail carried twice.
      //  2. getPersistentRDDs sweeps what CacheManager does NOT track:
      //     localCheckpoint blocks and RDD-level caches.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // (n cached RDDs, cached bytes in memory) — sampled after each query
    // so storage growth across the sweep is measured, not guessed.
    def storageSample(): (Int, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.length, infos.map(_.memSize).sum)
    }
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
    // Pre-rep hygiene check: after a sweep, NOTHING may still be cached
    // when the next timed rep starts — a nonzero count means either the
    // sweep failed or a query pinned storage the sweep can't see, and
    // the rep's timing silently includes another query's memory state.
    // Recorded per run (max over the sweep) and surfaced in the JSON;
    // SPARK_GRAFT_BENCH_STRICT=1 turns a violation into a hard failure.
    // (Distinct from the in-query `CacheManager: already cached`
    // warning, which is a DOUBLE persist of one frame inside a single
    // query's construction — this check proves any such warning is not
    // cross-query contamination.)
    val strict = sys.env.getOrElse("SPARK_GRAFT_BENCH_STRICT", "0") == "1"
    var preCachedMax = 0
    def preCheck(name: String): Unit = if (sweepOn) {
      val n = spark.sparkContext.getPersistentRDDs.size
      if (n > 0) {
        preCachedMax = math.max(preCachedMax, n)
        System.err.println(
          s"[bench] HYGIENE: $n RDD(s) still cached entering $name")
        if (strict) sys.error(s"pre-cached storage entering $name: $n")
      }
    }
    def run(name: String, dir: String): Either[String, Double] = {
      val rs = (1 to reps).map { _ =>
        preCheck(name)
        val r = runOnce(name, dir)
        sweep() // untimed; keeps every rep's starting storage state equal
        r
      }
      rs.collectFirst { case Left(e) => Left(e) }.getOrElse {
        val ts = rs.collect { case Right(t) => t }.sorted
        Right(ts(ts.length / 2))
      }
    }

    // warm-up: sweep between queries here too — without it the
    // persisted-plan registry accumulates across the warm-up pass and
    // the x51/x59/x61 family re-persist logs the `already cached`
    // warning before the timed sweep ever starts
    names.foreach { n => runOnce(n, "/root/testdata/sf0.001"); sweep() }
    val calibEvery =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_CALIB_EVERY", "10").toInt
    val calibSeries = scala.collection.mutable.ArrayBuffer[Double]()
    val storageSeries = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    val calibBefore = calibrate()
    val results = names.zipWithIndex.map { case (n, i) =>
      if (i > 0 && i % calibEvery == 0) calibSeries += calibrate()
      val r = n -> run(n, sfDir)
      storageSeries += storageSample()
      r
    }
    val calibAfter = calibrate()

    // The driver's stdout capture keeps only the LAST ~2000 chars; round 2's
    // full-name 9-decimal line (2.2 KB) overflowed that window, so the line
    // start (metric/value + the headline q01-q09 timings) was cut off and the
    // driver recorded parsed:null. The stdout line therefore uses the short
    // unambiguous query ids (q01, x22, ... — the driver contract's own
    // example style) and 2-decimal seconds (±10 ms ≪ the ±30-50% single-shot
    // noise); BENCH_LOCAL.json keeps full names + full precision.
    def shortId(k: String): String = k.takeWhile(_ != '_')
    val shortOk = names.map(shortId).distinct.size == names.size
    def key(k: String): String = if (shortOk) shortId(k) else k
    // Locale.ROOT: the f-interpolator uses the JVM default locale, which
    // under comma-decimal locales would emit invalid JSON ("value":7,32)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map {
      case (k, Right(v)) => "\"" + key(k) + "\":" + fmt(v)
      case (k, Left(_))  => "\"" + key(k) + "\":-1"
    }.mkString("{", ",", "}")
    val qsFull = results.map {
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
    val sfShort = sfDir.split('/').last
    val errsPart =
      if (nFailed == 0) "" else s""","errors":$errs,"n_failed":$nFailed"""
    // mid-sweep series: before + every-Nth-query samples + after. Flat ⇒
    // no load spike anywhere in the sweep; a bump pinpoints WHICH query
    // neighborhood a spike contaminated.
    val calibAll = calibBefore +: calibSeries.toSeq :+ calibAfter
    val calibPart =
      s""","reps":$reps,"calib_every":$calibEvery""" +
        s""","calib_sec":[${calibAll.map(fmt).mkString(",")}]"""
    val (rddsMax, memMax) =
      if (storageSeries.isEmpty) (0, 0L)
      else (storageSeries.map(_._1).max, storageSeries.map(_._2).max)
    val storagePart =
      s""","sweep":${if (sweepOn) 1 else 0},"rdds_max":$rddsMax""" +
        s""","storage_mb_max":${fmt(memMax / 1048576.0)}""" +
        s""","precached_max":$preCachedMax"""
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$errsPart$calibPart$storagePart,"sf":"$sfShort","full":"BENCH_LOCAL.json"}"""
    println(line)
    // full-fidelity artifact: full query names, full float precision,
    // always-present errors map, absolute sf dir. Written only for FULL
    // runs — a SPARK_GRAFT_BENCH_ONLY profiling subset must not clobber
    // the full-inventory record the stdout line points at.
    if (only.isEmpty) {
      val storageFull = storageSeries.zip(names).map { case ((nr, mem), n) =>
        "\"" + n + "\":[" + nr + "," + mem + "]"
      }.mkString("{", ",", "}")
      val fullLine =
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFull,"errors":$errs,"n_failed":$nFailed,"reps":$reps,"calib_every":$calibEvery,"calib_sec":[${calibAll.mkString(",")}],"sweep":${if (sweepOn) 1 else 0},"storage_after":$storageFull,"precached_max":$preCachedMax,"sf":"$sfDir"}"""
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_LOCAL.json"), fullLine + "\n")
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
