package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Survivability contract (the r14/r15 driver artifacts shipped literally
  * `{}` — a wall-clock kill of this program used to leave NOTHING the
  * compare could use): everything the downstream compare needs is written
  * EARLY and INCREMENTALLY. `oracle_sql.json` lands before the first
  * query runs (it depends only on the registry); `errors.json` and
  * `timings.json` are rewritten after every query completes. A run killed
  * at minute N therefore ships all queries finished by minute N as fully
  * comparable records instead of an empty artifact. Wall time itself is
  * attacked twice: query dumps run in a small thread pool (driver-side
  * planning overlaps; Spark schedules the jobs FIFO across the same
  * local cores), and the heavy persisted layouts (BPE merges, PQ
  * codebooks, postings/positional/signature indexes) are served from the
  * project-stable `.graft_layouts` get-or-build cache, so any earlier
  * run from this checkout — a bench warm-up, a local sweep — leaves the
  * next fresh JVM warm. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.engine.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-verify")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated subset for fast local iteration
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def writeJson(file: String, kv: Iterable[(String, String)]): Unit = {
      val body = kv.map { case (k, v) => s"${q(k)}: $v" }
        .mkString("{", ",", "}")
      // atomic publish so a kill mid-write never leaves truncated JSON
      val tmp = Paths.get(s"$outDir/.$file.tmp")
      Files.writeString(tmp, body)
      Files.move(tmp, Paths.get(s"$outDir/$file"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    // the oracle map depends only on the registry — write it FIRST, so a
    // killed run still leaves the compare everything it needs for the
    // query dirs that did complete
    writeJson("oracle_sql.json",
      SparkEntry.oracleSql.map { case (k, v) => k -> q(v) })
    val todo = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }.toSeq
    val errors = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val timings = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val flushLock = new Object
    def flush(): Unit = flushLock.synchronized {
      // registry order, failed-or-finished only — errors.json empty object
      // on a clean run (its emptiness is itself a signal)
      writeJson("errors.json", todo.collect {
        case (n, _) if errors.containsKey(n) => n -> q(errors.get(n))
      })
      writeJson("timings.json", todo.collect {
        case (n, _) if timings.containsKey(n) => n -> f"${timings.get(n)}%.2f"
      })
    }
    val par = math.max(1, sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "4").toInt)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    val t0 = System.nanoTime()
    todo.foreach { case (name, fn) =>
      pool.execute { () =>
        val tq = System.nanoTime()
        try {
          spark.sparkContext.setJobGroup(name, name,
            interruptOnCancel = false)
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          val sec = (System.nanoTime() - tq) / 1e9
          timings.put(name, sec)
          System.err.println(f"[verify] $name ok in $sec%.1fs " +
            f"(t+${(System.nanoTime() - t0) / 1e9}%.0fs)")
        } catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          timings.put(name, (System.nanoTime() - tq) / 1e9)
          System.err.println(s"[verify] $name failed: $msg")
          errors.put(name, msg.take(500))
        }
        flush()
      }
    }
    pool.shutdown()
    pool.awaitTermination(24, java.util.concurrent.TimeUnit.HOURS)
    flush()
    if (!errors.isEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        todo.map(_._1).filter(errors.containsKey).mkString(", "))
    System.err.println(f"[verify] dump done: ${todo.size - errors.size}/" +
      f"${todo.size} ok in ${(System.nanoTime() - t0) / 1e9}%.0fs")
    spark.stop()
    // Self-computed correctness artifact (r14 shipped an EMPTY driver-side
    // CORRECTNESS json, so the round had no oracle confirmation at all):
    // when the local python3+duckdb toolchain is present, run the same
    // rows/schema/value-hash compare the driver performs and write
    // CORRECTNESS_LOCAL.json in the driver's exact per-query format.
    // Skipped silently (with a stderr note) when the toolchain is absent
    // — the dump itself is the primary contract and must never fail on
    // the self-check's account. Full runs only: a VERIFY_ONLY subset
    // must not clobber the full-inventory record.
    if (only.isEmpty) {
      val tool = Paths.get("tools/oracle_check.py")
      if (Files.exists(tool)) {
        try {
          val pb = new ProcessBuilder("python3", tool.toString, sfDir,
            outDir, "--json", "CORRECTNESS_LOCAL.json")
          pb.redirectErrorStream(true)
          val p = pb.start()
          val out = new String(p.getInputStream.readAllBytes())
          val rc = p.waitFor()
          // the tail carries the "N/M pass" summary line
          System.err.println("[verify] self-check rc=" + rc + " tail: " +
            out.linesIterator.toSeq.takeRight(3).mkString(" | "))
          // smoke: the artifact must exist and parse as a JSON object
          // with one record per registered query
          val txt = Files.readString(Paths.get("CORRECTNESS_LOCAL.json"))
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(txt)
          require(node.isObject && node.size >= SparkEntry.queries.size,
            s"CORRECTNESS_LOCAL.json has ${node.size} records, " +
              s"expected ${SparkEntry.queries.size}")
          System.err.println(
            s"[verify] CORRECTNESS_LOCAL.json: ${node.size} records OK")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] self-check skipped/failed: $e")
        }
      }
    }
  }
}
