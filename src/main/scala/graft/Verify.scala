package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
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
    var errors = scala.collection.immutable.ListMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          System.err.println(s"[verify] $name failed: $msg")
          errors += name -> msg.take(500)
        }
      }
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
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // failed queries must be VISIBLE in the artifact, not silently absent
    // from the compare (a shrunk query set reads as a clean run): dump
    // name → error for every query whose dump failed, always (empty
    // object on a clean run, so its absence is itself a signal).
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.keys.mkString(", "))
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
