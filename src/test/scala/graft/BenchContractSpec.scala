package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The bench artifact contract, pinned as a spec (r15 verdict #7): rounds
  * 13 and 14 both shipped `parsed:null` because the stdout JSON line
  * outgrew the driver's ~2 KB capture window — a silent, two-round outage
  * of the official performance record. `graft.Bench` now prints a short
  * guarded summary and writes the full record to BENCH_LOCAL.json, both
  * Jackson-validated before printing; this spec runs the REAL main as a
  * subprocess (the same stdout path the driver captures) at sf0.001 and
  * fails the suite if any of those invariants regresses.
  *
  * The run is reps=1 / warmup=0 in a TEMP working directory (so the
  * repo's committed BENCH_LOCAL.json — the sf0.1 record the stdout line
  * points at — is never clobbered), sharing the project's `.graft_layouts`
  * cache so the persisted layouts don't rebuild cold.
  *
  * Portability: the SF dir resolves from SPARK_GRAFT_TESTDATA (default
  * the standard driver layout) and the whole test is assume()-skipped
  * when that dir is absent, so a checkout on a machine without the
  * driver's testdata doesn't fail the suite on a host-layout accident. */
class BenchContractSpec extends AnyFunSuite {

  private val sfDir = new java.io.File(
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001")

  test("graft.Bench full sf0.001 run: stdout line parses within the capture window with warmup_sec + contamination fields; BENCH_LOCAL.json carries the full registry") {
    assume(sfDir.isDirectory,
      s"testdata dir $sfDir absent — set SPARK_GRAFT_TESTDATA to run " +
        "the bench contract check")
    val tmp = java.nio.file.Files.createTempDirectory("graft-benchcontract")
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    // reuse this (forked, Spark-ready) JVM's own module options — sbt may
    // pass them as "--add-opens pkg=ALL-UNNAMED" pairs or as single
    // "--add-opens=..." args depending on version
    val in = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
    val moduleArgs = in.zipWithIndex.flatMap {
      case (a, i) if a == "--add-opens" || a == "--add-exports" =>
        Seq(a, in(i + 1))
      case (a, _) if a.startsWith("--add-opens=") ||
          a.startsWith("--add-exports=") => Seq(a)
      case _ => Nil
    }
    val cmd = Seq(javaBin) ++ moduleArgs ++ Seq("-Xmx6g",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", cp, "graft.Bench")
    val outF = tmp.resolve("stdout.txt").toFile
    val errF = tmp.resolve("stderr.txt").toFile
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(tmp.toFile)
    pb.redirectOutput(outF)
    pb.redirectError(errF)
    val env = pb.environment()
    env.put("SPARK_GRAFT_SF_DIR", sfDir.getAbsolutePath)
    env.put("SPARK_GRAFT_BENCH_REPS", "1")
    env.put("SPARK_GRAFT_BENCH_WARMUP", "0")
    env.put("SPARK_GRAFT_CPUS", "8")
    env.put("SPARK_GRAFT_LAYOUT_DIR",
      new java.io.File(".graft_layouts").getAbsolutePath)
    val p = pb.start()
    val done = p.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)
    def tail(f: java.io.File) = {
      val s = scala.io.Source.fromFile(f)
      try s.getLines().toSeq.takeRight(10).mkString("\n") finally s.close()
    }
    assert(done, s"bench subprocess timed out; stderr tail:\n${tail(errF)}")
    assert(p.exitValue() == 0,
      s"bench exited ${p.exitValue()}; stderr tail:\n${tail(errF)}")
    val src = scala.io.Source.fromFile(outF)
    val lines = try src.getLines().toList finally src.close()
    // the driver parses the LAST stdout line; Spark/log noise may precede
    val line = lines.reverse.find(_.trim.startsWith("{")).getOrElse(
      fail(s"no JSON line on stdout; got:\n${lines.takeRight(5).mkString("\n")}"))
    assert(line.length <= 1600,
      s"stdout line is ${line.length} chars — outgrows the driver's " +
        "capture window (the parsed:null failure class)")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(line) // throws on malformed JSON
    assert(node.get("value") != null && node.get("value").isNumber,
      s"stdout line lacks a numeric total: $line")
    assert(node.get("warmup_sec") != null,
      s"stdout line lacks warmup_sec: $line")
    assert(node.get("n_queries") != null &&
      node.get("n_queries").asInt == SparkEntry.queries.size,
      s"n_queries=${node.get("n_queries")} != registry " +
        s"size ${SparkEntry.queries.size}")
    assert(node.get("queries") != null && node.get("queries").isObject, line)
    // contamination self-evidence (r17 verdict #2): the fields must ALWAYS
    // be present so a loaded-machine sweep carries its own adjudication
    // record. At sf0.001 with no matching reference both read -1 (not
    // comparable) — existence, numericness and the -1 semantics are the
    // contract.
    assert(node.get("control_ratio") != null &&
      node.get("control_ratio").isNumber,
      s"stdout line lacks numeric control_ratio: $line")
    assert(node.get("n_over_band") != null &&
      node.get("n_over_band").isNumber,
      s"stdout line lacks numeric n_over_band: $line")
    assert(node.get("n_over_band").asInt >= -1, line)
    // full-fidelity artifact: every registered query timed, none failed
    val localF = tmp.resolve("BENCH_LOCAL.json").toFile
    assert(localF.exists, "full run did not write BENCH_LOCAL.json")
    val full = om.readTree(
      java.nio.file.Files.readString(localF.toPath))
    assert(full.get("queries").size == SparkEntry.queries.size,
      s"BENCH_LOCAL queries=${full.get("queries").size} != " +
        s"registry ${SparkEntry.queries.size}")
    assert(full.get("n_failed").asInt == 0,
      s"bench recorded failures: ${full.get("errors")}")
    assert(full.get("calib_sec").isArray &&
      full.get("calib_sec").size >= 2, "calibration series missing")
    assert(full.get("control_ratio") != null && full.get("over_band") != null
      && full.get("over_band").isArray,
      "contamination fields missing from BENCH_LOCAL.json")
    org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }
}
