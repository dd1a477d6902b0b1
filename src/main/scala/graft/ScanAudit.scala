package graft

/** Scan-amplification audit main (guide §7.2 + the verify skill's plan
  * audit): execute each named query and report, from the EXECUTED
  * (post-AQE) plan, how many parquet scans of each table ran — a
  * same-table count > 1 for the same projection means a shared subtree
  * was recomputed per consumer branch (lazy cache raced cold, or column
  * pruning specialized the branches), the duplicate-lineage pathology.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.ScanAudit x104_kn_bigram"
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.toRdd.count()
      // AQE prints "== Initial Plan ==" below the final plan — drop it
      // so every operator is counted once.
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val scans = "(?m)Scan parquet ?[^\\n ]*".r.findAllIn(plan).toSeq
        .groupBy(identity).view.mapValues(_.size).toSeq.sortBy(-_._2)
      val imrs = "(?m)InMemoryTableScan".r.findAllIn(plan).size
      val exch = "(?m)Exchange ".r.findAllIn(plan).size
      val reused = "(?m)ReusedExchange".r.findAllIn(plan).size
      println(s"\n=== $name: exchanges=$exch reused=$reused imrScans=$imrs")
      scans.foreach { case (s, n) => println(f"  $n%2d x $s") }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
