package graft

/** Plan audit main: prints the formatted physical plan of each named
  * query (or all with no args) — used to eyeball the properties that
  * matter at 100 TB: filter/column pushdown reaching the parquet scan
  * (`PushedFilters`, `ReadSchema`), broadcast vs shuffle join choice,
  * whole-stage codegen coverage.
  *
  *   sbt "runMain graft.Explain q02_filter q17_nation_revenue"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.engine.GraftSession.getOrCreate()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n================================ $name")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
