package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession across all suites (sbt forks a single
  * test JVM; getOrCreate makes this a process-wide singleton).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession =
    graft.engine.GraftSession
      .builder(master = "local[4]", shufflePartitions = 4,
        appName = "graft-test")
      .getOrCreate()

  lazy val sf: String = "/root/testdata/sf0.001"
}
