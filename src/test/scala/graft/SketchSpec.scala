package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog

/** Sketch surface for approximate analytics at scale: HyperLogLog++
  * distinct counts and t-digest quantiles — constant memory per group,
  * one map-side-combinable pass, the 100 TB substitutes for exact
  * distinct/percentile. (No DuckDB oracle: sketch internals differ per
  * engine; correctness = bounded error vs the exact answer.)
  */
class SketchSpec extends SparkTestBase {

  private lazy val li = Catalog(spark, sf).table("lineitem")

  test("approx_count_distinct within its rsd bound of the exact count") {
    val exact = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), rsd = 0.02))
      .collect().head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.06, s"exact=$exact approx=$approx err=$err (3×rsd bound)")
  }

  test("approx_percentile brackets the exact median") {
    val exactMedian = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val approx = li.select(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .collect().head.getDouble(0)
    assert(math.abs(approx - exactMedian) / exactMedian < 0.02,
      s"exact=$exactMedian approx=$approx")
  }

  test("sketches merge across groups (partial aggregation shape)") {
    // per-flag sketches vs global: the merged global count must be >= any
    // per-group count and <= the sum (set-union semantics, mergeable state)
    val per = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("d"))
      .collect().map(_.getLong(1))
    val global = li.select(approx_count_distinct(col("l_partkey")))
      .collect().head.getLong(0)
    assert(per.forall(_ <= global * 1.05) && global <= per.sum)
  }
}
