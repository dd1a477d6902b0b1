package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.dsl.Q

/** Driver contract — flagship entry + per-operator query/oracle inventory.
  *
  * Every entry in [[queries]] is one operator (or operator composition)
  * from SURVEY.md §2, exercised over the driver fixture tables; the
  * matching [[oracleSql]] is the ANSI-SQL equivalent the driver runs in
  * DuckDB over the same parquet. Column names are aliased identically on
  * both sides (the driver's compare sorts columns by name before hashing).
  *
  * Float discipline: per-row double arithmetic is IEEE-deterministic and
  * left unrounded; multi-row aggregates (sum/avg) are rounded on BOTH
  * sides to absorb summation-order drift between Spark partial aggregation
  * and DuckDB.
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.2): the reference's showcase pipeline
    * (reference README.md:33-48, benches/10K_hash_match.rs:86-102) —
    * scan ⋈ scan hash join, sort desc, project + aggregate — over
    * lineitem ⋈ orders. Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val cat = Catalog(spark, "/root/testdata/sf0.001")
    Q(cat, "lineitem")
      .hashJoin(Q(cat, "orders"), col("l_orderkey") === col("o_orderkey"))
      .where(col("o_orderstatus") =!= "X")
      .sort(col("l_extendedprice").desc)
      .groupAgg(
        keys = Seq(col("o_orderpriority")),
        aggs = Seq(
          max(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("max_rev"),
          count(lit(1)).as("n")))
      .df
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}
