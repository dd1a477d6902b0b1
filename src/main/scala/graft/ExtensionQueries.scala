package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data-pipeline extension queries (dedup, similarity, text,
  * multimodal, events) — populated milestone by milestone. Kept separate
  * from the core operator inventory in [[Queries]].
  */
object ExtensionQueries {
  type QFn = (SparkSession, String) => DataFrame

  val all: Map[String, QFn] = Map()
  val oracles: Map[String, String] = Map()
}
