package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.functions.ZOrder

/** Z-order layout: correctness (content preserved, box query equal to
  * the unclustered truth) and the property the layout exists for —
  * parquet row-group skipping on BOTH dimensions of a box predicate,
  * measured from the scan's own numOutputRows metric.
  */
class ZOrderSpec extends SparkTestBase {

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
      .headOption.getOrElse(fail("no scan metric found"))
  }

  test("interleave2: known bit patterns") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (0xffffL, 0L))
      .toDF("u", "v")
      .select(ZOrder.interleave2(col("u"), col("v")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit i of u → 2i+1, bit i of v → 2i
    assert(rows == Seq(0L, 2L, 1L, 15L, 0xaaaaaaaaL))
  }

  test("z-ordered layout: value-dimension predicate skips row groups a single-column sort cannot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val cat = Catalog(spark, dir)
    try {
      val ev = cat2.table("events")
        .select(col("event_id"), col("user_id"), col("value"))
      val total = ev.count()
      cat.writeZOrdered("ev_z", ev, "user_id", "value", nFiles = 16)
      // the comparison layout: clustered by user_id ONLY (what a
      // single-dimension sort gives you)
      ev.repartitionByRange(16, col("user_id"))
        .sortWithinPartitions(col("user_id"))
        .write.mode("overwrite").parquet(cat.path("ev_lin"))

      // a narrow band on the SECOND dimension: the user_id-sorted
      // layout has value min/max spanning everything in every file —
      // zero skipping; the z-order tiles prune most files
      val r = ev.agg(min("value"), max("value")).head
      val (lo, hi) = (r.getDouble(0), r.getDouble(1))
      val band = col("value") >= lit(lo + (hi - lo) * 0.45) &&
        col("value") < lit(lo + (hi - lo) * 0.55)

      val zScan = scanRows(cat.table("ev_z").filter(band))
      val linScan = scanRows(cat.table("ev_lin").filter(band))
      assert(linScan == total,
        s"single-column sort must not skip on the other dimension ($linScan/$total)")
      assert(zScan <= total / 2,
        s"z-order must skip most row groups on the value band ($zScan/$total)")

      // content equality: same rows from either layout, and from the truth
      def ids(df: DataFrame) = df.filter(band)
        .select("event_id").collect().map(_.getLong(0)).toSet
      val truth = ids(ev)
      assert(ids(cat.table("ev_z")) == truth && truth.nonEmpty)
      assert(ids(cat.table("ev_lin")) == truth)

      // box predicate on BOTH dimensions prunes at least as hard
      val ur = ev.agg(min("user_id"), max("user_id")).head
      val (ulo, uhi) = (ur.getLong(0), ur.getLong(1))
      val box = band && col("user_id") >= lit(ulo + (uhi - ulo) / 4) &&
        col("user_id") < lit(ulo + (uhi - ulo) / 2)
      val zBox = scanRows(cat.table("ev_z").filter(box))
      assert(zBox <= zScan, s"box must prune at least as hard ($zBox vs $zScan)")
      assert(cat.table("ev_z").filter(box).count() == ev.filter(box).count())
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  private def cat2 = Catalog(spark, sf)
}
