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

  test("interleaveN: 3-dim known bit patterns; interleave2 unchanged") {
    import spark.implicits._
    // d=3: bit i of dim k lands at 3i + (2-k) — dim0 most significant
    val z3 = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (1L, 1L, 1L))
      .toDF("a", "b", "c")
      .select(ZOrder.interleaveN(
        Seq(col("a"), col("b"), col("c")), ZOrder.bitsFor(3)).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z3 == Seq(4L, 2L, 1L, 7L), z3.toString)
    // the 2-dim form still produces the documented pattern through the
    // generalized implementation
    val z2 = Seq((3L, 3L)).toDF("u", "v")
      .select(ZOrder.interleave2(col("u"), col("v")).as("z"))
      .collect().head.getLong(0)
    assert(z2 == 15L)
  }

  test("3-dim z-order: box on all three dims out-skips every single-column sort") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder3").toString
    val cat = Catalog(spark, dir)
    try {
      val ev = graft.functions.EventTime.withNanos(cat2.table("events"))
        .select(col("event_id"), col("user_id"), col("value"), col("ts"))
      val total = ev.count()
      // 64 files give each of the 3 dims ~4 z-divisions (top 6 z-bits =
      // 2 per dim); 16 files would leave <2 divisions per dim — no 3-dim
      // layout can out-prune a dedicated single-column sort at that
      // granularity, which is exactly the nFiles-vs-dimensionality
      // sizing note on writeZOrdered
      cat.writeZOrderedN("ev_z3", ev, Seq("user_id", "value", "ts"),
        nFiles = 64)
      for (c <- Seq("user_id", "value", "ts")) {
        ev.repartitionByRange(64, col(c)).sortWithinPartitions(col(c))
          .write.mode("overwrite").parquet(cat.path(s"ev_lin_$c"))
      }
      // a band per dimension sitting INSIDE one z-quarter ([0.25, 0.5))
      // so the box doesn't straddle top-bit division boundaries — the
      // tile-not-stripe case the layout exists for. Literals are
      // TYPE-NATIVE (long bounds for long columns): comparing a long
      // column against a double literal inserts a cast on the column and
      // parquet footer pushdown — the entire mechanism under test —
      // silently turns off.
      def band(c: String): org.apache.spark.sql.Column = {
        val r = ev.agg(min(col(c).cast("double")), max(col(c).cast("double"))).head
        val (lo, hi) = (r.getDouble(0), r.getDouble(1))
        val (bLo, bHi) = (lo + (hi - lo) * 0.26, lo + (hi - lo) * 0.49)
        ev.schema(c).dataType match {
          case org.apache.spark.sql.types.LongType =>
            col(c) >= lit(bLo.toLong) && col(c) < lit(bHi.toLong)
          case _ => col(c) >= lit(bLo) && col(c) < lit(bHi)
        }
      }
      val box = band("user_id") && band("value") && band("ts")
      val zScan = scanRows(cat.table("ev_z3").filter(box))
      for (c <- Seq("user_id", "value", "ts")) {
        val linScan = scanRows(cat.table(s"ev_lin_$c").filter(box))
        assert(zScan < linScan,
          s"z3 must out-skip the $c-sorted layout: z=$zScan lin($c)=$linScan")
      }
      // content equality against the unclustered truth
      val truth = ev.filter(box).select("event_id").collect()
        .map(_.getLong(0)).toSet
      val zIds = cat.table("ev_z3").filter(box).select("event_id").collect()
        .map(_.getLong(0)).toSet
      assert(zIds == truth && truth.nonEmpty, s"content diverged (${truth.size} rows)")
      assert(zScan < total, "box must skip SOMETHING on the z3 layout")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("quantile cells tame a skewed dimension where linear cells collapse") {
    import spark.implicits._
    // heavy-tailed column: 95% of rows in [0,1), tail stretched to 1e6 —
    // linear 8-bit cells put ~95% of rows in cell 0
    val n = 20000
    val df = (0 until n).map { i =>
      val v = if (i % 20 == 19) math.exp(i % 283 / 20.0) else i % 1000 / 1000.0
      (i.toLong, v)
    }.toDF("id", "v")
    val bounds = df.stat.approxQuantile("v",
      (1 until 256).map(_ / 256.0).toArray, 0.001).toSeq
    val rankCells = df.select(ZOrder.cellByBoundaries(col("v"), bounds).as("c"))
      .groupBy("c").count().collect().map(r => r.getLong(1))
    val r = df.agg(min("v"), max("v")).head
    val linCells = df.select(ZOrder.cellBits(col("v"), r.getDouble(0),
        r.getDouble(1), 8).as("c"))
      .groupBy("c").count().collect().map(r => r.getLong(1))
    val mean = n.toDouble / 256
    assert(linCells.max > n / 2,
      s"fixture not skewed enough: linear max cell ${linCells.max}")
    assert(rankCells.max <= mean * 4,
      s"quantile cells must stay near-uniform: max=${rankCells.max} mean=$mean")
  }

  test("x45 layout build is concurrency-safe: racing sessions read identical complete results") {
    // the round-4 ADVICE race: two evaluations over the same dataset used
    // to overwrite each other's layout mid-read. Force a FRESH layout key
    // (copy the dataset to a new dir) and evaluate the query from two
    // threads at once — both must succeed with the same row set as the
    // raw-table truth.
    import java.util.concurrent.{Executors, TimeUnit}
    val dsDir = java.nio.file.Files.createTempDirectory("graft-zrace").toString
    try {
      cat2.table("events").write.parquet(s"$dsDir/events.parquet")
      val truth = SparkEntry.queries("x45_zorder_scan")(spark, sf) // warm path
      assert(truth.columns.nonEmpty)
      val pool = Executors.newFixedThreadPool(2)
      val results = (1 to 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Set[Long]] {
          def call(): Set[Long] =
            SparkEntry.queries("x45_zorder_scan")(spark, dsDir)
              .select("event_id").collect().map(_.getLong(0)).toSet
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS), "race test timed out")
      val Seq(a, b) = results.map(_.get()).toSeq
      val raw = Catalog(spark, dsDir).table("events")
      val r = raw.agg(min(col("value")), max(col("value")),
        min(col("user_id")), max(col("user_id"))).head
      val (lo, hi) = (r.getDouble(0), r.getDouble(1))
      val (ulo, uhi) = (r.getLong(2), r.getLong(3))
      val expect = raw
        .filter(col("value") >= lit(lo + (hi - lo) * 0.45) &&
          col("value") < lit(lo + (hi - lo) * 0.55) &&
          col("user_id") >= lit(ulo + (uhi - ulo) / 4) &&
          col("user_id") < lit(ulo + (uhi - ulo) / 2))
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(a == expect && b == expect,
        s"racing builders diverged: a=${a.size} b=${b.size} expect=${expect.size}")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dsDir))
    }
  }

  private def cat2 = Catalog(spark, sf)
}
