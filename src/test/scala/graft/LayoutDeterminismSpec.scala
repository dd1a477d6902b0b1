package graft

import org.apache.spark.sql.Row

/** The train-once persisted-quantizer contract: 13 ANN/dedup queries
  * read centroid/PQ layouts trained ONCE per dataset generation
  * (ExtensionQueries.cachedCentroids / cachedPqRaw / cachedPqResid,
  * published behind layoutDir's fingerprint + atomic rename). Every
  * consumer — and every unrolled DuckDB oracle — rests on retraining
  * being fully DETERMINISTIC: if a layout is lost (tmp sweep, new
  * host) the rebuild must reproduce value-identical artifacts, or 13
  * hash contracts break at once. This spec exercises exactly that
  * cycle against the real publish path: build, snapshot, DELETE the
  * layout generation, rebuild, compare float-bit-identical.
  */
class LayoutDeterminismSpec extends SparkTestBase {

  /** Canonical, bit-exact rendering of a table: every float/double
    * goes through its raw IEEE bit pattern (toString would mask a
    * last-ulp drift), arrays element-wise, rows sorted. */
  private def canon(dir: String, table: String): Seq[String] = {
    def cell(v: Any): String = v match {
      case f: Float => java.lang.Float.floatToRawIntBits(f).toString
      case d: Double => java.lang.Double.doubleToRawLongBits(d).toString
      case s: Seq[_] => s.map(cell).mkString("[", ",", "]")
      case r: Row => r.toSeq.map(cell).mkString("(", ",", ")")
      case other => String.valueOf(other)
    }
    graft.catalog.Catalog(spark, dir).table(table)
      .collect().map(r => cell(r)).sorted.toSeq
  }

  private def deleteLayout(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // both layout-cache bases: the project-stable `.graft_layouts`
    // (default since r16) and the tmpdir `graft_layout_<user>` fallback
    assert(dir.contains("graft_layout_") || dir.contains(".graft_layouts"),
      s"refusing to delete $dir")
    fs.delete(p, true)
    assert(!fs.exists(p))
  }

  private def roundTrip(name: String, table: String)
      (build: => String): Unit = {
    val d1 = build
    val first = canon(d1, table)
    assert(first.nonEmpty, s"$name trained an empty artifact")
    deleteLayout(d1)
    val d2 = build
    assert(d2 == d1, s"$name rebuilt at a different generation path")
    val second = canon(d2, table)
    assert(second == first,
      s"$name retrain is NOT deterministic — persisted-layout " +
        "consumers and their oracles would diverge after a layout loss")
  }

  test("k-means centroid layouts (k=16, k=64) retrain byte-identical") {
    roundTrip("centroids k=16", "cent") {
      ExtensionQueries.centroidLayoutDirForTest(spark, sf, 16)
    }
    roundTrip("centroids k=64", "cent") {
      ExtensionQueries.centroidLayoutDirForTest(spark, sf, 64)
    }
  }

  test("PQ codebook layouts (raw, coarse-residual) retrain byte-identical") {
    roundTrip("pq raw-m4k8", "cents") {
      ExtensionQueries.pqRawLayoutDirForTest(spark, sf)
    }
    // the residual codebook TRAINS AGAINST the k=16 centroid layout —
    // the composed two-layout chain must also come back identical
    roundTrip("pq resid16-m4k8", "cents") {
      ExtensionQueries.pqResidLayoutDirForTest(spark, sf)
    }
  }
}
