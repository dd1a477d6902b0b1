package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.dsl.Q

/** Per-operator semantics tests for the DSL core (SURVEY §2.1), including
  * regression tests for the reference quirks we deliberately fix
  * (SURVEY §7.5 #2).
  */
case class RtRow(id: Long, qty: Double, tag: String, ok: Boolean)

class CoreOpsSpec extends SparkTestBase {

  private lazy val cat = Catalog(spark, sf)

  test("scan reads all fixture tables with non-empty schemas") {
    Catalog.tableNames.foreach { t =>
      val df = cat.table(t)
      assert(df.schema.fields.nonEmpty, t)
      assert(df.limit(1).count() == 1, t)
    }
  }

  test("bucketSort orders within partitions; mergeJoin plans SortMergeJoin") {
    val sorted = Q(cat, "orders").bucketSort(4, col("o_totalprice").asc)
    // every partition locally sorted
    val ok = sorted.df.select(col("o_totalprice")).rdd
      .mapPartitions { it =>
        val v = it.map(_.getDouble(0)).toSeq
        Iterator(v == v.sorted)
      }.collect()
    assert(ok.forall(identity))
    val mj = Q(cat, "lineitem").mergeJoin(Q(cat, "orders"),
      col("l_orderkey") === col("o_orderkey"))
    assert(mj.df.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    assert(mj.count() == Q(cat, "lineitem").count())
  }

  test("writePartitioned gives partition pruning (the reference's index-seek)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    val pcat = Catalog(spark, tmp)
    pcat.writePartitioned("orders_bystatus", cat.table("orders"), "o_orderstatus")
    val pruned = pcat.table("orders_bystatus").filter(col("o_orderstatus") === "F")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(o_orderstatus"), scan)
    assert(pruned.count() ==
      cat.table("orders").filter(col("o_orderstatus") === "F").count())
  }

  test("Dataset[T] encode/decode round-trips random rows (SURVEY §5.2.3, ≡ object_deserializer tests)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      id <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      q <- Gen.oneOf(Gen.chooseNum(-1e18, 1e18), Gen.oneOf(0.0, -0.0,
        Double.MaxValue, Double.MinPositiveValue, Double.NaN))
      t <- Gen.asciiPrintableStr
      b <- Gen.oneOf(true, false)
    } yield RtRow(id, q, t, b)
    val rows = (1 to 50).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    val back = rows.toDS().collect().toSeq
    assert(back.map(r => (r.id, r.tag, r.ok)) == rows.map(r => (r.id, r.tag, r.ok)))
    assert(back.map(_.qty).zip(rows.map(_.qty)).forall { case (a, b) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
    }, "doubles (incl. NaN/-0.0) must round-trip bit-exactly")
  }

  test("saltedJoin equals plain join and spreads the hot key over salts") {
    import spark.implicits._
    // skew: one key carries 10k rows, the rest 1 each
    val left = (Seq.fill(10000)(1L) ++ (2L to 100L)).toDF("k")
    val right = Seq((1L, "hot"), (2L, "a"), (50L, "b")).toDF("rk", "v")
    val plain = left.join(right, col("k") === col("rk")).count()
    val salted = Q(left).saltedJoin(Q(right), col("k"), col("rk"), 8)
    assert(salted.count() == plain && plain == 10002L)
    // shuffle key includes the salt: hot key hashes to many partitions
    val plan = salted.df.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
  }

  test("filter matches manual predicate") {
    val n = Q(cat, "lineitem").where(col("l_quantity") > 25).count()
    val all = Q(cat, "lineitem").count()
    assert(n > 0 && n < all)
  }

  test("take/skip: correct offset semantics (reference skip.rs:30 truncates)") {
    val sorted = Q(cat, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"))
      .sort(col("l_orderkey").asc, col("l_linenumber").asc)
    val first10 = sorted.take(10).collect().map(_.toSeq)
    val rows5to10 = sorted.skip(5).take(5).collect().map(_.toSeq)
    // skip(5).take(5) must equal rows 5..10 of the same order — the
    // reference's bug would yield 0 rows here.
    assert(rows5to10.toSeq == first10.drop(5).toSeq)
  }

  test("sort: standard ascending (reference in_memory_sort.rs:58-62 inverts)") {
    val asc = Q(cat, "orders").select(col("o_totalprice"))
      .sort(col("o_totalprice").asc).take(1).collect().head.getDouble(0)
    val min = Q(cat, "orders").df.agg(org.apache.spark.sql.functions.min("o_totalprice"))
      .collect().head.getDouble(0)
    assert(asc == min)
  }

  test("groupAgg: true min (reference select.rs:195-201 mutates min→max)") {
    val got = Q(cat, "lineitem").groupAgg(
      keys = Seq(col("l_returnflag")),
      aggs = Seq(org.apache.spark.sql.functions.min(col("l_quantity")).as("mn"),
        org.apache.spark.sql.functions.max(col("l_quantity")).as("mx")))
      .collect()
    got.foreach(r => assert(r.getDouble(1) <= r.getDouble(2)))
  }

  test("groupAgg with no keys aggregates the whole stream") {
    val r = Q(cat, "lineitem").groupAgg(Seq(), Seq(count(lit(1)).as("n")))
      .collect()
    assert(r.length == 1 && r.head.getLong(0) > 0)
  }

  test("hashJoin equals loopJoin output (same inner-join semantics)") {
    val l = Q(cat, "supplier")
    val r = Q(cat, "nation")
    val h = l.hashJoin(r, col("s_nationkey") === col("n_nationkey")).count()
    val nl = l.loopJoin(r, col("s_nationkey") === col("n_nationkey")).count()
    assert(h == nl && h > 0)
  }

  test("join preserves duplicate matches (reference hash_match.rs:91-99)") {
    // every lineitem row matches exactly one order: output = lineitem count
    val n = Q(cat, "lineitem")
      .hashJoin(Q(cat, "orders"), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(n == Q(cat, "lineitem").count())
  }

  test("countWhen counts only matching rows") {
    val q = Q(cat, "lineitem")
    val r = q.groupAgg(Seq(),
      Seq(q.countWhen(col("l_quantity") > 25).as("big"),
        count(lit(1)).as("all"))).collect().head
    assert(r.getLong(0) > 0 && r.getLong(0) < r.getLong(1))
  }

  test("distinct + union (roadmap ops)") {
    val u = Q(cat, "nation").select(col("n_nationkey").as("k"))
      .concat(Q(cat, "region").select(col("r_regionkey").as("k")))
    assert(u.count() == 30)
    assert(u.distinct.count() == 25) // region keys ⊂ nation keys
  }

  test("typed Dataset round-trip tolerates extra trailing columns " +
    "(reference object_deserializer.rs:229-253)") {
    import spark.implicits._
    val ds = Q(cat, "orders").as[OrderRow] // orders has 6 cols, OrderRow 3
    val row = ds.head()
    assert(row.o_totalprice > 0.0)
    assert(ds.count() == Q(cat, "orders").count())
  }

  test("asPositional binds by index, tolerates extra trailing columns, rejects too few " +
    "(reference object_deserializer.rs:229-253)") {
    import spark.implicits._
    // columns deliberately named differently from the case class fields —
    // by-name binding would fail or mis-bind; positional must succeed
    val df3 = Seq((7L, 2.5, "x", true, 99))
      .toDF("a", "b", "c", "d", "extra_trailing")
    val row = Q(df3).asPositional[RtRow].head()
    assert(row == RtRow(7L, 2.5, "x", ok = true)) // 5th column ignored
    intercept[IllegalArgumentException] {
      Q(Seq((1L, 2.0)).toDF("a", "b")).asPositional[RtRow] // too few columns
    }
  }

  test("asofJoinSliced == asofJoin on fixture events, including the all-one-key hot case") {
    import spark.implicits._
    val ev = graft.functions.EventTime.withNanos(cat.table("events"))
    val clicks = Q(ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts"))
    val purchases = Q(ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "value"))
    def asSet(q: Q) = q.df.collect().map(_.toSeq).toSet
    val plain = asSet(clicks.asofJoin(purchases, Seq("user_id"), "ts", "ts", Seq("value")))
    val sliced = asSet(clicks.asofJoinSliced(purchases, Seq("user_id"), "ts", "ts",
      Seq("value"), sliceWidth = 3600000000000L)) // 1h slices over ns timestamps
    assert(plain == sliced)
    // degenerate hot key: every row on ONE key — the case that serializes
    // the plain form into a single task; sliced must still agree
    val hotC = Q(clicks.df.withColumn("user_id", lit(0L)))
    val hotP = Q(purchases.df.withColumn("user_id", lit(0L)))
    val hp = asSet(hotC.asofJoin(hotP, Seq("user_id"), "ts", "ts", Seq("value")))
    val hs = asSet(hotC.asofJoinSliced(hotP, Seq("user_id"), "ts", "ts",
      Seq("value"), sliceWidth = 3600000000000L))
    assert(hp == hs)
  }

  test("asofJoinSliced null payloads: column-wise carry skips nulls like asofJoin") {
    import spark.implicits._
    // right: value=5 in slice 0, value=NULL in slice 1; left in slice 2.
    // Plain asof carries the last NON-NULL (5); a row-wise latest-struct
    // summary would carry slice 1's null — this pins the column-wise fix.
    val left = Q(Seq((1L, 7300L)).toDF("user_id", "ts"))
    val right = Q(Seq((1L, 10L, Some(5.0)), (1L, 3700L, None))
      .toDF("user_id", "ts", "value"))
    val plain = left.asofJoin(right, Seq("user_id"), "ts", "ts", Seq("value"))
      .df.collect().map(_.toSeq).toSet
    val sliced = left.asofJoinSliced(right, Seq("user_id"), "ts", "ts",
      Seq("value"), sliceWidth = 3600L).df.collect().map(_.toSeq).toSet
    assert(plain == sliced && plain.head.contains(5.0), s"plain=$plain sliced=$sliced")
  }

  test("asofJoinSliced carries multiple payload columns independently") {
    import spark.implicits._
    // value carried from slice 0; tag's latest non-null is in slice 1 —
    // independent column-wise carries must not couple
    val left = Q(Seq((1L, 7300L)).toDF("user_id", "ts"))
    val right = Q(Seq(
      (1L, 10L, Some(5.0), Some("a")),
      (1L, 3700L, None, Some("b")),
      (1L, 3800L, None, None))
      .toDF("user_id", "ts", "value", "tag"))
    val out = left.asofJoinSliced(right, Seq("user_id"), "ts", "ts",
      Seq("value", "tag"), sliceWidth = 3600L).df.collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 5.0 && out.head.getString(3) == "b", out.head.toString)
    val plain = left.asofJoin(right, Seq("user_id"), "ts", "ts",
      Seq("value", "tag")).df.collect()
    assert(out.map(_.toSeq).toSet == plain.map(_.toSeq).toSet)
  }

  test("catalog append enforces shape; mismatch rejected (reference SchemaError)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cat").toString
    val tmp = Catalog(spark, dir)
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.parquet(tmp.path("t"))
    tmp.append("t", Seq((3, "c")).toDF("k", "v"))
    assert(tmp.table("t").count() == 3)
    intercept[IllegalArgumentException] {
      tmp.append("t", Seq((1.5, 2.5)).toDF("k", "v")) // wrong types
    }
    intercept[IllegalArgumentException] {
      tmp.append("t", Seq(("a", 1)).toDF("v", "k")) // wrong order
    }
  }

  test("README migration example: the reference showcase chain runs verbatim on fixture tables") {
    import spark.implicits._
    val t1 = Q(cat, "lineitem")
    val t2 = Q(cat, "orders")
    val rows = t1
      .hashJoin(t2, t1.column(0) === t2.column(0)) // l_orderkey ⋈ o_orderkey
      .sort(t1.column(4).desc)
      .groupAgg(
        keys = Seq(t1.column(1), t1.column(2)), // l_partkey, l_suppkey
        aggs = Seq(max(t1.column(4) * 3).as("max3")))
      .collect()
    assert(rows.nonEmpty && rows.head.length == 3)
  }

  test("registerViews: full catalog queryable from plain spark.sql with injected functions") {
    val views = cat.registerViews(prefix = "g_")
    assert(views.contains("g_documents") && views.contains("g_lineitem"))
    // a pure-SQL user composes fixture tables with the injected
    // expression surface (no DataFrame API anywhere)
    val n = spark.sql(
      """SELECT count(*) AS n FROM g_documents
        | WHERE simhash60(split(text, ' ')) IS NOT NULL""".stripMargin)
      .head().getLong(0)
    assert(n == cat.table("documents").count())
    val joined = spark.sql(
      """SELECT count(*) AS n
        |  FROM g_lineitem l JOIN g_orders o ON l.l_orderkey = o.o_orderkey""".stripMargin)
      .head().getLong(0)
    assert(joined > 0)
    views.foreach(spark.catalog.dropTempView(_))
  }

  test("catalog csv/json round-trip preserves values with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val tmp = Catalog(spark, dir)
    val src = cat.table("nation") // small: 25 rows, long + string cols
    for (fmt <- Seq("csv", "json")) {
      tmp.writeAs("nation", src, fmt)
      val back = tmp.tableAs("nation", fmt, schema = Some(src.schema))
      assert(back.schema == src.schema, s"$fmt schema drift")
      val a = src.collect().map(_.toSeq).toSet
      val b = back.collect().map(_.toSeq).toSet
      assert(a == b, s"$fmt value drift")
    }
  }

  test("catalog DDL round-trip: create → append → drop → scan fails (reference storage/mod.rs:38-83)") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ddl").toString
    val tmp = Catalog(spark, dir)
    val sch = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("v", StringType, nullable = false)))
    assert(tmp.list.isEmpty && !tmp.exists("t"))
    tmp.createNew("t", sch)
    assert(tmp.exists("t") && tmp.list == Seq("t"))
    assert(tmp.table("t").count() == 0)
    assert(tmp.schema("t").fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("k", IntegerType), ("v", StringType)))
    // the created schema gates appends from row one
    tmp.append("t", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    assert(tmp.table("t").count() == 2)
    // create-new on an existing name errors (CollectionAlreadyExistsError)...
    intercept[IllegalArgumentException] { tmp.createNew("t", sch) }
    // ...but get-or-create returns it intact (create_collection)
    assert(tmp.create("t", sch).count() == 2)
    tmp.drop("t")
    assert(!tmp.exists("t") && tmp.list.isEmpty)
    intercept[Exception] { tmp.table("t").count() } // scan of dropped table fails
    intercept[IllegalArgumentException] { tmp.drop("t") } // CollectionDoesNotExistError
  }

  test("two catalogs sharing one session don't collide on bucketed table names") {
    import org.apache.spark.sql.functions.col
    val dirA = java.nio.file.Files.createTempDirectory("graft_bna").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_bnb").toString
    val (catA, catB) = (Catalog(spark, dirA), Catalog(spark, dirB))
    val src = Catalog(spark, sf)
    try {
      // same logical name, different catalogs, different CONTENT
      catA.writeBucketed("t", src.table("nation"), buckets = 2,
        bucketCols = Seq("n_nationkey"))
      catB.writeBucketed("t", src.table("region"), buckets = 2,
        bucketCols = Seq("r_regionkey"))
      // each catalog resolves ITS registration — writeBucketed B must
      // not have clobbered A's (the session-global-name failure mode)
      assert(catA.bucketedTable("t").columns.contains("n_nationkey"))
      assert(catB.bucketedTable("t").columns.contains("r_regionkey"))
      assert(catA.bucketedName("t") != catB.bucketedName("t"))
      assert(catA.bucketedExists("t") && catB.bucketedExists("t"))
      // a foreign/stale registration under a catalog's identifier is
      // rejected loudly, never silently served
      spark.sql(s"DROP TABLE ${catA.bucketedName("t")}")
      spark.sql(
        s"""CREATE TABLE ${catA.bucketedName("t")} USING parquet
           | LOCATION '${catB.path("t")}'""".stripMargin)
      val ex = intercept[IllegalArgumentException] { catA.bucketedTable("t") }
      assert(ex.getMessage.contains("stale or foreign registration"))
    } finally {
      catA.dropBucketed("t")
      catB.dropBucketed("t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dirA))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dirB))
    }
  }

  test("a stale bucket sidecar disagreeing with the data files is rejected, not silently served") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_bstale").toString
    val cat = Catalog(spark, dir)
    val src = Catalog(spark, sf)
    try {
      cat.writeBucketed("t", src.table("nation"), buckets = 8,
        bucketCols = Seq("n_nationkey"))
      // simulate the crash-window artifact the write ordering guards
      // against: a sidecar declaring FEWER buckets than the files carry
      // (Spark would silently drop every file with bucket id >= 4)
      cat.dropBucketed("t") // forget the session registration
      // write through the Hadoop fs so the local .crc shadow stays valid
      val hfs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val side = new org.apache.hadoop.fs.Path(
        s"${cat.path("t")}/_graft_buckets.json")
      val out = hfs.create(side, true)
      try out.write(
        """{"buckets":4,"bucketCols":["n_nationkey"],"sortCols":[]}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val ex = intercept[IllegalArgumentException] { cat.bucketedTable("t") }
      assert(ex.getMessage.contains("stale sidecar"), ex.getMessage)
      // the REVERSE direction passes the maxId gate (sidecar declares
      // MORE buckets than the data carries) but trips the file-count
      // witness the write recorded: a partially copied / manually
      // assembled directory must fail loudly too
      val out2 = hfs.create(side, true)
      try out2.write(
        """{"buckets":64,"bucketCols":["n_nationkey"],"sortCols":[],"nFiles":3}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out2.close()
      val ex2 = intercept[IllegalArgumentException] { cat.bucketedTable("t") }
      assert(ex2.getMessage.contains("data files"), ex2.getMessage)
      // a count-less sidecar (older write) with a consistent bucket
      // count still restores — the maxId-only gate
      val out3 = hfs.create(side, true)
      try out3.write(
        """{"buckets":8,"bucketCols":["n_nationkey"],"sortCols":[]}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out3.close()
      assert(cat.bucketedTable("t").count() == src.table("nation").count())
      cat.dropBucketed("t")
      // and with NO sidecar the same directory degrades to the safe
      // plain-parquet path (full content, no bucket metadata)
      assert(hfs.delete(side, false))
      assert(!cat.bucketedExists("t"))
      assert(cat.table("t").count() == src.table("nation").count())
    } finally {
      cat.dropBucketed("t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("appendBucketed: layout preserved (zero-shuffle join), sidecar file count updated, cross-session restore intact") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft_bappend").toString
    val cat = Catalog(spark, dir)
    val src = Catalog(spark, sf)
    try {
      val nat = src.table("nation")
      cat.writeBucketed("t", nat.filter(col("n_nationkey") < 10),
        buckets = 4, bucketCols = Seq("n_nationkey"))
      cat.appendBucketed("t", nat.filter(col("n_nationkey") >= 10))
      // full content back, exactly once each
      assert(cat.bucketedTable("t").count() == nat.count())
      // the append must not have degraded the layout: a self-join on the
      // bucket key still plans with NO exchange
      val j = cat.bucketedTable("t").as("a")
        .join(cat.bucketedTable("t").as("b").hint("merge"),
          col("a.n_nationkey") === col("b.n_nationkey"))
        .groupBy(col("a.n_nationkey")).agg(count(lit(1)).as("n"))
      assert(j.collect().length == nat.count())
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join degraded by append:\n$p")
      // cross-session restore: the sidecar's refreshed file count must
      // match the directory (appendBucketed rewrote it after the append)
      cat.dropBucketed("t")
      assert(!spark.catalog.tableExists(cat.bucketedName("t")))
      assert(cat.bucketedTable("t").count() == nat.count())
      // appending without a sidecar (never written / crash window) fails
      // loudly instead of silently inventing a layout
      val ex = intercept[IllegalStateException] {
        cat.appendBucketed("missing", nat)
      }
      assert(ex.getMessage.contains("writeBucketed"), ex.getMessage)
    } finally {
      cat.dropBucketed("t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("generation counter: atomic publish survives simulated torn states; a corrupt counter fails loudly instead of resetting the clock") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gen").toString
    val cat = graft.catalog.Catalog(spark, dir)
    try {
      assert(cat.currentGen("t") == 0L)
      assert(cat.nextGen("t") == 1L && cat.nextGen("t") == 2L)
      assert(cat.currentGen("t") == 2L)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"),
        spark.sparkContext.hadoopConfiguration)
      // a leftover staging file (crash between create and rename) is
      // invisible to readers and harmlessly overwritten by the next mint
      val tmp = new org.apache.hadoop.fs.Path(dir, ".gen_t.tmp")
      val o1 = fs.create(tmp, true); o1.write("999".getBytes); o1.close()
      assert(cat.currentGen("t") == 2L,
        "staging leftover leaked into the published counter")
      assert(cat.nextGen("t") == 3L)
      // the pre-r17 failure: fs.create(overwrite) truncated the live
      // file FIRST — a crash (or concurrent read) there saw ''. Parsing
      // that as 0 would reset the clock and resurrect every tombstoned
      // row (graves kill gens <= their own), so a torn counter must
      // fail loudly instead.
      val live = new org.apache.hadoop.fs.Path(dir, ".gen_t")
      val o2 = fs.create(live, true); o2.close() // empty = torn
      val ex = intercept[IllegalArgumentException] { cat.currentGen("t") }
      assert(ex.getMessage.contains("resurrect"), ex.getMessage)
      val o3 = fs.create(live, true); o3.write("12".getBytes); o3.close()
      assert(cat.nextGen("t") == 13L, "recovery from restored counter")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("collapseHwm: staged swap folds the marker to one row, keeps the max, and leaves no staging debris") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hwm").toString
    val cat = graft.catalog.Catalog(spark, dir)
    try {
      cat.createNew("idx_hwm", Seq(0L).toDF("batch_id").schema)
      Seq(0L, 1L, 2L).foreach(b =>
        cat.append("idx_hwm", Seq(b).toDF("batch_id")))
      assert(cat.table("idx_hwm").count() == 3)
      cat.collapseHwm("idx_hwm")
      assert(cat.table("idx_hwm").count() == 1)
      assert(cat.table("idx_hwm").head().getLong(0) == 2L,
        "collapse lost the high-water mark")
      // staged-swap hygiene: neither the staging dir nor the .old copy
      // survives a clean collapse (a crash BETWEEN the renames leaves
      // `.old` — the recoverable state drop-then-rewrite never had)
      val left = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(!left.exists(n => n.startsWith(".collapse_") ||
        n.endsWith(".old")), s"staging debris left: $left")
      cat.collapseHwm("idx_hwm") // idempotent on an already-folded marker
      assert(cat.table("idx_hwm").head().getLong(0) == 2L)
      cat.collapseHwm("absent_hwm") // no-op without the table
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
