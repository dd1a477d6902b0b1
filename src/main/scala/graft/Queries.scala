package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.dsl.Q
import graft.functions.{TextFunctions => TF}

/** Typed row for the Dataset[T] (deserialize) parity query — the analogue
  * of the reference's serde target structs (reference src/lib.rs:108-114).
  */
case class OrderRow(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)

/** The per-operator query/oracle inventory (SURVEY.md §2 coverage).
  *
  * Conventions:
  *  - every Spark output column is aliased to the same name as in the
  *    DuckDB oracle (driver compare sorts columns by name);
  *  - multi-row float aggregates rounded identically on both sides;
  *  - each query notes the SURVEY §2 operator row(s) it covers.
  */
object Queries {

  private def cat(spark: SparkSession, dir: String) = Catalog(spark, dir)

  type QFn = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- core

  /** §2.1 #1 TableScan: full column-pruned scan. */
  private val q01_scan: QFn = (s, d) =>
    Q(cat(s, d), "lineitem").select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_returnflag")).df

  /** §2.1 #2 Filter: conjunctive predicate, pushed to the parquet scan. */
  private val q02_filter: QFn = (s, d) =>
    Q(cat(s, d), "lineitem")
      .where(col("l_quantity") > 25 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount")).df

  /** §2.1 #3 Select: per-row expression eval (arithmetic + string concat),
    * the reference's SelectBuilder column/value surface. */
  private val q03_project: QFn = (s, d) =>
    Q(cat(s, d), "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
      concat_ws("/", col("l_returnflag"), col("l_linestatus")).as("flag_status"),
      (col("l_quantity") * lit(3.0)).as("qty3")).df

  /** §2.1 #4 Select-Aggregate: TPC-H Q1-shaped grouped aggregation
    * (sum/avg/count) with SQL GROUP BY semantics (not adjacency runs). */
  private val q04_agg: QFn = (s, d) =>
    Q(cat(s, d), "lineitem")
      .where(col("l_quantity") > 1)
      .groupAgg(
        keys = Seq(col("l_returnflag"), col("l_linestatus")),
        aggs = Seq(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("n"))).df

  /** §2.1 #5 Take (limit) as deterministic top-k: Spark plans
    * TakeOrderedAndProject — no global sort materialization. */
  private val q05_topk: QFn = (s, d) =>
    Q(cat(s, d), "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .sort(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .take(100).df

  /** §2.1 #6 Skip (offset) — correct semantics (reference skip.rs:30 bug
    * fixed): rows 101-200 of the same deterministic order. */
  private val q06_skip: QFn = (s, d) =>
    Q(cat(s, d), "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .sort(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .skip(100).take(100).df

  /** §2.1 #7 NestedLoop: genuinely non-equi condition so Spark plans
    * BroadcastNestedLoopJoin — the distributed form of the reference's
    * rescan-inner loop. */
  private val q07_loop_join: QFn = (s, d) =>
    Q(cat(s, d), "supplier")
      .loopJoin(Q(cat(s, d), "nation"),
        col("s_nationkey") < col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_nationkey"),
        col("n_name")).df

  /** §2.1 #8 HashMatch: fact-fact equi-join (shuffle-hash build side =
    * right, matching the reference's build+probe shape). */
  private val q08_hash_join: QFn = (s, d) =>
    Q(cat(s, d), "lineitem")
      .hashJoin(Q(cat(s, d), "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
        col("o_totalprice")).df

  /** §2.1 #8 variant: broadcast hash join on a dimension-sized build side —
    * the 100 TB plan for every fact⋈dim join (zero shuffle). */
  private val q09_broadcast_join: QFn = (s, d) =>
    Q(cat(s, d), "lineitem")
      .broadcastJoin(Q(cat(s, d), "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("s_name"),
        col("s_acctbal")).df

  /** §2.1 #9 InMemorySort → distributed range sort (standard asc/desc;
    * the reference's inverted-ascending quirk is not replicated). */
  private val q10_sort: QFn = (s, d) =>
    Q(cat(s, d), "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_returnflag"))
      .sort(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc).df

  /** §2.3 Distinct (reference roadmap README.md:94). */
  private val q11_distinct: QFn = (s, d) =>
    Q(cat(s, d), "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct.df

  /** §2.3 Concatenate (reference roadmap README.md:82) = UNION ALL. */
  private val q12_union: QFn = (s, d) => {
    val n = Q(cat(s, d), "nation").select(col("n_nationkey").as("k"),
      col("n_name").as("name"))
    val r = Q(cat(s, d), "region").select(col("r_regionkey").as("k"),
      col("r_name").as("name"))
    n.concat(r).df
  }

  /** §2.1 #4 countWhen: the reference's truthiness-conditional count
    * (select.rs:247-263) as count(when(cond)). */
  private val q13_count_when: QFn = (s, d) => {
    val q = Q(cat(s, d), "lineitem")
    q.groupAgg(
      keys = Seq(col("l_returnflag")),
      aggs = Seq(
        count(lit(1)).as("n_rows"),
        q.countWhen(col("l_quantity") > 25).as("n_big"),
        q.countWhen(col("l_discount") < 0.05).as("n_lowdisc"))).df
  }

  /** §7.2 flagship pipeline: scan ⋈ scan hash join → filter → group/max —
    * the reference's showcase chain (benches/10K_hash_match.rs:86-102). */
  private val q14_pipeline: QFn = (s, d) =>
    Q(cat(s, d), "lineitem")
      .hashJoin(Q(cat(s, d), "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("o_orderstatus") =!= "X")
      .groupAgg(
        keys = Seq(col("o_orderpriority")),
        aggs = Seq(
          max(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("max_rev"),
          count(lit(1)).as("n"))).df

  /** Window functions (beyond-reference capability): top-3 orders per
    * customer by row_number — partitioned window, no driver collect. */
  private val q15_window_rank: QFn = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Q(cat(s, d), "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  /** TPC-H Q3-shaped 3-way join + group + deterministic top-10.
    * Broadcast side = the FILTERED customer dimension (broadcastJoin
    * hints its right argument — orders is fact-sized and must stream). */
  private val q16_revenue_top: QFn = (s, d) =>
    Q(cat(s, d), "orders")
      .broadcastJoin(
        Q(cat(s, d), "customer").where(col("c_mktsegment") === "BUILDING"),
        col("c_custkey") === col("o_custkey"))
      .hashJoin(Q(cat(s, d), "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupAgg(
        keys = Seq(col("l_orderkey"), col("o_orderdate").cast("date").as("odate")),
        aggs = Seq(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue")))
      .sort(col("revenue").desc, col("l_orderkey").asc)
      .take(10).df

  /** TPC-H Q5-shaped star join: region→nation→customer→orders→lineitem,
    * revenue per nation. Dimensions broadcast; the single shuffle is the
    * orders⋈lineitem key — the plan that survives 100×. */
  private val q17_nation_revenue: QFn = (s, d) => {
    val c = cat(s, d)
    Q(c, "lineitem")
      .hashJoin(Q(c, "orders"), col("l_orderkey") === col("o_orderkey"))
      .broadcastJoin(Q(c, "customer"), col("o_custkey") === col("c_custkey"))
      .broadcastJoin(Q(c, "nation"), col("c_nationkey") === col("n_nationkey"))
      .broadcastJoin(Q(c, "region"), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name").isin("ASIA", "EUROPE"))
      .groupAgg(
        keys = Seq(col("r_name"), col("n_name")),
        aggs = Seq(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))).df
  }

  /** Semi join (EXISTS) — free capability beyond the reference's inner-only
    * join surface (SURVEY §7.3 step 3). */
  private val q18_semi: QFn = (s, d) =>
    Q(cat(s, d), "customer")
      .df.join(cat(s, d).table("orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** Anti join (NOT EXISTS): customers with no very large order (plain
    * no-orders-at-all is empty at sf0.01 — every customer has orders). */
  private val q19_anti: QFn = (s, d) =>
    Q(cat(s, d), "customer")
      .df.join(
        cat(s, d).table("orders").filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** ROLLUP grouping sets (beyond-reference capability). */
  private val q20_rollup: QFn = (s, d) =>
    cat(s, d).table("lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))

  /** §2.3 Constant Scan (reference roadmap README.md:83) = LocalRelation. */
  private val q21_constant: QFn = (s, _) => {
    import s.implicits._
    Seq((1, "URGENT"), (2, "HIGH"), (3, "MEDIUM"), (4, "NOT SPECIFIED"),
      (5, "LOW")).toDF("pri_id", "pri_name")
  }

  /** §2.1 #10 Deserialize: Dataset[OrderRow] with a typed filter+map —
    * the reference's serde-into-struct surface (deserializing.rs). The
    * lambda math mirrors the SQL oracle exactly (floor on positives). */
  private val q22_typed: QFn = (s, d) => {
    import s.implicits._
    Q(cat(s, d), "orders").as[OrderRow]
      .filter((o: OrderRow) => o.o_totalprice > 300000.0)
      .map((o: OrderRow) => (o.o_orderkey, o.o_custkey,
        (o.o_totalprice / 100000.0).toLong))
      .toDF("o_orderkey", "o_custkey", "price_bucket")
  }

  /** §3.2/§4.1 declarative Condition IR end-to-end: built with the
    * Condition DSL, CNF-normalized (the rewrite the reference builds but
    * never wires, query/mod.rs:52-54), compiled to a Catalyst Column.
    * Exercises ==/!=/</LIKE/NOT/LEN and the normalizer on a real filter.
    */
  private val q23_condition: QFn = (s, d) => {
    import graft.conditions.Condition._
    val cond =
      ((c("o_orderpriority") like "1%") || (c("o_totalprice") < v(50000.0))) &&
        !(c("o_orderstatus") !== v("F")) &&
        (len(c("o_orderpriority")) >= v(5))
    Q(cat(s, d), "orders")
      .where(cond.normalize.column)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority")).df
  }

  /** Outer-join surface (free beyond the reference's inner-only joins,
    * SURVEY §7.3 step 3): customers ⟕ their large orders — most rows
    * carry nulls on the right. */
  private val q24_outer: QFn = (s, d) =>
    Q(cat(s, d), "customer")
      .hashJoin(
        Q(cat(s, d).table("orders").filter(col("o_totalprice") > 400000.0)),
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice")).df

  /** Date-function surface over the TIMESTAMP column (UTC session):
    * monthly order volume. */
  private val q25_date_agg: QFn = (s, d) =>
    Q(cat(s, d), "orders").groupAgg(
      keys = Seq(year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m")),
      aggs = Seq(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))).df

  /** As-of join (operator Spark lacks natively; Q.asofJoin composes it
    * as union → single key-sort shuffle → running last_value window):
    * each click event gets the user's latest prior purchase value.
    * Oracle = DuckDB's native ASOF JOIN. */
  private val q26_asof_join: QFn = (s, d) => {
    val ev = graft.functions.EventTime.withNanos(cat(s, d).table("events"))
    val clicks = Q(ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts")))
    val purchases = Q(ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("value").as("last_purchase")))
    clicks.asofJoin(purchases, keys = Seq("user_id"),
      leftTime = "ts", rightTime = "p_ts", payload = Seq("last_purchase"))
      // µs precision: DuckDB truncates parquet nano-timestamps to µs
      .df.selectExpr("event_id", "user_id", "ts div 1000 AS ts_us",
        "last_purchase")
  }

  /** Exact interpolated percentiles (beyond-reference capability; the
    * sketch/approx form is [[q35_quantiles_approx]] — the 100 TB default,
    * self-verified there against these exact values with an in-engine
    * error-bound check).
    * All three price percentiles share ONE aggregation buffer (array
    * percentage form) instead of three independent sorted buffers —
    * same exact values, one sort per group instead of three.
    * Outputs are integer CENTS (one round(x·100) quantization of the
    * identical interpolated double — the ExactMath discipline), which
    * retired the DOMINANT historical compare sensitivity: round(double,
    * 2) of a percentile landing exactly on .xx5 used to round apart
    * across engines (observed once at sf0.001: 52724.245 → .24 vs .25).
    * One rarer mode survives quantization BY CONSTRUCTION: Spark and
    * DuckDB each interpolate the percentile in IEEE doubles, and if
    * their interpolations differ in the final ulp AND x·100 lands
    * exactly on a .5 boundary, the single round() still resolves apart.
    * A future sweep flip on q27/q35 should be triaged as THIS mode
    * (inputs-identical, one-cent delta on one row), not as a grid
    * violation — the full ExactMath fix would be interpolating in
    * integer cents end-to-end.
    * percentile() is a full sort-based aggregate: one shuffle on the
    * group key, spillable — exact form is for small/medium groups. */
  private val q27_quantiles: QFn = (s, d) => {
    // cents grid: the interpolated percentile double is quantized ONCE
    // to an integer (round(x·100) — the ExactMath discipline), which
    // retires the documented cross-engine .xx5 flip (52724.245 at
    // sf0.001: round(double,2) resolved differently per DuckDB build;
    // a single nearest-integer rounding of the IDENTICAL double is
    // portable). Residual risk, by construction: the two engines
    // interpolate independently, so a 1-ulp interpolation divergence
    // landing exactly on a half-cent can still round apart — triage a
    // future q27/q35 sweep flip as that (one-cent, one-row), not as a
    // grid-discipline violation.
    def cents(c: Column): Column = round(c * lit(100d)).cast("long")
    cat(s, d).table("lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75))).as("ps"),
        cents(median(col("l_quantity"))).as("med_qty_c"))
      .select(col("l_returnflag"),
        cents(element_at(col("ps"), 1)).as("p25_c"),
        cents(element_at(col("ps"), 2)).as("p50_c"),
        cents(element_at(col("ps"), 3)).as("p75_c"),
        col("med_qty_c"))
  }

  /** Approximate percentiles — the bench-default quantile form at scale:
    * approx_percentile is a mergeable sketch aggregate (fixed-size state,
    * map-side partial merge, no per-group sort). accuracy=10000 ⇒ rank
    * error ≤ 0.01%.
    *
    * Self-verifying formulation (sketch values are engine-specific, so
    * they can never hash-match a DuckDB oracle directly): the query
    * computes BOTH the sketch and its exact twin in one aggregation and
    * outputs the exact values plus `within_bound` — whether each sketch
    * value lies between the exact percentiles at rank p ± ε, with
    * ε = 10× the documented 1/accuracy guarantee. The oracle computes
    * the same exact values and literal TRUE, so the row hash-matches iff
    * the sketch honors its error bound. At 100 TB the sketch runs alone
    * (fixed-size state); the exact twin here is the verification harness.
    */
  private val q35_quantiles_approx: QFn = (s, d) => {
    // accuracy=2500 (rank error ≤ 4e-4) after the r12→r13 bench audit:
    // the isolated re-measure split q35's 2.4 s as ~⅔ the EXACT
    // percentile twins (the verification harness — two full sort-based
    // buffers that exist only to bound-check the sketch) and ~⅓ the
    // sketches themselves, where accuracy=10000's per-row update cost
    // bought precision the 10×-slack bound never uses. At 100 TB only
    // the sketch runs; the harness cost is a bench-fixture property.
    val eps = 0.004 // rank slack: 10× the 1/accuracy=4e-4 guarantee
    val pcts = Seq(0.25, 0.5, 0.75)
    // exact percentiles at [p1..p3, p1-ε, p1+ε, p2-ε, p2+ε, p3-ε, p3+ε]
    val probe = pcts ++ pcts.flatMap(p => Seq(p - eps, p + eps))
    def bounded(approx: Column, lo: Column, hi: Column): Column =
      approx >= lo && approx <= hi
    cat(s, d).table("lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_percentile(col("l_extendedprice"),
          array(pcts.map(lit): _*), lit(2500)).as("aps"),
        approx_percentile(col("l_quantity"), lit(0.5), lit(2500)).as("amed"),
        percentile(col("l_extendedprice"), array(probe.map(lit): _*)).as("ps"),
        percentile(col("l_quantity"),
          array(lit(0.5), lit(0.5 - eps), lit(0.5 + eps))).as("qs"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1) * 100d).cast("long").as("p25_c"),
        round(element_at(col("ps"), 2) * 100d).cast("long").as("p50_c"),
        round(element_at(col("ps"), 3) * 100d).cast("long").as("p75_c"),
        round(element_at(col("qs"), 1) * 100d).cast("long").as("med_qty_c"),
        (pcts.indices.map(i => bounded(element_at(col("aps"), i + 1),
          element_at(col("ps"), 4 + 2 * i), element_at(col("ps"), 5 + 2 * i)))
          .reduce(_ && _) &&
          bounded(col("amed"), element_at(col("qs"), 2), element_at(col("qs"), 3)))
          .as("within_bound"))
  }

  /** Moving aggregate (rolling-window analytics surface): 7-row moving
    * average of daily revenue. Two stages: the daily groupBy (one
    * shuffle, map-side combined) collapses the data to one row per day;
    * the unpartitioned ordered window then runs over that TINY aggregate
    * (rows = distinct days), where a single-task window is the correct
    * plan — never put an unpartitioned window over raw data. */
  private val q36_moving_avg: QFn = (s, d) => {
    val daily = cat(s, d).table("orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
    daily.select(col("day"), col("revenue"),
      round(avg(col("revenue")).over(w), 2).as("ma7"))
  }

  /** Exact DECIMAL aggregation — the reference's roadmap "decimal type"
    * (its `Decimal` is a plain f64, README.md:71; SURVEY §2.3): cast to
    * DecimalType(12,2) and sum EXACTLY — no float summation-order drift,
    * so the oracle compare needs no rounding crutch. The result is
    * rendered as a string because Spark and DuckDB widen decimal sums to
    * different precisions (22,2 vs 38,2); the VALUE is identical.
    * Decimal sums are Spark-native (unscaled-long accumulation) — the
    * exact-money aggregation path a billing pipeline needs at scale. */
  private val q37_decimal_agg: QFn = (s, d) =>
    cat(s, d).table("lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).as("dec_sum"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        col("dec_sum").cast("string").as("total_exact"), col("n"))

  /** Approximate count-distinct — the sketch default at scale (HLL++:
    * fixed-size mergeable state vs q34's exact two-phase expansion).
    *
    * Self-verifying (as q35): HLL++ estimates are engine-specific, so
    * the query computes the sketch AND the exact count in one pass and
    * outputs the exact counts plus `within_bound` = |approx − exact| ≤
    * 3·rsd·exact (rsd=0.05 is one standard deviation of the estimator;
    * 3σ = 15% relative). The oracle outputs the same exact counts and
    * literal TRUE — the row hash-matches iff the sketch is in bound.
    * At 100 TB the sketch runs alone; the exact twin verifies it here.
    */
  private val q38_distinct_approx: QFn = (s, d) =>
    cat(s, d).table("lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.05).as("ap"),
        approx_count_distinct(col("l_suppkey"), 0.05).as("asup"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .select(col("l_returnflag"), col("n_parts"), col("n_supps"),
        (abs(col("ap") - col("n_parts")) <= col("n_parts") * lit(0.15) &&
          abs(col("asup") - col("n_supps")) <= col("n_supps") * lit(0.15))
          .as("within_bound"))

  /** Correlated scalar-aggregate subquery — `(SELECT sum(...) FROM
    * lineitem l WHERE l.l_orderkey = o.o_orderkey)` per order row. The
    * implementation is the decorrelated form Catalyst itself rewrites
    * such subqueries into (RewriteCorrelatedScalarSubquery): aggregate
    * the inner side by the correlation key once, then ONE left join —
    * at 100 TB that is one shuffle pair on the join key instead of a
    * per-row re-scan; orders without lineitems keep scalar-subquery
    * NULL semantics through the left join. */
  private val q39_corr_scalar: QFn = (s, d) => {
    // exact DECIMAL arithmetic (as q37): double summation-order drift
    // between Spark partial aggregation and DuckDB flips .xx5 roundings
    // on ~0.1% of groups; decimal sums are order-independent and exact
    val rev = cat(s, d).table("lineitem")
      .groupBy(col("l_orderkey"))
      // round the DECIMAL (exact HALF_UP in both engines), THEN cast:
      // rounding after a double cast would re-hit the .xx5 tie
      .agg(round(
        sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(4,2)")), 2)
        .cast("double").as("disc_rev"))
    cat(s, d).table("orders")
      .join(rev, col("o_orderkey") === col("l_orderkey"), "left")
      .filter(col("disc_rev") > col("o_totalprice"))
      .select(col("o_orderkey"), col("o_totalprice"), col("disc_rev"))
  }

  /** Distribution-rank window family — ntile / percent_rank / cume_dist
    * per market segment (quartile bucketing for tiering, the standard
    * "rank customers within segment" analytics shape). One shuffle on
    * the partition key; ties broken deterministically by custkey so
    * both engines agree row-for-row. */
  private val q40_ntile_prank: QFn = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    cat(s, d).table("customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("prank", round(percent_rank().over(w), 6))
      .withColumn("cdist", round(cume_dist().over(w), 6))
  }

  /** RANGE-frame window (value-range, not row-count, framing — q36 is
    * the ROWS twin): per customer, revenue of the trailing 30 *days* of
    * orders at each order date. The frame is over an integer day key
    * (epoch_ms div 86400000) so both engines frame identically. One
    * shuffle on the partition key; the frame scan is linear per
    * partition (running multiset), not quadratic. */
  private val q41_range_frame: QFn = (s, d) => {
    // o_orderdate is TIMESTAMP_NTZ; datediff on the date part gives the
    // same integer day key as epoch_ms//86400000 (fixture dates are
    // midnight-aligned)
    val day = datediff(col("o_orderdate").cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-30, 0)
    cat(s, d).table("orders")
      .select(col("o_custkey"), col("o_orderkey"), day.as("day"),
        col("o_totalprice"))
      .withColumn("rev30", round(sum(col("o_totalprice")).over(w), 2))
  }

  /** JSON column surface — `events.props` is a JSON string; extract a
    * typed field with get_json_object (codegen'd path expression, no
    * UDF) and aggregate. At scale JSON parsing is pure map work; the
    * one shuffle is the groupBy. (A fixed-schema from_json is the
    * faster form when the shape is known; the path form is the
    * schema-on-read form.) */
  private val q42_json_extract: QFn = (s, d) =>
    cat(s, d).table("events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"),
        sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high"))

  /** Explicit GROUPING SETS (the general form behind q20's ROLLUP and
    * q29's CUBE): an arbitrary, non-hierarchical set list —
    * (flag, status), (flag), (status) but NOT the grand total — in one
    * pass. Spark plans a single Expand + one aggregation shuffle;
    * grouping() markers distinguish set-nulls from data values. */
  private val q43_grouping_sets: QFn = (s, d) =>
    cat(s, d).table("lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .select(
        when(col("g_rf") === 1, lit("ALL")).otherwise(col("l_returnflag")).as("rf"),
        when(col("g_ls") === 1, lit("ALL")).otherwise(col("l_linestatus")).as("ls"),
        col("n"), col("sum_qty"))

  /** Unpivot (melt) — the reshape inverse of q30's pivot: the three
    * lineitem measures become (measure, value) rows in one map-side
    * Expand (no shuffle until the aggregation). */
  private val q44_unpivot: QFn = (s, d) =>
    cat(s, d).table("lineitem")
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        variableColumnName = "measure",
        valueColumnName = "value")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))

  /** Navigation window functions — first_value / last_value /
    * nth_value over an explicit full-partition frame (the default frame
    * stops at CURRENT ROW, where last_value degenerates to the current
    * row — both engines agree once the frame is explicit). */
  private val q45_window_nav: QFn = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cat(s, d).table("orders")
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
  }

  /** Explode (lateral unnest) — the Generator/UDTF surface: word
    * frequency over exploded document tokens. Explode is map-side (no
    * shuffle); the one shuffle is the groupBy on the word. */
  private val q28_explode: QFn = (s, d) =>
    cat(s, d).table("documents")
      .select(explode(TF.words(col("text"))).as("word"))
      .filter(length(col("word")) >= 3)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 100)

  /** CUBE grouping sets (rollup is q20): all four grouping combinations
    * in one pass — Spark plans a single Expand + one aggregation shuffle,
    * not four scans. The 'ALL' marker comes from grouping() (the
    * grouping-set indicator), NOT coalesce — so a real NULL or a literal
    * 'ALL' value in the data can never be conflated with the rollup rows. */
  private val q29_cube: QFn = (s, d) =>
    cat(s, d).table("lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .select(
        when(col("g_rf") === 1, lit("ALL")).otherwise(col("l_returnflag")).as("rf"),
        when(col("g_ls") === 1, lit("ALL")).otherwise(col("l_linestatus")).as("ls"),
        col("n"), col("sum_price"))

  /** Pivot (columns from values) — reshape surface: quantity totals per
    * returnflag × linestatus as columns. Same single-shuffle plan as the
    * equivalent conditional aggregation. */
  private val q30_pivot: QFn = (s, d) =>
    cat(s, d).table("lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_quantity")), 2))

  /** Range (interval) join: events banded by value range — genuinely
    * non-equi, plans BroadcastNestedLoopJoin against the tiny band table.
    * 100 TB note: with *regular* bands the scalable rewrite is the
    * map-side `floor(value/width)` equi-key (zero join at all); the
    * non-equi form here is for irregular intervals, and stays viable
    * exactly as long as the interval side is broadcast-small. */
  private val q31_range_join: QFn = (s, d) => {
    import s.implicits._
    val bands = Seq((0L, 0.0, 100.0), (1L, 100.0, 200.0), (2L, 200.0, 300.0),
      (3L, 300.0, 400.0), (4L, 400.0, 500.0)).toDF("band_id", "lo", "hi")
    cat(s, d).table("events")
      .join(broadcast(bands),
        col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
  }

  /** Scalar subquery: filter against a single aggregated value, computed
    * once and broadcast (no per-row re-evaluation). max() keeps the
    * threshold order-independent-exact so the oracle compare is safe. */
  private val q32_scalar_sub: QFn = (s, d) => {
    val c = cat(s, d).table("customer")
    val thresh = c.agg((max(col("c_acctbal")) - lit(5000.0)).as("thresh"))
    c.crossJoin(broadcast(thresh))
      .filter(col("c_acctbal") > col("thresh"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  /** Set operations INTERSECT/EXCEPT (the rest of the Concatenate family,
    * reference roadmap README.md:82): customers with both open and
    * finished orders, minus the very-large-order ones. Each set op is a
    * distinct-aggregate — one shuffle on the full row as key. */
  private val q33_setops: QFn = (s, d) => {
    val o = cat(s, d).table("orders")
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val p = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val big = o.filter(col("o_totalprice") > 400000.0).select(col("o_custkey"))
    f.intersect(p).except(big)
  }

  /** Exact distinct-count aggregates (the exact form of the HLL sketch in
    * SketchSpec): Spark plans count(DISTINCT x) as a two-phase expand +
    * partial aggregation — correct at any scale, with approx_count_distinct
    * as the single-pass 100 TB default. */
  private val q34_count_distinct: QFn = (s, d) =>
    Q(cat(s, d), "lineitem").groupAgg(
      keys = Seq(col("l_returnflag")),
      aggs = Seq(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n"))).df

  // ------------------------------------------------------------- registry

  val all: Map[String, QFn] = Map(
    "q01_scan" -> q01_scan,
    "q02_filter" -> q02_filter,
    "q03_project" -> q03_project,
    "q04_agg" -> q04_agg,
    "q05_topk" -> q05_topk,
    "q06_skip" -> q06_skip,
    "q07_loop_join" -> q07_loop_join,
    "q08_hash_join" -> q08_hash_join,
    "q09_broadcast_join" -> q09_broadcast_join,
    "q10_sort" -> q10_sort,
    "q11_distinct" -> q11_distinct,
    "q12_union" -> q12_union,
    "q13_count_when" -> q13_count_when,
    "q14_pipeline" -> q14_pipeline,
    "q15_window_rank" -> q15_window_rank,
    "q16_revenue_top" -> q16_revenue_top,
    "q17_nation_revenue" -> q17_nation_revenue,
    "q18_semi" -> q18_semi,
    "q19_anti" -> q19_anti,
    "q20_rollup" -> q20_rollup,
    "q21_constant" -> q21_constant,
    "q22_typed" -> q22_typed,
    "q23_condition" -> q23_condition,
    "q24_outer" -> q24_outer,
    "q25_date_agg" -> q25_date_agg,
    "q26_asof_join" -> q26_asof_join,
    "q27_quantiles" -> q27_quantiles,
    "q28_explode" -> q28_explode,
    "q29_cube" -> q29_cube,
    "q35_quantiles_approx" -> q35_quantiles_approx,
    "q30_pivot" -> q30_pivot,
    "q31_range_join" -> q31_range_join,
    "q32_scalar_sub" -> q32_scalar_sub,
    "q33_setops" -> q33_setops,
    "q34_count_distinct" -> q34_count_distinct,
    "q36_moving_avg" -> q36_moving_avg,
    "q37_decimal_agg" -> q37_decimal_agg,
    "q38_distinct_approx" -> q38_distinct_approx,
    "q39_corr_scalar" -> q39_corr_scalar,
    "q40_ntile_prank" -> q40_ntile_prank,
    "q41_range_frame" -> q41_range_frame,
    "q42_json_extract" -> q42_json_extract,
    "q43_grouping_sets" -> q43_grouping_sets,
    "q44_unpivot" -> q44_unpivot,
    "q45_window_nav" -> q45_window_nav,
  ) ++ ExtensionQueries.all

  val oracles: Map[String, String] = Map(
    "q01_scan" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |       l_extendedprice, l_returnflag FROM lineitem""".stripMargin,
    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        | WHERE l_quantity > 25 AND l_returnflag = 'R'""".stripMargin,
    "q03_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1.0 - l_discount) AS revenue,
        |       l_returnflag || '/' || l_linestatus AS flag_status,
        |       l_quantity * 3.0 AS qty3 FROM lineitem""".stripMargin,
    "q04_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       count(*) AS n
        |  FROM lineitem WHERE l_quantity > 1
        | GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q05_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        | ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        | LIMIT 100""".stripMargin,
    "q06_skip" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        | ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        | LIMIT 100 OFFSET 100""".stripMargin,
    "q07_loop_join" ->
      """SELECT s_suppkey, s_name, n_nationkey, n_name
        |  FROM supplier JOIN nation ON s_nationkey < n_nationkey""".stripMargin,
    "q08_hash_join" ->
      """SELECT l_orderkey, l_linenumber, o_custkey, o_totalprice
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "q09_broadcast_join" ->
      """SELECT l_orderkey, l_linenumber, s_name, s_acctbal
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey""".stripMargin,
    "q10_sort" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag
        |  FROM lineitem
        | ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC""".stripMargin,
    "q11_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q12_union" ->
      """SELECT n_nationkey AS k, n_name AS name FROM nation
        | UNION ALL
        |SELECT r_regionkey AS k, r_name AS name FROM region""".stripMargin,
    "q13_count_when" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |       count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |       count(*) FILTER (WHERE l_discount < 0.05) AS n_lowdisc
        |  FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q14_pipeline" ->
      """SELECT o_orderpriority,
        |       max(l_extendedprice * (1.0 - l_discount)) AS max_rev,
        |       count(*) AS n
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_orderstatus <> 'X'
        | GROUP BY o_orderpriority""".stripMargin,
    "q15_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |    FROM orders) t
        | WHERE rn <= 3""".stripMargin,
    "q16_revenue_top" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        | WHERE c_mktsegment = 'BUILDING'
        | GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        | ORDER BY revenue DESC, l_orderkey ASC
        | LIMIT 10""".stripMargin,
    "q17_nation_revenue" ->
      """SELECT r_name, n_name,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        | WHERE r_name IN ('ASIA', 'EUROPE')
        | GROUP BY r_name, n_name""".stripMargin,
    "q18_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        | WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "q19_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        | WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_custkey = c.c_custkey
        |                      AND o.o_totalprice > 400000.0)""".stripMargin,
    "q20_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(sum(l_quantity), 2) AS sum_qty
        |  FROM lineitem
        | GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q21_constant" ->
      """SELECT * FROM (VALUES (1, 'URGENT'), (2, 'HIGH'), (3, 'MEDIUM'),
        | (4, 'NOT SPECIFIED'), (5, 'LOW')) AS t(pri_id, pri_name)""".stripMargin,
    "q22_typed" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(floor(o_totalprice / 100000.0) AS BIGINT) AS price_bucket
        |  FROM orders WHERE o_totalprice > 300000.0""".stripMargin,
    "q23_condition" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |  FROM orders
        | WHERE (o_orderpriority LIKE '1%' OR o_totalprice < 50000.0)
        |   AND NOT (o_orderstatus <> 'F')
        |   AND length(o_orderpriority) >= 5""".stripMargin,
    "q24_outer" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |  FROM customer LEFT JOIN (SELECT * FROM orders
        |                            WHERE o_totalprice > 400000.0) o
        |    ON c_custkey = o.o_custkey""".stripMargin,
    "q25_date_agg" ->
      """SELECT year(o_orderdate)::BIGINT AS y, month(o_orderdate)::BIGINT AS m,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |  FROM orders GROUP BY 1, 2""".stripMargin,
    "q26_asof_join" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
        |       p.value AS last_purchase
        |  FROM (SELECT event_id, user_id, ts FROM events
        |         WHERE event_type = 'click') c
        |  ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
        |                   WHERE event_type = 'purchase') p
        |    ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "q27_quantiles" ->
      """SELECT l_returnflag,
        |       CAST(round(quantile_cont(l_extendedprice, 0.25)*100) AS BIGINT) AS p25_c,
        |       CAST(round(quantile_cont(l_extendedprice, 0.5)*100) AS BIGINT) AS p50_c,
        |       CAST(round(quantile_cont(l_extendedprice, 0.75)*100) AS BIGINT) AS p75_c,
        |       CAST(round(quantile_cont(l_quantity, 0.5)*100) AS BIGINT) AS med_qty_c
        |  FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q28_explode" ->
      """SELECT word, count(*) AS n
        |  FROM (SELECT unnest(string_split(
        |          regexp_replace(lower(trim(text)),'\s+',' ','g'),' ')) AS word
        |          FROM documents)
        | WHERE length(word) >= 3
        | GROUP BY word HAVING count(*) >= 100""".stripMargin,
    "q29_cube" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
        |       CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS ls,
        |       count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
        |  FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q30_pivot" ->
      """SELECT l_returnflag,
        |       round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS "F",
        |       round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS "O"
        |  FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q31_range_join" ->
      """SELECT band_id, count(*) AS n, round(sum(value), 2) AS sum_v
        |  FROM events
        |  JOIN (VALUES (0::BIGINT, 0.0, 100.0), (1, 100.0, 200.0),
        |               (2, 200.0, 300.0), (3, 300.0, 400.0),
        |               (4, 400.0, 500.0)) AS bands(band_id, lo, hi)
        |    ON value >= lo AND value < hi
        | GROUP BY band_id""".stripMargin,
    "q32_scalar_sub" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        | WHERE c_acctbal > (SELECT max(c_acctbal) - 5000.0 FROM customer)""".stripMargin,
    "q33_setops" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0""".stripMargin,
    "q34_count_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(*) AS n
        |  FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q35_quantiles_approx" ->
      """SELECT l_returnflag,
        |       CAST(round(quantile_cont(l_extendedprice, 0.25)*100) AS BIGINT) AS p25_c,
        |       CAST(round(quantile_cont(l_extendedprice, 0.5)*100) AS BIGINT) AS p50_c,
        |       CAST(round(quantile_cont(l_extendedprice, 0.75)*100) AS BIGINT) AS p75_c,
        |       CAST(round(quantile_cont(l_quantity, 0.5)*100) AS BIGINT) AS med_qty_c,
        |       TRUE AS within_bound
        |  FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q38_distinct_approx" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       TRUE AS within_bound
        |  FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q37_decimal_agg" ->
      """SELECT l_returnflag,
        |       sum(l_extendedprice::DECIMAL(12,2))::VARCHAR AS total_exact,
        |       count(*) AS n
        |  FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q36_moving_avg" ->
      """WITH daily AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |         round(sum(o_totalprice), 2) AS revenue
        |    FROM orders GROUP BY 1)
        |SELECT day, revenue,
        |       round(avg(revenue) OVER (ORDER BY day
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7
        |  FROM daily""".stripMargin,
    "q39_corr_scalar" ->
      """SELECT o_orderkey, o_totalprice,
        |       (SELECT round(sum(l.l_extendedprice::DECIMAL(12,2) *
        |                         (1.0 - l.l_discount)::DECIMAL(4,2)), 2)::DOUBLE
        |          FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS disc_rev
        |  FROM orders o
        | WHERE (SELECT round(sum(l.l_extendedprice::DECIMAL(12,2) *
        |                         (1.0 - l.l_discount)::DECIMAL(4,2)), 2)::DOUBLE
        |          FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |       > o_totalprice""".stripMargin,
    "q40_ntile_prank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |       ntile(4) OVER w AS quartile,
        |       round(percent_rank() OVER w, 6) AS prank,
        |       round(cume_dist() OVER w, 6) AS cdist
        |  FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey ASC)""".stripMargin,
    "q41_range_frame" ->
      """SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) // 86400000 AS day,
        |       o_totalprice,
        |       round(sum(o_totalprice) OVER (
        |         PARTITION BY o_custkey
        |         ORDER BY epoch_ms(o_orderdate) // 86400000
        |         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS rev30
        |  FROM orders""".stripMargin,
    "q42_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |       sum(CAST(props->>'$.k' AS BIGINT))::BIGINT AS sum_k,
        |       round(avg(CAST(props->>'$.k' AS BIGINT)), 4) AS avg_k,
        |       sum(CASE WHEN CAST(props->>'$.k' AS BIGINT) > 50
        |                THEN 1::BIGINT ELSE 0::BIGINT END)::BIGINT AS n_high
        |  FROM events GROUP BY event_type""".stripMargin,
    "q43_grouping_sets" ->
      """SELECT CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL'
        |            ELSE l_returnflag END AS rf,
        |       CASE WHEN grouping(l_linestatus) = 1 THEN 'ALL'
        |            ELSE l_linestatus END AS ls,
        |       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |  FROM lineitem
        | GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                         (l_returnflag), (l_linestatus))""".stripMargin,
    "q44_unpivot" ->
      """SELECT l_returnflag, measure, count(*) AS n,
        |       round(sum(value), 2) AS total
        |  FROM (SELECT l_returnflag, measure, value
        |          FROM lineitem
        |          UNPIVOT (value FOR measure IN
        |                   (l_quantity, l_extendedprice, l_discount)))
        | GROUP BY l_returnflag, measure""".stripMargin,
    "q45_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_totalprice) OVER w AS first_price,
        |       last_value(o_totalprice) OVER w AS last_price,
        |       nth_value(o_totalprice, 2) OVER w AS second_price
        |  FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND UNBOUNDED FOLLOWING)""".stripMargin,
  ) ++ ExtensionQueries.oraclesAll
}
