package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables

/** Core analytic query surface (SURVEY.md §2.2).
  *
  * All money/quantity aggregations cast to DECIMAL *before* aggregating:
  * decimal addition is exact and associative, so the distributed Spark sum
  * and the sequential DuckDB oracle sum agree bit-for-bit after the final
  * cast to DOUBLE. Ratios are computed as divisions of already-exact
  * doubles. Every query output carries a deterministic ORDER BY.
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))
  private def d(c: Column): Column = c.cast(DoubleType)
  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** exact per-row revenue term: extendedprice * (1 - discount), DECIMAL */
  private def discPrice: Column =
    dec(col("l_extendedprice"), 12, 2) * dec(lit(1.0) - col("l_discount"), 3, 2)

  // --- q01: pricing summary (filter + groupBy + exact decimal aggs) -------
  def q01(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("2000-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        d(sum(dec(col("l_quantity"), 12, 2))).as("sum_qty"),
        d(sum(dec(col("l_extendedprice"), 12, 2))).as("sum_base_price"),
        d(sum(discPrice)).as("sum_disc_price"),
        d(sum(discPrice * dec(lit(1.0) + col("l_tax"), 3, 2))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "avg_qty", "count_order")
      .orderBy("l_returnflag", "l_linestatus")

  // --- q03: shipping priority (3-way join + agg + top-k) ------------------
  def q03(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = Tables(spark, dir, "orders").filter(col("o_orderdate") < ts("1998-03-15 00:00:00"))
    val l = Tables(spark, dir, "lineitem").filter(col("l_shipdate") > ts("1998-03-15 00:00:00"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(d(sum(discPrice)).as("revenue"))
      .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  // --- q05: local supplier volume (6-way star join, broadcast dims) -------
  def q05(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    val n = Tables(spark, dir, "nation")
    val s = Tables(spark, dir, "supplier")
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1997-01-01 00:00:00"))
    val l = Tables(spark, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c),
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(d(sum(discPrice)).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // --- q06: forecast revenue (selective filter + global agg) --------------
  def q06(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(d(sum(dec(col("l_extendedprice"), 12, 2) * dec(col("l_discount"), 3, 2)))
        .as("revenue"))

  // --- q04: order priority checking (EXISTS -> left-semi join) -------------
  def q04(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-07-01 00:00:00") &&
        col("o_orderdate") < ts("1996-10-01 00:00:00"))
    val l = Tables(spark, dir, "lineitem")
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  // --- q14: promo revenue ratio (broadcast dim join + conditional agg) -----
  def q14(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1996-03-01 00:00:00"))
    val p = Tables(spark, dir, "part")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        d(sum(when(col("p_type") === "ECONOMY", discPrice)
          .otherwise(lit(0).cast(DecimalType(18, 4))))) /
        d(sum(discPrice))).as("promo_revenue"))
  }

  // --- q07: volume shipping between two nations (dual-role dim join) -------
  /** the nation table joins twice under different roles (supplier vs
    * customer nation) — both broadcast; the symmetric pair filter lands
    * after the star, the year bucket comes from the ntz shipdate
    * (timezone-free on both engines) */
  def q07(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val s = Tables(spark, dir, "supplier")
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val l = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1995-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_9" && col("cust_nation") === "NATION_10") ||
        (col("supp_nation") === "NATION_10" && col("cust_nation") === "NATION_9"))
      .withColumn("l_year", year(col("l_shipdate")).cast(LongType))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(d(sum(discPrice)).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  // --- q18: large-volume orders (having-subquery as semi join + top-n) -----
  /** the HAVING subquery becomes a left-semi join against the aggregated
    * big-order keys — the aggregation runs once, the semi join carries
    * only the key column, and the final top-n sorts on a unique tiebreak */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val big = l.groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"), 12, 2)).as("qsum"))
      .filter(col("qsum") > 250)
      .select(col("l_orderkey").as("big_key"))
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    o.join(big, col("o_orderkey") === col("big_key"), "left_semi")
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .agg(d(sum(dec(col("l_quantity"), 12, 2))).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  // --- q22: dormant high-balance customers (scalar subquery + anti join) --
  /** scalar-subquery threshold + NOT EXISTS: the threshold is an exact
    * decimal-sum mean (order-insensitive, so it replays bit-for-bit),
    * joined back as a broadcast 1-row scalar — same treatment as q11, no
    * driver-side collect in the plan. SUM over zero rows is NULL and
    * `bal > NULL` is never true, so an all-nonpositive-balance corpus
    * yields an empty result with no special-casing. The NOT EXISTS
    * becomes a left-anti join against RECENT orders ("no order since
    * 2000" — every synthetic customer has SOME order, so the classic
    * no-orders-at-all predicate would be vacuously empty here) */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val thr = c.filter(col("c_acctbal") > 0.0)
      .agg((sum(dec(col("c_acctbal"), 12, 2)).cast("double") /
        count(lit(1)).cast("double")).as("thr"))
    val recent = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= ts("2000-01-01 00:00:00"))
    c.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        d(sum(dec(col("c_acctbal"), 12, 2))).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  // --- top-k per group (window rank) ---------------------------------------
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 3)
      .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rnk")
  }

  // --- distinct aggregation -------------------------------------------------
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  // --- rollup ---------------------------------------------------------------
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(d(sum(dec(col("l_quantity"), 12, 2))).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("sum_qty"), col("n"))
      .orderBy("rflag", "lstatus")

  /** CUBE with grouping_id: all 4 grouping sets of (returnflag,
    * linestatus) in one pass — Spark plans a single Expand + aggregate,
    * not 4 scans */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(d(sum(dec(col("l_quantity"), 12, 2))).as("sum_qty"),
        count(lit(1)).as("n"), grouping_id().cast(LongType).as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("gid"), col("sum_qty"), col("n"))
      .orderBy("rflag", "lstatus", "gid")

  /** irregular GROUPING SETS — the multi-granularity shapes ROLLUP/CUBE
    * can't express (here: both 1-D marginals plus the 2-D cells, but NO
    * grand total). Same single-pass Expand + one aggregate plan as cube:
    * the input is replicated once per grouping set map-side, never
    * re-scanned per set. */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(d(sum(dec(col("l_quantity"), 12, 2))).as("sum_qty"),
        count(lit(1)).as("n"), grouping_id().cast(LongType).as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("gid"), col("sum_qty"), col("n"))
      .orderBy("rflag", "lstatus", "gid")

  /** pivot: event counts and value sums per user-cohort nation, one
    * column group per event type — Spark's two-phase pivot (distinct
    * values then pivoting aggregate) */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("cohort", (col("user_id") % 5).cast(LongType))
      .groupBy(col("cohort"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .orderBy("cohort")

  // --- tumbling-window aggregation over events -------------------------------
  def eventsWindow(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), d(sum(dec(col("value"), 18, 6))).as("sum_value"))
      .orderBy("day", "event_type")

  // --- sliding (hopping) window aggregation ----------------------------------
  /** 1-hour windows hopping every 15 minutes: each event contributes to 4
    * overlapping windows — Spark's `window(ts, len, slide)` expands the
    * assignment INSIDE the scan task (a generator, no join), then one
    * partial-agg shuffle on (window, type). The oracle replays the
    * expansion with a 15-min time bucket × range(0,4). */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), d(sum(dec(col("value"), 18, 6))).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        col("sum_value"))
      .orderBy("ws", "event_type")

  // --- interval-overlap concurrency ------------------------------------------
  /** Peak concurrency: each event is "active" for 5 minutes; the classic
    * +1/−1 sweep turns interval overlap into ONE ordered running sum per
    * group — no interval self-join. Ties (an end meeting a start at the
    * same instant) order ends first, so back-to-back intervals don't
    * count as overlapping. One exchange on event_type. */
  def concurrency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("s"))
    val deltas = ev.select(col("event_type"), col("s").as("t"), lit(1L).as("d"))
      .unionByName(ev.select(col("event_type"),
        (col("s") + lit(300000000L)).as("t"), lit(-1L).as("d")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("load", sum(col("d")).over(w))
      .groupBy(col("event_type"))
      .agg(max(col("load")).as("peak_concurrency"), count(lit(1)).as("n_deltas"))
      .orderBy("event_type")
  }

  // --- pareto frontier (skyline) ---------------------------------------------
  /** Skyline query: orders not dominated on (newer date, higher total).
    * Distributed shape: dominance only depends on the MAX total per
    * date, so phase 1 is a distributed per-date max (one partial-agg
    * shuffle over |dates| keys), phase 2 a running strictly-newer max
    * over the date maxima (a |dates|-row window — driver-scale by
    * construction), phase 3 a broadcast join back onto the full table.
    * No global sort of the data, no pairwise dominance join. Equal
    * totals on the same date both survive (neither dominates). */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("d_us"),
        dec(col("o_totalprice"), 12, 2).as("total"))
    val dmax = o.groupBy(col("d_us")).agg(max(col("total")).as("dmax"))
    val newer = Window.orderBy(col("d_us").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val frontier = dmax.withColumn("best_newer", max(col("dmax")).over(newer))
    o.join(broadcast(frontier), "d_us")
      .filter(col("total") === col("dmax") &&
        (col("best_newer").isNull || col("total") > col("best_newer")))
      .select(col("o_orderkey"), col("d_us"), d(col("total")).as("total"))
      .orderBy(col("d_us").desc, col("o_orderkey"))
  }

  // --- exact Pearson correlation ---------------------------------------------
  /** Pearson r between quantity and price over lineitem — the
    * scaled-BIGINT discipline end to end: x, y, x², y², xy all round to
    * scaled integers BEFORE one partial-agg pass (5 exact sums, one
    * shuffle of one row per partition), then r is a fixed IEEE sequence
    * (sqrt correctly rounded) — bit-exact vs DuckDB. */
  def correlation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
    def si(c: Column, scale: Double): Column =
      floor(c * lit(scale) + lit(0.5)).cast("long")
    val agg = li.agg(
      count(lit(1)).as("n"),
      sum(si(col("x"), 100.0)).as("sx"),
      sum(si(col("y"), 100.0)).as("sy"),
      sum(si(col("x") * col("x"), 100.0)).as("sxx"),
      sum(si(col("y") * col("y"), 100.0)).as("syy"),
      sum(si(col("x") * col("y"), 100.0)).as("sxy"))
    val nD = col("n").cast("double")
    def dd(c: Column): Column = c.cast("double") / lit(100.0)
    val cov = dd(col("sxy")) / nD - (dd(col("sx")) / nD) * (dd(col("sy")) / nD)
    val vx = dd(col("sxx")) / nD - (dd(col("sx")) / nD) * (dd(col("sx")) / nD)
    val vy = dd(col("syy")) / nD - (dd(col("sy")) / nD) * (dd(col("sy")) / nD)
    agg.select(col("n"), (cov / (sqrt(vx) * sqrt(vy))).as("pearson_r"))
  }

  // --- one-pass data profile --------------------------------------------------
  /** Table profiling (the "describe my data" pass every pipeline starts
    * with): per-column null count, distinct count, min/max — for R
    * columns in ONE conditional-aggregation scan (no per-column rescans),
    * exploded to a row per column. */
  def profile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_ndv"),
        min(col(c).cast("string")).as(s"${c}_min"),
        max(col(c).cast("string")).as(s"${c}_max"))
    }
    val one = o.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map(c => struct(lit(c).as("col_name"),
      col(s"${c}_nulls").as("n_nulls"), col(s"${c}_ndv").as("ndv"),
      col(s"${c}_min").as("min_str"), col(s"${c}_max").as("max_str")))
    one.select(explode(array(perCol: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_nulls"), col("p.ndv"),
        col("p.min_str"), col("p.max_str"))
      .orderBy("col_name")
  }

  // --- seasonality matrix -----------------------------------------------------
  /** hour-of-day × day-of-week activity profile over events — the load
    * shape dashboards draw; one partial-agg shuffle over 168 cells */
  def seasonality(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(dayofweek(col("ts")).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"),
        d(sum(dec(col("value"), 18, 6))).as("sum_value"))
      .orderBy("dow", "hod")

  // --- sessionization: gaps-and-islands, 30-minute inactivity gap -----------
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val lagT = lag(unix_micros(col("ts")), 1).over(w)
    Tables(spark, dir, "events")
      .withColumn("new_s",
        when(lagT.isNull || unix_micros(col("ts")) - lagT > 1800000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      // Session bounds as epoch-micro BIGINTs: the events table is physically
      // TIMESTAMP(NANOS), which different readers surface at different
      // precisions; epoch micros is the portable representation.
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("session_start_us"),
        max(unix_micros(col("ts"))).as("session_end_us"))
      .orderBy("user_id", "session_id")
  }

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01,
    "q03_shipping_priority" -> q03,
    "q04_order_priority" -> q04,
    "q07_volume_shipping" -> q07,
    "q14_promo_revenue" -> q14,
    "q18_large_orders" -> q18,
    "q22_lost_customers" -> q22,
    "q05_local_supplier" -> q05,
    "q06_forecast_revenue" -> q06,
    "q_topk_per_group" -> topkPerGroup,
    "q_distinct_agg" -> distinctAgg,
    "q_rollup" -> rollupAgg,
    "q_cube" -> cubeAgg,
    "q_grouping_sets" -> groupingSetsAgg,
    "q_pivot" -> pivotAgg,
    "q_events_window" -> eventsWindow,
    "q_sliding_window" -> slidingWindow,
    "q_concurrency" -> concurrency,
    "q_correlation" -> correlation,
    "q_profile" -> profile,
    "q_seasonality" -> seasonality,
    "q_skyline" -> skyline,
    "q_sessionize" -> sessionize)

  val oracles: Map[String, String] = Map(
    "q04_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT 100.0 *
        | CAST(SUM(CASE WHEN p_type = 'ECONOMY'
        |   THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2))
        |   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE)
        | AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-03-01 00:00:00'""".stripMargin,
    "q07_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
        |FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        | AND c_custkey = o_custkey
        | AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        | AND ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
        |   OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
        | AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        | AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q22_lost_customers" ->
      """SELECT c_nationkey, COUNT(*) AS numcust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |  FROM customer WHERE c_acctbal > 0.0)
        | AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                 AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2)) * CAST(1 + l_tax AS DECIMAL(3,2))) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_shipping_priority" ->
      """SELECT o_orderkey,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
        | o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        | AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q05_local_supplier" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        | AND r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q06_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        | AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3
        |ORDER BY o_orderpriority, rnk""".stripMargin,
    "q_distinct_agg" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag, COALESCE(l_linestatus, 'ALL') AS lstatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin,
    "q_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        | COALESCE(l_linestatus, 'ALL') AS lstatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus, gid""".stripMargin,
    "q_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        | COALESCE(l_linestatus, 'ALL') AS lstatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus))
        |ORDER BY rflag, lstatus, gid""".stripMargin,
    "q_pivot" ->
      """SELECT user_id % 5 AS cohort,
        | CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        | CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        | CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        | CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin,
    "q_correlation" ->
      """WITH li AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(floor(x * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(SUM(CAST(floor(y * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
        |    CAST(SUM(CAST(floor(x * x * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sxx,
        |    CAST(SUM(CAST(floor(y * y * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS syy,
        |    CAST(SUM(CAST(floor(x * y * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sxy
        |  FROM li)
        |SELECT n,
        |  (CAST(sxy AS DOUBLE) / 100.0 / CAST(n AS DOUBLE)
        |   - (CAST(sx AS DOUBLE) / 100.0 / CAST(n AS DOUBLE))
        |     * (CAST(sy AS DOUBLE) / 100.0 / CAST(n AS DOUBLE)))
        |  / (sqrt(CAST(sxx AS DOUBLE) / 100.0 / CAST(n AS DOUBLE)
        |       - (CAST(sx AS DOUBLE) / 100.0 / CAST(n AS DOUBLE))
        |         * (CAST(sx AS DOUBLE) / 100.0 / CAST(n AS DOUBLE)))
        |     * sqrt(CAST(syy AS DOUBLE) / 100.0 / CAST(n AS DOUBLE)
        |       - (CAST(sy AS DOUBLE) / 100.0 / CAST(n AS DOUBLE))
        |         * (CAST(sy AS DOUBLE) / 100.0 / CAST(n AS DOUBLE))))
        |  AS pearson_r
        |FROM a""".stripMargin,
    "q_profile" ->
      """WITH t AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_nulls,
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS k_ndv,
        |    MIN(CAST(o_orderkey AS VARCHAR)) AS k_min,
        |    MAX(CAST(o_orderkey AS VARCHAR)) AS k_max,
        |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_nulls,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS c_ndv,
        |    MIN(CAST(o_custkey AS VARCHAR)) AS c_min,
        |    MAX(CAST(o_custkey AS VARCHAR)) AS c_max,
        |    CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_nulls,
        |    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS s_ndv,
        |    MIN(o_orderstatus) AS s_min, MAX(o_orderstatus) AS s_max,
        |    CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
        |    CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS p_ndv,
        |    MIN(o_orderpriority) AS p_min, MAX(o_orderpriority) AS p_max
        |  FROM orders),
        |s AS (
        |  SELECT 'o_orderkey' AS col_name, k_nulls AS n_nulls, k_ndv AS ndv,
        |         k_min AS min_str, k_max AS max_str FROM t
        |  UNION ALL SELECT 'o_custkey', c_nulls, c_ndv, c_min, c_max FROM t
        |  UNION ALL SELECT 'o_orderstatus', s_nulls, s_ndv, s_min, s_max FROM t
        |  UNION ALL SELECT 'o_orderpriority', p_nulls, p_ndv, p_min, p_max FROM t)
        |SELECT * FROM s ORDER BY col_name""".stripMargin,
    "q_seasonality" ->
      """SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |  CAST(hour(ts) AS BIGINT) AS hod, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_concurrency" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS s FROM events),
        |deltas AS (
        |  SELECT event_type, s AS t, CAST(1 AS BIGINT) AS d FROM ev
        |  UNION ALL
        |  SELECT event_type, s + 300000000, CAST(-1 AS BIGINT) FROM ev),
        |lo AS (
        |  SELECT event_type,
        |    CAST(SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS load
        |  FROM deltas)
        |SELECT event_type, CAST(MAX(load) AS BIGINT) AS peak_concurrency,
        |  COUNT(*) AS n_deltas
        |FROM lo GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_skyline" ->
      """WITH o AS (
        |  SELECT o_orderkey, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS d_us,
        |    CAST(o_totalprice AS DECIMAL(12,2)) AS total
        |  FROM orders),
        |dm AS (SELECT d_us, MAX(total) AS dmax FROM o GROUP BY d_us),
        |bn AS (
        |  SELECT d_us, dmax,
        |    MAX(dmax) OVER (ORDER BY d_us DESC
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_newer
        |  FROM dm)
        |SELECT o.o_orderkey, o.d_us, CAST(o.total AS DOUBLE) AS total
        |FROM o JOIN bn USING (d_us)
        |WHERE o.total = bn.dmax
        |  AND (best_newer IS NULL OR o.total > best_newer)
        |ORDER BY d_us DESC, o_orderkey""".stripMargin,
    "q_sliding_window" ->
      """WITH e AS (
        |  SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE
        |           AS ws,
        |         event_type, value
        |  FROM events, UNNEST(range(0, 4)) u(k))
        |SELECT CAST(ws AS TIMESTAMP) AS ws, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_window" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |              OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM m
        |)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        | MIN(epoch_us(ts)) AS session_start_us, MAX(epoch_us(ts)) AS session_end_us
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)
}
