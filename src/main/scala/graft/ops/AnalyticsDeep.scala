package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables

/** The rest of the TPC-H-shaped query surface (SURVEY.md §2.2 depth):
  * correlated min/avg subqueries, market-share CASE ratios, scalar
  * thresholds, NOT-IN / sole-match EXISTS+NOT-EXISTS patterns, disjunctive
  * predicate pushdown, distribution-of-counts.
  *
  * The synthetic schema has no partsupp table and no commit/receipt dates,
  * so q02/q09/q11/q16/q20/q21 re-anchor on the lineitem supplier-part
  * relationship and shipdate-vs-orderdate lateness while keeping the
  * original queries' PLAN shapes — that is what matters for the engine:
  * the same subquery decorrelations, semi/anti joins, and aggregate
  * pipelines Catalyst must produce at 100 TB.
  *
  * Exactness discipline matches [[Analytics]]: decimal sums, final casts
  * to double, deterministic ORDER BY with unique tiebreaks.
  */
object AnalyticsDeep {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))
  private def d(c: Column): Column = c.cast(DoubleType)
  private def ts(s: String): Column = lit(s).cast("timestamp")
  private def discPrice: Column =
    dec(col("l_extendedprice"), 12, 2) * dec(lit(1.0) - col("l_discount"), 3, 2)

  /** distinct supplier-part shipping relationships — the partsupp stand-in */
  private def shipPairs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()

  // --- q02: min-cost supplier per part (correlated MIN subquery) ----------
  /** decorrelated as: aggregate min per part, then join back on the
    * (partkey, min-value) pair — one shuffle for the agg, one for the
    * self-join, both on p_partkey; dims broadcast */
  def q02(spark: SparkSession, dir: String): DataFrame = {
    val pairs = shipPairs(spark, dir)
    val s = Tables(spark, dir, "supplier")
    val p = Tables(spark, dir, "part").filter(col("p_size") < 10)
    val j = pairs
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("s_acctbal"))
    val minPer = j.groupBy(col("p_partkey").as("mp"))
      .agg(min(col("s_acctbal")).as("min_bal"))
    j.join(minPer, col("p_partkey") === col("mp") && col("s_acctbal") === col("min_bal"))
      .select("p_partkey", "p_name", "s_name", "s_acctbal")
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_name"))
  }

  // --- q08: market share of one supplier nation in one region ------------
  def q08(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables(spark, dir, "nation")
      .join(broadcast(Tables(spark, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val suppNation = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
    val l = Tables(spark, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("c_nk"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .withColumn("o_year", year(col("o_orderdate")).cast(LongType))
      .groupBy(col("o_year"))
      .agg((d(sum(when(col("supp_nation") === "NATION_9", discPrice)
          .otherwise(lit(0).cast(DecimalType(18, 4))))) /
        d(sum(discPrice))).as("mkt_share"))
      .orderBy("o_year")
  }

  // --- q09: product profit by supplier nation and ship year ---------------
  /** profit per line = revenue minus retail cost of the shipped quantity —
    * the ps_supplycost stand-in; the whole expression stays decimal until
    * after the sum */
  def q09(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part").filter(col("p_name").like("%red%"))
    val amount = discPrice -
      dec(col("p_retailprice"), 12, 2) * dec(col("l_quantity"), 12, 2)
    Tables(spark, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .withColumn("o_year", year(col("l_shipdate")).cast(LongType))
      .groupBy(col("n_name"), col("o_year"))
      .agg(d(sum(amount)).as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  // --- q10: returned-item revenue per customer (top 20) -------------------
  def q10(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= ts("1997-01-01 00:00:00") &&
        col("o_orderdate") < ts("1997-04-01 00:00:00"))
    val l = Tables(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(d(sum(discPrice)).as("revenue"))
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  // --- q11: important parts (global scalar threshold subquery) ------------
  /** threshold = 1.2x the AVERAGE per-part value, not a fraction of the
    * total: the average is scale-invariant (a fixed fraction of total
    * selects nothing once the part count grows 10x) */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: the per-part aggregate feeds BOTH the threshold
    // scalar and the output — without it the full lineitem scan + shuffle
    // runs twice. The threshold is a broadcast single-row join rather than
    // a driver collect: one plan, no extra job, and the shape that scales
    // (the scalar never passes through the driver)
    val pv = Tables(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(discPrice).as("v"))
      .localCheckpoint()
    val thr = pv.agg((d(sum(col("v"))) * 1.2 / count(lit(1))).as("thr"))
    pv.crossJoin(broadcast(thr))
      .select(col("l_partkey"), d(col("v")).as("value"))
      .filter(d(col("v")) > col("thr"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  // --- q12: late shipments by return flag (CASE aggregation) --------------
  def q12(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
        col("l_shipdate") < ts("1998-01-01 00:00:00"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("l_returnflag")
  }

  // --- q13: distribution of per-customer order counts ---------------------
  /** left outer join so zero-order customers survive into the c_count=0
    * bucket; the filtered join predicate keeps the filter INSIDE the join
    * (not a pre-filter on customers) */
  def q13(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
    Tables(spark, dir, "customer")
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  // --- q15: top supplier(s) by quarter revenue (scalar MAX subquery) ------
  /** the per-supplier revenue aggregate is checkpointed once and feeds
    * BOTH the max scalar and the equality filter (q11's treatment); the
    * max joins back as a broadcast 1-row scalar — no driver collect, no
    * lineitem rescan. An empty quarter yields a NULL max, `=` NULL never
    * matches, empty result — no special-casing. */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1996-04-01 00:00:00"))
      .groupBy(col("l_suppkey"))
      .agg(d(sum(discPrice)).as("total_revenue"))
      .localCheckpoint()
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("mx"))
      .join(broadcast(Tables(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  // --- q16: supplier variety per part attribute (NOT IN as anti join) -----
  def q16(spark: SparkSession, dir: String): DataFrame = {
    val bad = Tables(spark, dir, "supplier").filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("bad_key"))
    val p = Tables(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    shipPairs(spark, dir)
      .join(broadcast(bad), col("l_suppkey") === col("bad_key"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  // --- q17: small-quantity revenue (correlated AVG subquery) --------------
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val avgq = l.groupBy(col("l_partkey").as("ap"))
      .agg((d(sum(dec(col("l_quantity"), 12, 2))) / count(lit(1))).as("avg_qty"))
    val p = Tables(spark, dir, "part").filter(col("p_brand") === "Brand#3")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(avgq, col("l_partkey") === col("ap"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((d(sum(dec(col("l_extendedprice"), 12, 2))) / 7.0).as("avg_yearly"))
  }

  // --- q19: disjunctive brand/size/quantity predicate ---------------------
  /** three AND-groups under an OR — the classic test that the optimizer
    * still pushes the common join key and per-branch ranges down */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    Tables(spark, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(d(sum(discPrice)).as("revenue"))
  }

  // --- q20: suppliers moving volume of a part family (nested semi joins) --
  def q20(spark: SparkSession, dir: String): DataFrame = {
    val red = Tables(spark, dir, "part").filter(col("p_name").like("%red%"))
      .select(col("p_partkey"))
    val movers = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
        col("l_shipdate") < ts("1998-01-01 00:00:00"))
      .join(broadcast(red), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"), 12, 2)).as("qsum"))
      .filter(col("qsum") > 500)
      .select(col("l_suppkey"))
    Tables(spark, dir, "supplier")
      .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_name")
  }

  // --- q21: suppliers who alone held up multi-supplier orders -------------
  /** EXISTS(other supplier) + NOT EXISTS(other LATE supplier), recast as
    * per-order supplier COUNTS: "exists another supplier" ⟺ the order has
    * ≥2 distinct suppliers; "no other late supplier" ⟺ the order has
    * exactly 1 late supplier (the candidate itself, by construction).
    * That replaces the two inequality joins (which Catalyst could not
    * reuse an exchange across — the late subtree ran twice) with two
    * small keyed aggregates, both semi-joined back on orderkey; `late`
    * is checkpointed so its lineitem⋈orders pass runs once. */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val oF = Tables(spark, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val late = Tables(spark, dir, "lineitem")
      .join(oF, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select(col("l_orderkey").as("lo"), col("l_suppkey").as("ls")).distinct()
      .localCheckpoint()
    // only LATE orders can qualify, so the ≥2-supplier count runs over the
    // semi-joined slice, not all of lineitem — the big shuffle shrinks to
    // the candidate orders (late-order set is broadcastable: it is bounded
    // by the F-status late orders, a small fraction of lineitem)
    val lateOrders = late.select(col("lo")).distinct()
    val multi = Tables(spark, dir, "lineitem")
      .join(broadcast(lateOrders), col("l_orderkey") === col("lo"), "left_semi")
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("ns"))
      .filter(col("ns") >= 2)
    val sole = late.groupBy(col("lo")).agg(count(lit(1)).as("nl"))
      .filter(col("nl") === 1)
      .withColumnRenamed("lo", "lo1")
    late
      .join(multi, col("lo") === col("l_orderkey"), "left_semi")
      .join(sole, col("lo") === col("lo1"), "left_semi")
      .join(broadcast(Tables(spark, dir, "supplier")), col("ls") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val queries: Map[String, Q] = Map(
    "q02_min_supplier" -> q02,
    "q08_market_share" -> q08,
    "q09_product_profit" -> q09,
    "q10_returned_items" -> q10,
    "q11_important_parts" -> q11,
    "q12_late_shipments" -> q12,
    "q13_order_distribution" -> q13,
    "q15_top_supplier" -> q15,
    "q16_supplier_variety" -> q16,
    "q17_small_qty_revenue" -> q17,
    "q19_disjunctive_pred" -> q19,
    "q20_volume_suppliers" -> q20,
    "q21_waiting_supplier" -> q21)

  private val disc =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2))"

  val oracles: Map[String, String] = Map(
    "q02_min_supplier" ->
      s"""WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         |j AS (SELECT p_partkey, p_name, s_name, s_acctbal
         |      FROM pairs JOIN supplier ON l_suppkey = s_suppkey
         |      JOIN part ON l_partkey = p_partkey
         |      WHERE p_size < 10)
         |SELECT p_partkey, p_name, s_name, s_acctbal FROM j
         |WHERE s_acctbal = (SELECT MIN(j2.s_acctbal) FROM j j2
         |                   WHERE j2.p_partkey = j.p_partkey)
         |ORDER BY s_acctbal DESC, p_partkey, s_name""".stripMargin,
    "q08_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         | CAST(SUM(CASE WHEN n1.n_name = 'NATION_9' THEN $disc
         |   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
         | CAST(SUM($disc) AS DOUBLE) AS mkt_share
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN supplier ON l_suppkey = s_suppkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation n1 ON s_nationkey = n1.n_nationkey
         | JOIN nation n2 ON c_nationkey = n2.n_nationkey
         | JOIN region ON n2.n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         | AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_product_profit" ->
      s"""SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS o_year,
         | CAST(SUM($disc - CAST(p_retailprice AS DECIMAL(12,2))
         |   * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
         |FROM lineitem
         | JOIN part ON l_partkey = p_partkey
         | JOIN supplier ON l_suppkey = s_suppkey
         | JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY n_name, o_year ORDER BY n_name, o_year DESC""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, CAST(SUM($disc) AS DOUBLE) AS revenue,
         | c_acctbal, n_name
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         | AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         | AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q11_important_parts" ->
      s"""WITH pv AS (
         |  SELECT l_partkey, SUM($disc) AS v FROM lineitem GROUP BY l_partkey)
         |SELECT l_partkey, CAST(v AS DOUBLE) AS value FROM pv
         |WHERE CAST(v AS DOUBLE) >
         |  (SELECT CAST(SUM(v) AS DOUBLE) * 1.2 / COUNT(*) FROM pv)
         |ORDER BY value DESC, l_partkey""".stripMargin,
    "q12_late_shipments" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, CAST(SUM($disc) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        | COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        | JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
        |  AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND l_quantity < 0.2 * (
        |    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |      / COUNT(*)
        |    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,
    "q19_disjunctive_pred" ->
      s"""SELECT CAST(SUM($disc) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |        AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |        AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_volume_suppliers" ->
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 500)
        |ORDER BY s_name""".stripMargin,
    "q21_waiting_supplier" ->
      """WITH late AS (
        |  SELECT DISTINCT l_orderkey AS lo, l_suppkey AS ls
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY),
        |pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late l1 JOIN supplier ON l1.ls = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM pairs p
        |              WHERE p.l_orderkey = l1.lo AND p.l_suppkey <> l1.ls)
        |  AND NOT EXISTS (SELECT 1 FROM late l2
        |                  WHERE l2.lo = l1.lo AND l2.ls <> l1.ls)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)
}
