package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of join: for each left row, attach the most recent right row with
  * right.time <= left.time for the same key.
  *
  * Spark has no native ASOF JOIN (DuckDB does — used as the oracle). The
  * scale-friendly composition is a single union + one shuffle on the key:
  * tag both sides, sort within each key partition by (time, side) and
  * carry the last non-null right value forward with a running window.
  * No O(n·m) join blow-up, no range-join fallback; wall-clock is one
  * shuffle + one in-partition sort — survives 100× data growth as long as
  * single keys fit a partition (salt-by-time-range would be the next step
  * for pathological single-key skew).
  */
object AsOfJoin {

  /** Generic as-of: returns `left` columns + `valueCol`'s as-of value. */
  def asOf(left: DataFrame, leftKey: Column, leftTime: Column,
           right: DataFrame, rightKey: Column, rightTime: Column,
           valueCol: Column, valueName: String): DataFrame = {
    val rowType = left.select(struct(left.columns.map(col): _*).as("_row")).schema.head.dataType
    val vType = right.select(valueCol.as("_v")).schema.head.dataType
    val l = left.select(leftKey.as("_k"), leftTime.as("_t"), lit(1).as("_side"),
      struct(left.columns.map(col): _*).as("_row"), lit(null).cast(vType).as("_v"))
    val r = right.select(rightKey.as("_k"), rightTime.as("_t"), lit(0).as("_side"),
      lit(null).cast(rowType).as("_row"), valueCol.as("_v"))
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_row.*"), col("_asof").as(valueName))
  }

  /** Nearest-event join: each left row pairs with the temporally CLOSEST
    * right row of the same key in EITHER direction (alignment tasks —
    * sensor fusion, caption↔frame matching — where backward-only as-of
    * biases late). Composition: the backward as-of (last right value at
    * or before t) plus its mirror (first right value at or after t, the
    * same window pass over reversed time), then pick the nearer side,
    * ties to the earlier (backward) match. Cost = exactly two as-of
    * passes: two sorts over one exchange per pass, no join blowup. */
  def nearest(left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column): DataFrame = {
    val l = left.select(leftKey.as("_k"), leftTime.as("_t"), lit(1).as("_side"),
      struct(left.columns.map(col): _*).as("_row"),
      lit(null).cast("long").as("_rt"))
    val r = right.select(rightKey.as("_k"), rightTime.as("_t"), lit(0).as("_side"),
      lit(null).cast(l.schema("_row").dataType).as("_row"),
      unix_micros(rightTime.cast("timestamp")).as("_rt"))
    val back = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // desc traversal must see right rows (side 0) BEFORE a left row at the
    // SAME timestamp, so the at-or-after match is inclusive like ASOF <=
    val fwd = Window.partitionBy(col("_k"))
      .orderBy(col("_t").desc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_before", last(col("_rt"), ignoreNulls = true).over(back))
      .withColumn("_after", last(col("_rt"), ignoreNulls = true).over(fwd))
      .filter(col("_side") === 1)
      .withColumn("_ts", unix_micros(col("_t").cast("timestamp")))
      .withColumn("_nearest",
        when(col("_before").isNull, col("_after"))
          .when(col("_after").isNull, col("_before"))
          .when(col("_ts") - col("_before") <= col("_after") - col("_ts"),
            col("_before"))
          .otherwise(col("_after")))
      .select(col("_row.*"), col("_nearest"))
  }

  /** Skew-resistant as-of: the same semantics with the single-key
    * bottleneck removed. A pathological key (one user with 10^9 events)
    * breaks the plain composition because one window partition must hold
    * the whole key. Salting by fixed time buckets splits that partition:
    *
    *  1. in-bucket pass — the running-last window over (key, BUCKET)
    *     partitions, which are bounded by bucket width, not key volume;
    *  2. bucket summaries — one row per (key, bucket) holding the last
    *     right value in the bucket (a groupBy, map-side combinable);
    *  3. carry pass — a window over the per-key SUMMARY rows (count =
    *     #buckets, small by construction) computes what was last seen
    *     BEFORE each bucket; joined back on (key, bucket).
    *
    * Every stage is a bounded-partition shuffle; no partition ever holds
    * more than one bucket of one key. Result equality with [[asOf]] is
    * spec-checked. */
  def asOfSalted(left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      valueCol: Column, valueName: String, bucketUs: Long): DataFrame = {
    val rowType = left.select(struct(left.columns.map(col): _*).as("_row")).schema.head.dataType
    val vType = right.select(valueCol.as("_v")).schema.head.dataType
    val l = left.select(leftKey.as("_k"), leftTime.as("_t"), lit(1).as("_side"),
      struct(left.columns.map(col): _*).as("_row"), lit(null).cast(vType).as("_v"))
    val r = right.select(rightKey.as("_k"), rightTime.as("_t"), lit(0).as("_side"),
      lit(null).cast(rowType).as("_row"), valueCol.as("_v"))
    val u = l.unionByName(r)
      .withColumn("_b", (unix_micros(col("_t").cast("timestamp")) / bucketUs).cast("long"))

    // 1. running last within (key, bucket) — bounded partitions
    val wIn = Window.partitionBy(col("_k"), col("_b")).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = u.withColumn("_inb", last(col("_v"), ignoreNulls = true).over(wIn))

    // 2. one summary row per (key, bucket): last right value in the bucket
    val summaries = u.filter(col("_side") === 0)
      .groupBy(col("_k"), col("_b"))
      .agg(max_by(col("_v"), struct(col("_t"), col("_side"))).as("_bv"))
    // buckets that only have left rows still need a carry row
    val allBuckets = u.select(col("_k"), col("_b")).distinct()
      .join(summaries, Seq("_k", "_b"), "left_outer")

    // 3. carry across buckets per key — partition size = #buckets, tiny
    val wCarry = Window.partitionBy(col("_k")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = allBuckets
      .withColumn("_prev", last(col("_bv"), ignoreNulls = true).over(wCarry))
      .select(col("_k"), col("_b"), col("_prev"))

    inBucket.join(carry, Seq("_k", "_b"))
      .filter(col("_side") === 1)
      .select(col("_row.*"), coalesce(col("_inb"), col("_prev")).as(valueName))
  }

  /** queries-entry shape: latest order date at-or-before each event, per user. */
  def eventsAsOfOrders(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events").select("event_id", "user_id", "ts")
    val orders = Tables(spark, dir, "orders")
    asOf(events, col("user_id"), col("ts"),
      orders, col("o_custkey"), col("o_orderdate"),
      col("o_orderdate"), "last_order_date")
      .select("event_id", "user_id", "last_order_date")
      .orderBy("event_id")
  }

  /** queries-entry shape: nearest order (either direction) per event. */
  def eventsNearestOrders(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events").select("event_id", "user_id", "ts")
    val orders = Tables(spark, dir, "orders")
    nearest(events, col("user_id"), col("ts"),
      orders, col("o_custkey"), col("o_orderdate"))
      .select(col("event_id"), col("user_id"), col("_nearest").as("nearest_us"))
      .orderBy("event_id")
  }

  /** the same as-of through the NATIVE custom operator
    * (plans/AsOfJoinNative.scala): logical node + strategy + two-pointer
    * merge exec, instead of the union+window composition */
  def eventsAsOfOrdersNative(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events").select("event_id", "user_id", "ts")
    val orders = Tables(spark, dir, "orders")
    graft.plans.AsOfJoinNative.asOf(
      events, col("user_id"), unix_micros(col("ts")),
      orders, col("o_custkey"), unix_micros(col("o_orderdate").cast("timestamp")),
      col("o_orderdate"), "last_order_date")
      .select("event_id", "user_id", "last_order_date")
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_asof_join" -> eventsAsOfOrders,
      "q_asof_native" -> eventsAsOfOrdersNative,
      "q_nearest_join" -> eventsNearestOrders)

  val oracles: Map[String, String] = Map(
    "q_nearest_join" ->
      """WITH b AS (
        |  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |         epoch_us(o.o_orderdate) AS before_us
        |  FROM events e ASOF LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |), f AS (
        |  SELECT e.event_id, epoch_us(o.o_orderdate) AS after_us
        |  FROM events e ASOF LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
        |)
        |SELECT b.event_id, b.user_id,
        |  CASE WHEN before_us IS NULL THEN after_us
        |       WHEN after_us IS NULL THEN before_us
        |       WHEN ts_us - before_us <= after_us - ts_us THEN before_us
        |       ELSE after_us END AS nearest_us
        |FROM b JOIN f USING (event_id) ORDER BY b.event_id""".stripMargin,
    "q_asof_join" ->
      """SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date
        |FROM events e ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "q_asof_native" ->
      """SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date
        |FROM events e ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin)
}
