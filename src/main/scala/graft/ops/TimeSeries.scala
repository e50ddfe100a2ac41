package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Time-series resampling — the gap-fill / forward-fill operator family
  * (DuckDB exposes it as ASOF+range tricks, Flink as temporal tables;
  * Spark has no native resample). Declarative composition: last-per-bucket
  * window → driver-free grid explode via `sequence()` → left join →
  * `last(ignoreNulls)` running window. Every step is a plain shuffle on
  * (user, hour) — no driver loops, no UDFs, codegen throughout.
  *
  * Scale: the grid explode produces span×users rows but they are GENERATED
  * distributed (sequence per user row, exploded in the same task), and the
  * forward-fill window rides the same hash partitioning as the join — one
  * exchange end to end at 100 TB.
  */
object TimeSeries {
  type Q = (SparkSession, String) => DataFrame

  /** hourly resample of each user's event stream with forward fill;
    * readback = per-user totals over the filled grid */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("h", date_trunc("hour", col("ts")))
    // deterministic last observation per (user, hour): latest (ts, event_id)
    val perHour = Window.partitionBy(col("user_id"), col("h"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val lastPerHour = ev.withColumn("rn", row_number().over(perHour))
      .filter(col("rn") === 1).select(col("user_id"), col("h"), col("value"))
    val grid = ev.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
    val ffill = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastPerHour, Seq("user_id", "h"), "left_outer")
      .withColumn("filled", last(col("value"), ignoreNulls = true).over(ffill))
      .withColumn("observed", col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hours"),
        sum(when(col("observed"), 1L).otherwise(0L)).as("n_observed"),
        sum(col("filled").cast(DecimalType(18, 6))).cast("double").as("sum_filled"))
      .orderBy("user_id")
  }

  /** Trailing-interval moving aggregate (burst detection): for every
    * event, the count and exact-decimal sum of the SAME user's events in
    * the trailing 6 hours — a RANGE frame over event-time seconds, the
    * window shape ROWS frames can't express when event spacing is
    * irregular. Readback: each user's peak trailing-window load.
    *
    * Scale: one hash exchange on user_id; the range frame is evaluated
    * with a sliding two-pointer pass over each partition's sort order —
    * no self-join, no explode, O(n) per user after the sort. At 100 TB
    * this is the same plan with more partitions; a skewed user salts by
    * day first (SkewJoin discipline). */
  def movingWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("sec", col("ts").cast("long"))
    val win = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-21600L, 0L)
    ev.withColumn("cnt6", count(lit(1)).over(win))
      .withColumn("sum6", sum(col("value").cast(DecimalType(18, 6))).over(win))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(col("cnt6")).as("peak_cnt_6h"),
        max(col("sum6")).cast("double").as("peak_sum_6h"))
      .orderBy("user_id")
  }

  /** Trailing-window z-score anomaly detection: each event scored against
    * the SAME user's trailing-6h mean/stddev — the streaming-monitoring
    * primitive (spike detection), as one RANGE-frame window pass.
    *
    * Determinism: value and value² round to scaled BIGINTs before the
    * frame sums (exact integer reductions); mean/var/z are then a fixed
    * sequence of IEEE double ops — and unlike ln(), sqrt IS correctly
    * rounded by IEEE-754, so the z-scores match DuckDB bit-for-bit with
    * no tolerance tricks. Plan: one hash exchange on user_id, sliding
    * two-pointer frame evaluation, top-k at the end. */
  def anomaly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("vs", floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("vs2", floor(col("value") * col("value") * lit(1e6) + lit(0.5))
        .cast("long"))
    val win = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-21600L, 0L)
    val cnt = count(lit(1)).over(win)
    val s1 = sum(col("vs")).over(win)
    val s2 = sum(col("vs2")).over(win)
    val withSums = ev
      .withColumn("n6", cnt)
      .withColumn("s1", s1)
      .withColumn("s2", s2)
      .withColumn("mean", col("s1").cast("double") / lit(1e6) / col("n6").cast("double"))
      .withColumn("msq", col("s2").cast("double") / lit(1e6) / col("n6").cast("double"))
      .withColumn("variance", greatest(col("msq") - col("mean") * col("mean"), lit(0.0)))
      .withColumn("std", sqrt(col("variance")))
      .filter(col("n6") >= 10 && col("std") > 0.0)
      .withColumn("z", (col("value") - col("mean")) / col("std"))
    withSums
      .select(col("event_id"), col("user_id"), col("n6"), col("z"))
      .orderBy(col("z").desc, col("event_id"))
      .limit(20)
  }

  /** OHLC bar resampling (daily bars per event type) — the candlestick /
    * market-data aggregation. Open/close are the values at the earliest/
    * latest (ts, event_id) in the bar: two row_numbers (asc/desc) over
    * ONE (type, day) partitioning pick them deterministically even under
    * timestamp ties — min_by/arg_min would tie-break arbitrarily and
    * differently per engine. High/low/volume are plain aggs; turnover
    * sums through DECIMAL. One exchange total: both windows and the
    * final agg share the (type, day) hash partitioning. */
  def ohlc(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("ts"), col("value"))
      .withColumn("day", date_trunc("day", col("ts")))
    val part = Window.partitionBy(col("event_type"), col("day"))
    val asc = part.orderBy(col("ts"), col("event_id"))
    val desc = part.orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy(col("event_type"), col("day"))
      .agg(
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("volume"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("turnover"))
      .orderBy("event_type", "day")
  }

  /** Time-weighted average (the step-function integral / VWAP-of-time):
    * each observation holds until the next one, so TWA = Σ vᵢ·Δtᵢ / Σ Δtᵢ
    * per user. Entirely integer-exact: values quantize to milliunits,
    * Δt is whole seconds from one `lead` window, the products sum
    * through DECIMAL, and the result is an integer DIVISION — no double
    * ever forms, so the output is bit-identical at any corpus size (the
    * usual float dot-product would be summation-order-dependent). One
    * exchange: the lead window and the per-user agg share the user_id
    * partitioning. */
  def timeWeighted(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("sec", unix_micros(col("ts")))
      .withColumn("dt", lead(col("sec"), 1).over(w) - col("sec"))
      .filter(col("dt").isNotNull)
      .withColumn("vm", floor(col("value") * lit(1000.0) + lit(0.5)).cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_holds"),
        sum(col("dt")).as("held_us"),
        sum((col("vm") * col("dt")).cast(DecimalType(38, 0))).as("wsum"))
      .filter(col("held_us") > 0L)
      .select(col("user_id"), col("n_holds"),
        expr("held_us div 1000000").as("held_s"),
        expr("CAST(wsum div held_us AS BIGINT)").as("twa_milli"))
      .orderBy("user_id")
  }

  val queries: Map[String, Q] = Map(
    "q_gap_fill" -> gapFill,
    "q_moving_window" -> movingWindow,
    "q_ohlc" -> ohlc,
    "q_time_weighted" -> timeWeighted,
    "q_anomaly" -> anomaly)

  val oracles: Map[String, String] = Map(
    "q_ohlc" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, ts, value,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        |  FROM events
        |), rn AS (
        |  SELECT event_type, day, value,
        |    row_number() OVER (PARTITION BY event_type, day
        |                       ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, day
        |                       ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM ev
        |)
        |SELECT event_type, day,
        |  MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  MAX(value) AS high,
        |  MIN(value) AS low,
        |  MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  CAST(COUNT(*) AS BIGINT) AS volume,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS turnover
        |FROM rn GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,
    "q_time_weighted" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS sec_us, value FROM events
        |), d AS (
        |  SELECT user_id,
        |    lead(sec_us) OVER (PARTITION BY user_id ORDER BY sec_us, event_id)
        |      - sec_us AS dt,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vm
        |  FROM ev
        |), g AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_holds,
        |    CAST(SUM(dt) AS BIGINT) AS held_us,
        |    SUM(CAST(vm * dt AS HUGEINT)) AS wsum
        |  FROM d WHERE dt IS NOT NULL GROUP BY user_id
        |)
        |SELECT user_id, n_holds,
        |  CAST(held_us // 1000000 AS BIGINT) AS held_s,
        |  CAST(wsum // held_us AS BIGINT) AS twa_milli
        |FROM g WHERE held_us > 0 ORDER BY user_id""".stripMargin,
    "q_anomaly" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS sec, value,
        |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vs,
        |    CAST(floor(value * value * 1000000.0 + 0.5) AS BIGINT) AS vs2
        |  FROM events
        |), w AS (
        |  SELECT event_id, user_id, value,
        |    COUNT(*) OVER win AS n6,
        |    CAST(SUM(vs) OVER win AS BIGINT) AS s1,
        |    CAST(SUM(vs2) OVER win AS BIGINT) AS s2
        |  FROM ev
        |  WINDOW win AS (PARTITION BY user_id ORDER BY sec
        |                 RANGE BETWEEN 21600 PRECEDING AND CURRENT ROW)
        |), sc AS (
        |  SELECT event_id, user_id, n6, value,
        |    CAST(s1 AS DOUBLE) / 1000000.0 / CAST(n6 AS DOUBLE) AS mean,
        |    CAST(s2 AS DOUBLE) / 1000000.0 / CAST(n6 AS DOUBLE) AS msq
        |  FROM w
        |), z AS (
        |  SELECT event_id, user_id, CAST(n6 AS BIGINT) AS n6,
        |    (value - mean) / sqrt(GREATEST(msq - mean * mean, 0.0)) AS z
        |  FROM sc
        |  WHERE n6 >= 10 AND GREATEST(msq - mean * mean, 0.0) > 0.0
        |)
        |SELECT event_id, user_id, n6, z
        |FROM z ORDER BY z DESC, event_id LIMIT 20""".stripMargin,
    "q_moving_window" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS sec, value FROM events
        |), w AS (
        |  SELECT user_id,
        |    COUNT(*) OVER win AS cnt6,
        |    SUM(CAST(value AS DECIMAL(18,6))) OVER win AS sum6
        |  FROM ev
        |  WINDOW win AS (PARTITION BY user_id ORDER BY sec
        |                 RANGE BETWEEN 21600 PRECEDING AND CURRENT ROW)
        |)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(MAX(cnt6) AS BIGINT) AS peak_cnt_6h,
        |  CAST(MAX(sum6) AS DOUBLE) AS peak_sum_6h
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_gap_fill" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, ts, value, date_trunc('hour', ts) AS h
        |  FROM events),
        |lastph AS (
        |  SELECT user_id, h, value FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY user_id, h ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev) WHERE rn = 1),
        |bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, u.h
        |  FROM bounds, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) u(h)),
        |j AS (
        |  SELECT g.user_id, g.h, l.value
        |  FROM grid g LEFT JOIN lastph l ON g.user_id = l.user_id AND g.h = l.h),
        |f AS (
        |  SELECT user_id, h, value IS NOT NULL AS observed,
        |    last_value(value IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |  FROM j)
        |SELECT user_id, COUNT(*) AS n_hours,
        |  CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS n_observed,
        |  CAST(SUM(CAST(filled AS DECIMAL(18,6))) AS DOUBLE) AS sum_filled
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin)
}
