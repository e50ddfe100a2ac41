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

  val queries: Map[String, Q] = Map(
    "q_gap_fill" -> gapFill,
    "q_moving_window" -> movingWindow,
    "q_anomaly" -> anomaly)

  val oracles: Map[String, String] = Map(
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
