package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Range join: pair left rows with right rows whose time falls inside a
  * per-left-row interval, on a shared key.
  *
  * Spark plans a raw `t1.ts BETWEEN t2.lo AND t2.hi` join as a broadcast
  * nested loop — O(n·m), dead at scale. The composed form buckets time
  * into fixed-width bins, explodes each interval into the bins it covers,
  * and equi-joins on (key, bin) before applying the exact predicate:
  * candidates are only the pairs sharing a bin, the join is a plain hash
  * shuffle on short keys, and cost is linear in rows × interval/bin
  * width. Bin width should be chosen near the typical interval length
  * (here: 1 day bins for 7-day intervals → ≤8 bins per interval). */
object RangeJoin {

  /** generic composed range join on `key` with right.time in
    * [left.start, left.start + lenUs) */
  def joinByTimeRange(left: DataFrame, leftKey: Column, leftStartUs: Column,
      lenUs: Long, right: DataFrame, rightKey: Column, rightTimeUs: Column,
      binUs: Long): DataFrame = {
    def binOf(c: Column): Column = (c / lit(binUs)).cast("long") // positive epochs
    val l = left.withColumn("_lk", leftKey).withColumn("_ls", leftStartUs)
      .withColumn("_bin", explode(sequence(
        binOf(col("_ls")), binOf(col("_ls") + lit(lenUs - 1)))))
    val r = right.withColumn("_rk", rightKey).withColumn("_rt", rightTimeUs)
      .withColumn("_bin", binOf(col("_rt")))
    l.join(r, l("_lk") === r("_rk") && l("_bin") === r("_bin") &&
        r("_rt") >= l("_ls") && r("_rt") < l("_ls") + lenUs)
      .drop("_lk", "_ls", "_rk", "_rt", "_bin")
  }

  /** driver query: for each event, the OTHER events of the same user in
    * the following 30 minutes (follow-on activity), aggregated per source
    * event type. A self range join with real volume — the orders×events
    * variant was vacuously empty because the two tables' time domains
    * never overlap (orders 1995-2001, events 2024), which verified
    * nothing. */
  def eventsFollowRange(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val left = e.select(col("event_id").as("a_id"), col("user_id").as("a_user"),
      col("event_type").as("a_type"), unix_micros(col("ts")).as("a_us"))
    val right = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"),
      col("value"), unix_micros(col("ts")).as("b_us"))
    val halfHour = 1800000000L
    joinByTimeRange(left, col("a_user"), col("a_us"), halfHour,
        right, col("b_user"), col("b_us"), halfHour)
      .filter(col("a_id") =!= col("b_id"))
      .groupBy(col("a_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .orderBy("a_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_range_join" -> eventsFollowRange)

  val oracles: Map[String, String] = Map(
    "q_range_join" ->
      """SELECT a.event_type AS a_type, COUNT(*) AS n_pairs,
        | CAST(SUM(CAST(b.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events a JOIN events b
        |  ON b.user_id = a.user_id AND a.event_id <> b.event_id
        | AND epoch_us(b.ts) >= epoch_us(a.ts)
        | AND epoch_us(b.ts) < epoch_us(a.ts) + 1800000000
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
