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

  /** driver query: events within 7 days after each order by the same
    * customer, aggregated per order priority */
  def ordersEventsRange(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        // o_orderdate is TIMESTAMP_NTZ in the parquet; UTC session makes
        // the cast an identity on the underlying micros
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"))
    val events = Tables(spark, dir, "events")
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("e_us"))
    val week = 7L * 86400000000L
    val day = 86400000000L
    joinByTimeRange(
      orders, col("o_custkey"), col("o_us"), week,
      events, col("user_id"), col("e_us"), day)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_range_join" -> ordersEventsRange)

  val oracles: Map[String, String] = Map(
    "q_range_join" ->
      """SELECT o.o_orderpriority, COUNT(*) AS n_pairs,
        | CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM orders o JOIN events e
        |  ON e.user_id = o.o_custkey
        | AND epoch_us(e.ts) >= epoch_us(o.o_orderdate)
        | AND epoch_us(e.ts) < epoch_us(o.o_orderdate) + 7 * 86400000000
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin)
}
