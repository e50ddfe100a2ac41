package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Product-analytics operators over the event stream: ordered funnels and
  * cohort retention — the two aggregate shapes every event warehouse runs
  * daily, and a different stress on the engine than TPC-H joins (per-entity
  * sequential logic + distinct-user counting).
  *
  * Scale design: both queries shuffle BY USER once per phase and keep only
  * per-user scalars (first-step timestamps, cohort week) between phases —
  * never per-user event lists. Funnel steps chain through re-aggregation of
  * the same user-partitioned events (AQE reuses the exchange), so the cost
  * is k small aggregations, not a per-user sort or a stateful scan. At
  * 100 TB the events table is the big side; everything derived per user is
  * O(distinct users) and joins back hash-partitioned on user_id.
  */
object Behavioral {
  type Q = (SparkSession, String) => DataFrame

  /** ordered funnel signup → view → click → purchase: a step counts only
    * if it happens strictly AFTER the user's previous step */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts")).cache()
    def firstAfter(typ: String, prev: DataFrame, prevCol: String, outCol: String) =
      ev.join(prev, "user_id")
        .filter(col("event_type") === typ && col("ts") > col(prevCol))
        .groupBy(col("user_id")).agg(min(col("ts")).as(outCol))
    val t1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = firstAfter("view", t1, "t1", "t2")
    val t3 = firstAfter("click", t2, "t2", "t3")
    val t4 = firstAfter("purchase", t3, "t3", "t4")
    t1.agg(count(lit(1)).as("n_signup")).crossJoin(
      t2.agg(count(lit(1)).as("n_view")).crossJoin(
        t3.agg(count(lit(1)).as("n_click")).crossJoin(
          t4.agg(count(lit(1)).as("n_purchase")))))
  }

  /** weekly cohort retention: cohort = ISO week of a user's first event;
    * a user counts in offset w if active in cohort_week + w weeks */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    ev.join(cohort, "user_id")
      .select(col("user_id"), col("cohort_wk"),
        (datediff(col("wk"), col("cohort_wk")) / 7).cast("bigint").as("offset"))
      .distinct()
      .groupBy(col("cohort_wk"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_wk", "offset")
  }

  val queries: Map[String, Q] = Map(
    "q_funnel" -> funnel,
    "q_cohort_retention" -> cohortRetention)

  val oracles: Map[String, String] = Map(
    "q_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), t2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN t1 USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts > t1.t1 GROUP BY e.user_id
        |), t3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN t2 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > t2.t2 GROUP BY e.user_id
        |), t4 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t4 FROM events e JOIN t3 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > t3.t3 GROUP BY e.user_id
        |)
        |SELECT (SELECT COUNT(*) FROM t1) AS n_signup,
        |       (SELECT COUNT(*) FROM t2) AS n_view,
        |       (SELECT COUNT(*) FROM t3) AS n_click,
        |       (SELECT COUNT(*) FROM t4) AS n_purchase""".stripMargin,
    "q_cohort_retention" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
        |), cohort AS (
        |  SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY user_id
        |), act AS (
        |  SELECT DISTINCT ev.user_id, cohort_wk,
        |    CAST((ev.wk - cohort_wk) // 7 AS BIGINT) AS "offset"
        |  FROM ev JOIN cohort USING (user_id)
        |)
        |SELECT cohort_wk, "offset", COUNT(*) AS n_users
        |FROM act GROUP BY cohort_wk, "offset"
        |ORDER BY cohort_wk, "offset"""".stripMargin)
}
