package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality audit (the Deequ/constraint-check shape): a rule set —
  * not-null, uniqueness, value range, accepted values, referential
  * integrity — evaluated over a table into one verdict row per rule.
  *
  * Scale design: every row-local rule folds into ONE conditional-
  * aggregation pass over the table (a single scan, partial-aggregated),
  * uniqueness is the same pass's count-distinct, and the one rule that
  * genuinely needs another table (referential integrity) is a broadcast
  * anti-join against the dimension. The per-rule report rows materialize
  * from a driver-free explode of the aggregate row — running R rules
  * costs one scan plus one anti-join, not R scans.
  */
object DataQuality {
  type Q = (SparkSession, String) => DataFrame

  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val base = o.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v_nn"),
      countDistinct(col("o_orderkey")).as("nd"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("v_range"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("v_vals"))
    val orphan = o.join(broadcast(c),
        o("o_custkey") === c("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v_ref"))
    def rule(name: String, checked: org.apache.spark.sql.Column,
        violations: org.apache.spark.sql.Column) =
      struct(lit(name).as("rule"), checked.as("n_checked"),
        violations.as("n_violations"))
    base.crossJoin(orphan)
      .select(explode(array(
        rule("accepted_values:o_orderstatus", col("n"), col("v_vals")),
        rule("not_null:o_orderkey", col("n"), col("v_nn")),
        rule("range:o_totalprice_positive", col("n"), col("v_range")),
        rule("ref_integrity:o_custkey_in_customer", col("n"), col("v_ref")),
        rule("unique:o_orderkey", col("n"), col("n") - col("nd")))).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_checked").as("n_checked"),
        col("r.n_violations").as("n_violations"),
        (col("r.n_violations") === 0L).as("passed"))
      .orderBy("rule")
  }

  val queries: Map[String, Q] = Map("q_dq_checks" -> dqChecks)

  val oracles: Map[String, String] = Map(
    "q_dq_checks" ->
      """WITH b AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_nn,
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd,
        |    CAST(SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_range,
        |    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0
        |      END) AS BIGINT) AS v_vals
        |  FROM orders
        |), rf AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS v_ref
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_custkey IS NULL
        |), rules AS (
        |  SELECT 'accepted_values:o_orderstatus' AS rule, n AS n_checked,
        |    v_vals AS n_violations FROM b
        |  UNION ALL SELECT 'not_null:o_orderkey', n, v_nn FROM b
        |  UNION ALL SELECT 'range:o_totalprice_positive', n, v_range FROM b
        |  UNION ALL SELECT 'ref_integrity:o_custkey_in_customer', n, v_ref
        |    FROM b, rf
        |  UNION ALL SELECT 'unique:o_orderkey', n, n - nd FROM b
        |)
        |SELECT rule, n_checked, n_violations, n_violations = 0 AS passed
        |FROM rules ORDER BY rule""".stripMargin)
}
