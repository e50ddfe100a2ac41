package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Grid-bucketed spatial self-join: all point pairs within distance d,
  * without a cartesian product. Each point lands in ONE grid cell of side
  * d; one side of the join expands to its 3×3 cell neighborhood, the
  * other stays in its own cell, so every qualifying pair meets on exactly
  * one equi-join key and the candidate space is cell-local occupancy —
  * the same stop-key discipline as the range join, lifted to 2-D
  * (geohash-style spatial bucketing).
  *
  * Scale: ONE shuffle on (cell_x, cell_y); candidate volume is
  * sum(|cell| × |neighborhood|), linear-ish for near-uniform data, and a
  * hot cell salts like any skewed join key. Coordinates here are exact
  * integers (lattice points derived from keys), so the distance predicate
  * is pure BIGINT arithmetic — no floating-point tolerance anywhere.
  */
object SpatialJoin {
  type Q = (SparkSession, String) => DataFrame

  /** pairs of order-points within Euclidean distance 2 in a 120×90 box */
  def spatialJoin(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("id"),
        (col("o_orderkey") % 360 - 180).as("x"),
        (col("o_custkey") % 180 - 90).as("y"))
      .filter(col("x").between(-60, 60) && col("y").between(-45, 45))
    val cells = pts
      .withColumn("cx", expr("(x + 180) div 2"))
      .withColumn("cy", expr("(y + 90) div 2"))
    val probe = cells.select(col("id").as("idb"), col("x").as("xb"),
      col("y").as("yb"), col("cx").as("cxb"), col("cy").as("cyb"))
    val expanded = cells.select(col("id").as("ida"), col("x").as("xa"),
      col("y").as("ya"),
      explode(expr("flatten(transform(sequence(-1, 1), " +
        "i -> transform(sequence(-1, 1), j -> struct(cx + i AS cx, cy + j AS cy))))"))
        .as("c"))
      .select(col("ida"), col("xa"), col("ya"),
        col("c.cx").as("cxa"), col("c.cy").as("cya"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    expanded.join(probe,
        col("cxa") === col("cxb") && col("cya") === col("cyb") &&
          col("ida") < col("idb"))
      .withColumn("dist2", d2)
      .filter(col("dist2") <= 4L)
      .select(col("ida"), col("idb"), col("dist2"))
      .orderBy("ida", "idb")
  }

  val queries: Map[String, Q] = Map("q_spatial_join" -> spatialJoin)

  val oracles: Map[String, String] = Map(
    "q_spatial_join" ->
      """WITH pts AS (
        |  SELECT o_orderkey AS id,
        |    o_orderkey % 360 - 180 AS x, o_custkey % 180 - 90 AS y
        |  FROM orders
        |  WHERE o_orderkey % 360 - 180 BETWEEN -60 AND 60
        |    AND o_custkey % 180 - 90 BETWEEN -45 AND 45),
        |c AS (SELECT *, (x + 180) // 2 AS cx, (y + 90) // 2 AS cy FROM pts),
        |e AS (
        |  SELECT id AS ida, x AS xa, y AS ya, cx + i AS cxa, cy + j AS cya
        |  FROM c, UNNEST(range(-1, 2)) u(i), UNNEST(range(-1, 2)) v(j))
        |SELECT ida, c.id AS idb,
        |  (xa - x) * (xa - x) + (ya - y) * (ya - y) AS dist2
        |FROM e JOIN c ON e.cxa = c.cx AND e.cya = c.cy AND e.ida < c.id
        |WHERE (xa - x) * (xa - x) + (ya - y) * (ya - y) <= 4
        |ORDER BY ida, idb""".stripMargin)
}
