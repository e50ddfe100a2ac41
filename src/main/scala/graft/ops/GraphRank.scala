package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Weighted PageRank over the nation trade graph (customer nation →
  * supplier nation, edge weight = lineitem count), 5 Jacobi iterations
  * with damping 0.85 — the canonical iterative graph computation, kept
  * BIT-EXACT across engines by doing every step in scaled integer
  * arithmetic: ranks are BIGINTs scaled by 10⁶, the damping multiply is
  * `r*85 div 100`, and each edge's share is `(r85 * w) div W(u)` — floor
  * divisions both engines define identically on nonnegative ints, so no
  * float ever appears and the oracle unrolls the same 5 iterations in
  * SQL.
  *
  * Scale shape: the expensive part is the EDGE BUILD (a 6-way star join
  * + one groupBy over the fact table — broadcast dims, one shuffle);
  * it is localCheckpoint'ed so the iterations reuse the materialized
  * edge set instead of re-running the joins (the GraphX/Pregel lineage
  * discipline, as in CorpusGraph). Each iteration is then two small
  * shuffles over the EDGE set only — at 100 TB with millions of nodes
  * the same plan holds, with ranks hash-partitioned on node. Dangling
  * mass is dropped (no dangling nodes here: every nation has customers);
  * teleport is the per-node constant 0.15 · 10⁶. */
object GraphRank {
  type Q = (SparkSession, String) => DataFrame

  val Scale = 1000000L
  val Iters = 5

  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val o = Tables(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val c = Tables(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val s = Tables(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val n = Tables(spark, dir, "nation").select("n_nationkey", "n_name")
    val rawEdges = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n.select(col("n_nationkey").as("cnk"), col("n_name").as("src"))),
        col("c_nationkey") === col("cnk"))
      .join(broadcast(n.select(col("n_nationkey").as("snk"), col("n_name").as("dst"))),
        col("s_nationkey") === col("snk"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    val outw = rawEdges.groupBy(col("src")).agg(sum(col("w")).as("tw"))
    // materialize once; iterations must not re-run the star join
    val edges = rawEdges.join(outw, "src").localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().localCheckpoint()
    var ranks = nodes.withColumn("r", lit(Scale))
    for (_ <- 1 to Iters) {
      val contrib = edges.join(ranks, edges("src") === ranks("node"))
        .select(col("dst"),
          expr("((r * 85) div 100) * w div tw").as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("cin"))
      ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(Scale * 15 / 100) + coalesce(col("cin"), lit(0L))).as("r"))
    }
    ranks.select(col("node").as("n_name"), col("r").as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("n_name"))
  }

  val queries: Map[String, Q] = Map("q_pagerank" -> pagerank)

  private def sqlIter(k: Int): String =
    s"""r$k AS (
       |  SELECT n.node, CAST(150000 + COALESCE(c.s, 0) AS BIGINT) AS r
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst, SUM(((p.r * 85) // 100) * e.w // e.tw) AS s
       |    FROM edges e JOIN r${k - 1} p ON e.src = p.node GROUP BY e.dst
       |  ) c ON c.dst = n.node)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_pagerank" -> (
      """WITH raw AS (
        |  SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  GROUP BY 1, 2),
        |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS tw FROM raw GROUP BY src),
        |edges AS (SELECT raw.src, raw.dst, raw.w, outw.tw FROM raw JOIN outw USING (src)),
        |nodes AS (SELECT DISTINCT node FROM (
        |  SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |""".stripMargin
        + (1 to Iters).map(sqlIter).mkString(",\n") +
        s"""
           |SELECT node AS n_name, r AS rank_scaled FROM r$Iters
           |ORDER BY rank_scaled DESC, n_name""".stripMargin))
}
