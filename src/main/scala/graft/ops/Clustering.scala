package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed k-means over the embedding corpus — the clustering step a
  * training pipeline runs for domain discovery, mixture balancing, and
  * cluster-based curation (and the batch analogue of the IVF coarse
  * quantizer in `Similarity`): deterministic seeding, one Lloyd iteration,
  * reassignment, per-cluster stats.
  *
  * Reproducibility design: floating-point k-means is not bit-stable across
  * engines (cross-partition sums reorder, ulps differ), so every step here
  * runs in EXACT integer arithmetic. Embedding components are fixed-point
  * "micro-units" (`round(x * 1e6) + 2e6` — the offset keeps values
  * positive so integer division is floor on both engines); centroid means
  * are floor-divided sums; distances are exact integer squared-L2 in
  * micro² units. Uniform offsets cancel in distances, and 1e-6 centroid
  * quantization is far below cluster separation, so assignments equal the
  * float algorithm's — but every engine computes the identical result,
  * which is what lets the DuckDB oracle replay Lloyd's iteration verbatim.
  *
  * Scale shape: assignment is a broadcast of K centroid rows against a
  * linear scan (no shuffle); the centroid update is one posexplode →
  * groupBy(k, dim) partial-aggregated shuffle of K·Dim cells. At 100 TB
  * the per-iteration cost is a scan plus a K·Dim-sized reduce — the same
  * shape Spark MLlib's KMeans uses, minus its RNG.
  */
object Clustering {
  type Q = (SparkSession, String) => DataFrame

  val K = 8
  val Dim = 64
  private val Scale = 1000000L
  private val Offset = 2000000L

  /** embeddings in positive fixed-point micro-units */
  private def micro(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr(
        s"transform(embedding, x -> cast(round(cast(x as double) * $Scale) " +
          s"as bigint) + $Offset)").as("m"))

  /** nearest centroid per vector: broadcast K rows, exact integer squared-L2,
    * ties broken toward the lower cluster id */
  private def assign(emb: DataFrame, cent: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cent))
      .withColumn("d", expr(
        "aggregate(zip_with(m, c, (x, y) -> (x - y) * (x - y)), " +
          "cast(0 as bigint), (a, b) -> a + b)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("d"), col("k"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("k"), col("d"), col("m"))

  def kmeansQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = micro(spark, dir).cache()
    // deterministic seeding: the K lowest vec_ids (TakeOrdered, no full sort)
    val c0 = emb.orderBy("vec_id").limit(K)
      .withColumn("k",
        (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("bigint"))
      .select(col("k"), col("m").as("c"))
    val a1 = assign(emb, c0)
    // Lloyd update: exact integer mean per (cluster, dimension)
    val sums = a1.select(col("k"), posexplode(col("m")).as(Seq("i", "mi")))
      .groupBy(col("k"), col("i")).agg(sum(col("mi")).as("s"))
    val cnts = a1.groupBy(col("k")).agg(count(lit(1)).as("n"))
    val c1 = sums.join(cnts, "k")
      .withColumn("ci", expr("s div n"))
      .groupBy(col("k"))
      .agg(expr("transform(array_sort(collect_list(struct(i, ci))), p -> p.ci)")
        .as("c"))
    val a2 = assign(emb, c1)
    a2.groupBy(col("k").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("vec_id")).as("min_vec"),
        max(col("vec_id")).as("max_vec"),
        sum(col("d")).as("inertia"))
      .orderBy("cluster")
  }

  val queries: Map[String, Q] = Map("q_cluster_kmeans" -> kmeansQuery)

  private val sqlMicro =
    s"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $Scale) " +
      s"AS BIGINT) + $Offset)"

  private def sqlDist(m: String, c: String): String =
    s"list_sum(list_transform(range(1, ${Dim + 1}), " +
      s"i -> ($m[i] - $c[i]) * ($m[i] - $c[i])))"

  val oracles: Map[String, String] = Map(
    "q_cluster_kmeans" ->
      s"""WITH e AS (
         |  SELECT vec_id, $sqlMicro AS m FROM embeddings
         |), c0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, m AS c
         |  FROM e ORDER BY vec_id LIMIT $K
         |), d1 AS (
         |  SELECT e.vec_id, c0.k, e.m, ${sqlDist("e.m", "c0.c")} AS d
         |  FROM e CROSS JOIN c0
         |), a1 AS (
         |  SELECT vec_id, k, m, d FROM (
         |    SELECT vec_id, k, m, d,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS rn
         |    FROM d1) WHERE rn = 1
         |), sums AS (
         |  SELECT k, u.i AS i, SUM(m[i]) AS s
         |  FROM a1, UNNEST(range(1, ${Dim + 1})) u(i) GROUP BY k, u.i
         |), cnt AS (SELECT k, COUNT(*) AS n FROM a1 GROUP BY k
         |), c1 AS (
         |  SELECT k, list(CAST(s // n AS BIGINT) ORDER BY i) AS c
         |  FROM sums JOIN cnt USING (k) GROUP BY k
         |), d2 AS (
         |  SELECT e.vec_id, c1.k, ${sqlDist("e.m", "c1.c")} AS d
         |  FROM e CROSS JOIN c1
         |), a2 AS (
         |  SELECT vec_id, k, d FROM (
         |    SELECT vec_id, k, d,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS rn
         |    FROM d2) WHERE rn = 1
         |)
         |SELECT k AS cluster, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec,
         |  MAX(vec_id) AS max_vec, CAST(SUM(d) AS BIGINT) AS inertia
         |FROM a2 GROUP BY k ORDER BY cluster""".stripMargin)
}
