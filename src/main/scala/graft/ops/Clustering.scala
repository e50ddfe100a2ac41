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

  /** final (vec_id, k, d, m) assignment after one Lloyd iteration —
    * shared by the stats query and cluster-balanced curation */
  def assignments(spark: SparkSession, dir: String): DataFrame = {
    // columnar cache for the seed/assign/update/re-assign passes; the
    // assignment RESULT is pinned eagerly below so the cache releases
    // before returning instead of staying session-pinned
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
    val out = assign(emb, c1).localCheckpoint() // O(vectors) rows, eager
    emb.unpersist(blocking = false)
    out
  }

  def kmeansQuery(spark: SparkSession, dir: String): DataFrame =
    assignments(spark, dir).groupBy(col("k").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("vec_id")).as("min_vec"),
        max(col("vec_id")).as("max_vec"),
        sum(col("d")).as("inertia"))
      .orderBy("cluster")

  /** Cluster-balanced curation: the per-cluster top documents by length —
    * the selection pattern behind diversity-preserving subset extraction
    * (sample evenly across semantic clusters instead of letting one domain
    * dominate). Top-k per cluster rides WindowGroupLimit, so each cluster's
    * candidates are pruned to k rows BEFORE the shuffle. */
  val TopPerCluster = 3

  def clusterSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val picked = assignments(spark, dir)
      .select(col("vec_id").as("doc_id"), col("k").as("cluster"))
      .join(docs, "doc_id")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cluster"))
          .orderBy(col("n_chars").desc, col("doc_id"))).cast("bigint"))
      .filter(col("rk") <= TopPerCluster)
    picked.select(col("cluster"), col("rk"), col("doc_id"), col("n_chars"))
      .orderBy("cluster", "rk")
  }

  /** Cluster labeling: the per-cluster top TF-IDF terms — "what is each
    * semantic cluster about", the step that turns anonymous kmeans ids
    * into an inspectable domain map before mixture decisions. TF is the
    * term count inside the cluster; IDF uses CLUSTERS as the document
    * unit (ln(K/df) with df = #clusters containing the term), so a word
    * every cluster shares scores 0 and cluster-specific vocabulary
    * rises. Exact arithmetic: idf is scaled-integer (one rounding
    * point), the score is tf x idf_scaled in bigints; ties break on the
    * term string. Plan: token-grain rows join the broadcast doc→cluster
    * map, one (k, w)-keyed partial-agg shuffle, then a K-partition
    * window — the heavy cardinality (tokens) never shuffles twice. */
  val TopTerms = 3

  def clusterTopics(spark: SparkSession, dir: String): DataFrame = {
    val asg = assignments(spark, dir)
      .select(col("vec_id").as("doc_id"), col("k"))
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
    val tf = toks.join(broadcast(asg), "doc_id")
      .groupBy(col("k"), col("w")).agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("w")).agg(count(lit(1)).as("dfc"))
    val idf = floor(log(lit(K.toDouble) / col("dfc").cast("double"))
      * lit(100000000.0) + lit(0.5)).cast("long")
    tf.join(broadcast(dfc), "w")
      .select(col("k").as("cluster"), col("w").as("term"),
        (col("tf") * idf).as("score_scaled"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cluster"))
          .orderBy(col("score_scaled").desc, col("term"))).cast("bigint"))
      .filter(col("rk") <= TopTerms)
      .select(col("cluster"), col("rk"), col("term"), col("score_scaled"))
      .orderBy("cluster", "rk")
  }

  val queries: Map[String, Q] = Map(
    "q_cluster_kmeans" -> kmeansQuery,
    "q_cluster_sample" -> clusterSample,
    "q_cluster_topics" -> clusterTopics)

  private val sqlMicro =
    s"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $Scale) " +
      s"AS BIGINT) + $Offset)"

  private def sqlDist(m: String, c: String): String =
    s"list_sum(list_transform(range(1, ${Dim + 1}), " +
      s"i -> ($m[i] - $c[i]) * ($m[i] - $c[i])))"

  /** shared CTE chain ending at the post-Lloyd assignment a2(vec_id, k, d) */
  private val sqlA2 =
    s"""e AS (
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
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_cluster_kmeans" ->
      s"""WITH $sqlA2
         |SELECT k AS cluster, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec,
         |  MAX(vec_id) AS max_vec, CAST(SUM(d) AS BIGINT) AS inertia
         |FROM a2 GROUP BY k ORDER BY cluster""".stripMargin,
    "q_cluster_sample" ->
      s"""WITH $sqlA2, ranked AS (
         |  SELECT a2.k AS cluster, d.doc_id, d.n_chars,
         |    row_number() OVER (PARTITION BY a2.k
         |      ORDER BY d.n_chars DESC, d.doc_id) AS rk
         |  FROM a2 JOIN documents d ON d.doc_id = a2.vec_id
         |)
         |SELECT cluster, rk, doc_id, n_chars FROM ranked
         |WHERE rk <= $TopPerCluster ORDER BY cluster, rk""".stripMargin,
    "q_cluster_topics" ->
      s"""WITH $sqlA2, toks AS (
         |  SELECT d.doc_id, u.w
         |  FROM documents d, UNNEST(string_split(lower(d.text), ' ')) u(w)
         |  WHERE u.w <> ''
         |), tf AS (
         |  SELECT a2.k, t.w, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM toks t JOIN a2 ON t.doc_id = a2.vec_id
         |  GROUP BY a2.k, t.w
         |), dfc AS (
         |  SELECT w, CAST(COUNT(*) AS BIGINT) AS dfc FROM tf GROUP BY w
         |), scored AS (
         |  SELECT tf.k AS cluster, tf.w AS term,
         |    tf.tf * CAST(floor(ln($K.0 / CAST(dfc.dfc AS DOUBLE))
         |      * 100000000.0 + 0.5) AS BIGINT) AS score_scaled
         |  FROM tf JOIN dfc ON tf.w = dfc.w
         |), ranked AS (
         |  SELECT cluster, term, score_scaled,
         |    CAST(row_number() OVER (PARTITION BY cluster
         |      ORDER BY score_scaled DESC, term) AS BIGINT) AS rk
         |  FROM scored)
         |SELECT cluster, rk, term, score_scaled FROM ranked
         |WHERE rk <= $TopTerms ORDER BY cluster, rk""".stripMargin)
}
