package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Deduplication family for LLM training-data pipelines (SURVEY.md §2.3).
  *
  * Scale design: every variant reduces the O(n²) pair space to equi-joins on
  * short keys (full text hash / shared shingle / LSH band signature / simhash
  * block), i.e. plain shuffles that AQE can handle, then verifies only the
  * candidate pairs. Brute-force cross joins never appear.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  /** distinct word 3-gram shingles per doc */
  private def shingles(docs: DataFrame): DataFrame =
    docs.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
        .as("s"))
      .distinct()

  /** n-gram Jaccard pairs ≥ tau: explode shingles → self-equi-join on the
    * shingle → count-distinct overlap. The join key is the shingle itself, so
    * only docs sharing content ever meet — no cross join. */
  def jaccardPairs(docs: DataFrame, tau: Double): DataFrame = {
    val sh = shingles(docs).cache()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.withColumnRenamed("doc_id", "a_id").withColumnRenamed("c", "ca"), "a_id")
      .join(cnt.withColumnRenamed("doc_id", "b_id").withColumnRenamed("c", "cb"), "b_id")
      .filter(col("inter").cast("double") / (col("ca") + col("cb") - col("inter")) >= tau)
      .select("a_id", "b_id")
  }

  // --- exact dedup: keep the lowest doc_id per identical text ---------------
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
      .orderBy("doc_id")

  def jaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(Tables(spark, dir, "documents"), 0.6).orderBy("a_id", "b_id")

  // --- MinHash + LSH banding -------------------------------------------------
  // K hashes, BANDS bands of R rows. Candidates collide on a band signature;
  // candidates are then verified with true Jaccard, so the output equals the
  // exact Jaccard(tau) pair set with miss probability (1 - tau^R)^BANDS per
  // pair (~4e-8 at tau = 0.9) — tight enough to share the SQL oracle.
  val K = 64; val BANDS = 16; val R = 4

  def minhashCandidates(docs: DataFrame): DataFrame = {
    val sh = shingles(docs)
    val mh = sh
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${K - 1}), j -> xxhash64(s, j))")).as(Seq("j", "h")))
      .groupBy(col("doc_id"), col("j")).agg(min(col("h")).as("mh"))
    val sigs = mh
      .withColumn("band", floor(col("j") / R))
      .groupBy(col("doc_id"), col("band"))
      .agg(xxhash64(concat_ws(",", expr(
        "transform(sort_array(collect_list(struct(j, mh))), x -> cast(x.mh as string))")))
        .as("sig"))
    sigs.as("a").join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  def minhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val cand = minhashCandidates(docs)
    // verify candidates with true jaccard at tau=0.5 (planted dups are >=0.9)
    jaccardPairs(docs, 0.5).as("j")
      .join(cand.as("c"), Seq("a_id", "b_id"), "left_semi")
      .orderBy("a_id", "b_id")
  }

  // --- SimHash ---------------------------------------------------------------
  // 64-bit token-hash sign aggregation; near-dup candidates share one of four
  // 16-bit blocks; verified by Hamming distance <= 6. No SQL oracle (hash
  // algebra isn't expressible in DuckDB) — rows-only check + planted-dup spec.
  def simhashSignatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 63), b -> CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END)"))
        .as(Seq("b", "v")))
      .groupBy(col("doc_id"), col("b")).agg(sum(col("v")).as("s"))
      .groupBy(col("doc_id"))
      .agg(expr("bit_or(CASE WHEN s > 0 THEN shiftleft(1L, CAST(b AS INT)) ELSE 0L END)").as("simhash"))

  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhashSignatures(Tables(spark, dir, "documents"))
    val blocks = sig.select(col("doc_id"), col("simhash"), posexplode(expr(
      "transform(sequence(0, 3), i -> (shiftright(simhash, i * 16) & 65535))"))
      .as(Seq("blk", "blk_val")))
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.blk_val") === col("b.blk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        expr("bit_count(a.simhash ^ b.simhash)").cast(LongType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 6)
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_exact" -> exact,
    "q_dedup_jaccard" -> jaccard,
    "q_dedup_minhash" -> minhash,
    "q_dedup_simhash" -> simhash)

  private val jaccardOracle =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3
      |), sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
      |), cnt AS (
      |  SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id
      |), pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT a_id, b_id FROM pairs
      | JOIN cnt ca ON a_id = ca.doc_id JOIN cnt cb ON b_id = cb.doc_id
      |WHERE CAST(inter AS DOUBLE) / (ca.c + cb.c - inter) >= %TAU%
      |ORDER BY a_id, b_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id",
    "q_dedup_jaccard" -> jaccardOracle.replace("%TAU%", "0.6"),
    "q_dedup_minhash" -> jaccardOracle.replace("%TAU%", "0.5"))
}
