package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Corpus-construction operators: deterministic stratified sampling and
  * sequence packing — the two steps between "filtered documents" and
  * "training batches" in an LLM data pipeline.
  *
  * Both are pure functions of the data (no RNG state): sampling hashes the
  * document key, packing is a prefix sum over a deterministic order. That
  * is the property that matters at 100 TB — re-running the pipeline on a
  * changed corpus re-samples only what changed, and any subset of shards
  * can be built independently.
  */
object Sampling {
  type Q = (SparkSession, String) => DataFrame

  /** tokens per training chunk for [[packChunks]] */
  val ChunkTokens = 512

  // --- deterministic stratified sampling ------------------------------------
  /** Hash-gated per-language sampling: keep a document iff the first 32
    * bits of md5("smp:" || doc_id) fall below rate(lang) * 2^32. The gate
    * is a pure per-row predicate — no shuffle, no RNG, stable under
    * re-partitioning — and each kept row carries weight 1/rate so
    * downstream aggregates stay unbiased. md5 is bit-identical across
    * engines, which is what lets the DuckDB oracle replay the exact
    * sample membership. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val u = conv(substring(
      md5(concat(lit("smp:"), col("doc_id").cast("string")).cast("binary")),
      1, 8), 16, 10).cast(LongType).cast("double")
    val rate = when(col("lang") === "en", lit(0.1)).otherwise(lit(0.5))
    Tables(spark, dir, "documents")
      .withColumn("rate", rate)
      .filter(u < col("rate") * lit(4294967296.0))
      .select(col("doc_id"), col("lang"),
        (lit(1.0) / col("rate")).as("weight"))
      .orderBy("doc_id")
  }

  // --- sequence packing (concat-and-chunk) ----------------------------------
  /** Assigns every document its position in the packed token stream:
    * documents are concatenated per source shard in doc_id order and cut
    * into fixed `ChunkTokens` chunks; a document knows its first chunk and
    * how many chunks it spans. The prefix sum partitions by source shard,
    * so no global ordering bottleneck exists — each shard packs
    * independently, exactly how a 1000-executor job would lay out
    * training shards. */
  def packChunks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("chunk_id",
        floor((col("cum") - col("n_tok")).cast("double") / ChunkTokens.toDouble)
          .cast(LongType))
      .withColumn("n_chunks",
        (floor((col("cum") - 1).cast("double") / ChunkTokens.toDouble)
          .cast(LongType) - col("chunk_id") + 1L))
      .select("doc_id", "source", "n_tok", "chunk_id", "n_chunks")
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_sample_stratified" -> sampleStratified,
    "q_pack_chunks" -> packChunks)

  /** DuckDB lacks a hex-to-int cast, so the oracle folds the 8 hex digits
    * positionally; every term is an exact small-integer double. */
  private val sqlU =
    """list_sum(list_transform(range(1, 9),
      |  i -> CAST(strpos('0123456789abcdef',
      |         substr(md5('smp:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1))
      |       - 1 AS DOUBLE) * power(16, 8 - i)))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_sample_stratified" ->
      s"""SELECT doc_id, lang,
         | 1.0 / (CASE WHEN lang = 'en' THEN 0.1 ELSE 0.5 END) AS weight
         |FROM documents
         |WHERE $sqlU <
         |  (CASE WHEN lang = 'en' THEN 0.1 ELSE 0.5 END) * 4294967296.0
         |ORDER BY doc_id""".stripMargin,
    "q_pack_chunks" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, source, n_tok,
         |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM t
         |)
         |SELECT doc_id, source, n_tok,
         |  CAST(floor(CAST(cum - n_tok AS DOUBLE) / $ChunkTokens.0) AS BIGINT)
         |    AS chunk_id,
         |  CAST(floor(CAST(cum - 1 AS DOUBLE) / $ChunkTokens.0) AS BIGINT)
         |    - CAST(floor(CAST(cum - n_tok AS DOUBLE) / $ChunkTokens.0) AS BIGINT)
         |    + 1 AS n_chunks
         |FROM c ORDER BY doc_id""".stripMargin)
}
