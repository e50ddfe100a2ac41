package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** The capstone composition: the full training-data preparation pipeline
  * as ONE dataflow — exact dedup → language-ID + quality gates →
  * bag-of-words family dedup → per-shard sequence packing → hash-gated
  * split assignment. Every stage is an operator that also ships (and is
  * oracled) standalone; this query pins that they COMPOSE: filters
  * feeding dedups feeding windows, with the gate checking the end-to-end
  * answer, not each stage in isolation — exactly the job a user of the
  * reference's pipeline would run nightly.
  *
  * Scale shape, stage by stage: exact-dedup and family-dedup are keyed
  * hash aggregations (text / 32-hex md5 key); the gates are per-row
  * codegen'd predicates fused into one scan pass; packing prefix-sums
  * PER SOURCE SHARD (no global ordering bottleneck — each shard packs
  * independently, as a 1000-executor layout job must); the split gate is
  * a pure per-row md5 — no shuffle at all. Nothing in the composition
  * adds a shuffle the standalone stages didn't already have. */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  def e2e(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // 1. exact dedup: the canonical (lowest) doc_id per identical text —
    // keyed by the (md5, length, xxhash64) fingerprint, never the text
    // (the Dedup.exact key-width rule: groupBy(text) shuffles the corpus)
    val canon = docs
      .groupBy(md5(col("text")), length(col("text")), xxhash64(col("text")))
      .agg(min(col("doc_id")).as("doc_id"))
    // 2. language + quality gates on the canonical survivors
    val gated = TextOps.langQualityScored(docs)
      .join(canon.select("doc_id"), Seq("doc_id"), "left_semi")
      .filter(col("pred_lang") === "en" &&
        col("n_words") >= 15 && col("swr") >= 0.03)
      .select("doc_id", "n_words")
    // 3. near-dup collapse: one representative per bag-of-words family
    val fam = docs.select(col("doc_id"), col("source"),
        Dedup.familyKey.as("fam"))
      .join(gated, Seq("doc_id"))
    val kept = fam
      .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(col("fam"))))
      .filter(col("doc_id") === col("keep_id"))
    // 4. sequence packing: per-source-shard prefix sum → first chunk id
    val packWin = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = kept.withColumn("cum", sum(col("n_words")).over(packWin))
      .withColumn("chunk_id", floor((col("cum") - col("n_words"))
        .cast("double") / lit(Sampling.ChunkTokens.toDouble)).cast(LongType))
    // 5. deterministic split: md5-fold gate, stable under repartitioning
    val b = pmod(conv(substring(
      md5(concat(lit("spl:"), col("doc_id").cast("string")).cast("binary")),
      1, 8), 16, 10).cast(LongType), lit(100L))
    packed
      .withColumn("split",
        when(b < 80, "train").when(b < 90, "val").otherwise("test"))
      .select(col("doc_id"), col("source"), col("n_words").as("n_tok"),
        col("chunk_id"), col("split"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map("q_pipeline_e2e" -> e2e)

  val oracles: Map[String, String] = Map(
    "q_pipeline_e2e" ->
      s"""WITH canon AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |    CAST(${TextOps.sqlCountIn(Seq("the", "a", "and", "of", "to", "in", "is"))} AS DOUBLE)
         |      / len(string_split(text, ' ')) AS swr,
         |    substr(greatest(
         |      ${TextOps.sqlLangTag("de", Seq("der", "die", "und", "nicht"))},
         |      ${TextOps.sqlLangTag("en", Seq("the", "a", "and", "is"))},
         |      ${TextOps.sqlLangTag("es", Seq("el", "los", "y", "que"))},
         |      ${TextOps.sqlLangTag("fr", Seq("le", "la", "et", "les"))},
         |      ${TextOps.sqlLangTag("zh", Seq("的", "是"))}), 11, 2) AS pred_lang
         |  FROM documents),
         |gated AS (
         |  SELECT s.doc_id, s.n_words
         |  FROM scored s JOIN canon c ON s.doc_id = c.doc_id
         |  WHERE s.pred_lang = 'en' AND s.n_words >= 15 AND s.swr >= 0.03),
         |fam AS (
         |  SELECT d.doc_id, d.source, g.n_words,
         |    ${Dedup.familySql.replace("(text", "(d.text")} AS fam
         |  FROM documents d JOIN gated g ON d.doc_id = g.doc_id),
         |kept AS (
         |  SELECT doc_id, source, n_words FROM (
         |    SELECT doc_id, source, n_words,
         |      MIN(doc_id) OVER (PARTITION BY fam) AS keep_id FROM fam)
         |  WHERE doc_id = keep_id),
         |packed AS (
         |  SELECT doc_id, source, n_words,
         |    CAST(SUM(n_words) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM kept)
         |SELECT doc_id, source, n_words AS n_tok,
         |  CAST(floor(CAST(cum - n_words AS DOUBLE)
         |    / ${Sampling.ChunkTokens}.0) AS BIGINT) AS chunk_id,
         |  CASE WHEN m < 80 THEN 'train' WHEN m < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT *, CAST(${Sampling.sqlFold("spl")} AS BIGINT) % 100 AS m
         |      FROM packed)
         |ORDER BY doc_id""".stripMargin)
}
