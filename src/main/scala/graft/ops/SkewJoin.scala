package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Skew-resistant equi-join (the generalization of AsOfJoin.asOfSalted):
  * when one join key dominates (a hot language, a celebrity user, a null
  * bucket), the shuffle partition holding it becomes the whole job's
  * straggler. Salting splits every hot partition `salts` ways: the probe
  * side scatters by hash-salt, the build side replicates each row across
  * all salts, and the join key becomes (key, salt). The result is
  * identical to the plain join; the largest partition shrinks by ~salts.
  *
  * AQE's skew-join split handles the SORT-merge case adaptively at
  * runtime; explicit salting remains the tool when the skew is known
  * ahead of time, when the join is hash-based, or when a deterministic
  * layout is required — and it composes with bucketed storage.
  */
object SkewJoin {
  type Q = (SparkSession, String) => DataFrame

  /** `big` ⋈ `dim` on `key`, with `dim` replicated over `salts` buckets
    * and `big` scattered by `saltOn`'s hash. Use for non-broadcastable
    * dims with skewed key frequencies. */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String, salts: Int,
      saltOn: Column): DataFrame = {
    val replicated = dim
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    big.withColumn("_salt", pmod(xxhash64(saltOn), lit(salts)).cast("int"))
      .join(replicated, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** every document joined to its language's corpus aggregate — lang is
    * skewed (en holds ~44% of the corpus), exactly the shape where the
    * hot key's partition dominates a plain shuffle join. The merge hint
    * keeps the demo on the shuffle path (a broadcastable dim wouldn't
    * need salting); the spec pins result-equality with the plain join. */
  def joinSalted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val langStats = Tables(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("lang_docs"),
        sum(col("n_chars")).cast(LongType).as("lang_chars"))
      .hint("merge")
    saltedJoin(docs, langStats, "lang", 8, col("doc_id"))
      .select(col("doc_id"), col("lang"), col("lang_docs"),
        (col("n_chars").cast("double") / col("lang_chars").cast("double"))
          .as("char_share"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map("q_join_salted" -> joinSalted)

  val oracles: Map[String, String] = Map(
    "q_join_salted" ->
      """WITH ls AS (
        |  SELECT lang, COUNT(*) AS lang_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS lang_chars
        |  FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang, lang_docs,
        |  CAST(n_chars AS DOUBLE) / CAST(lang_chars AS DOUBLE) AS char_share
        |FROM documents d JOIN ls ON d.lang = ls.lang
        |ORDER BY doc_id""".stripMargin)
}
