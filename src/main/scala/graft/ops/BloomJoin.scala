package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DecimalType}

import graft.Tables

/** Bloom-filter-guarded semi join — the runtime-filter discipline Spark's
  * own InjectRuntimeFilter applies to shuffle joins, exposed as a
  * composable operator: build a bloom filter of the build side's join
  * keys (one small aggregate), then drop probe rows that cannot match
  * BEFORE the probe side's exchange. The trailing exact semi join removes
  * the bloom's false positives, so the result is IDENTICAL to the plain
  * semi join.
  *
  * When it pays: the dim's ROW data is too big to broadcast but its KEY
  * SET fits a bloom (100M keys ≈ tens of MB at 3% fp) — the fact-side
  * shuffle then carries only rows that (probably) join, i.e. the join's
  * selectivity, instead of the full table. With a broadcast-able dim the
  * plain broadcast semi join is already optimal; use that.
  *
  * The bloom materializes driver-side (one `head()` on a 1-row aggregate)
  * exactly like the scalar subquery Spark's runtime filter plants —
  * sketch-sized, never data-sized.
  */
object BloomJoin {
  type Q = (SparkSession, String) => DataFrame

  /** exact semi join of `fact` to `dim` on fact(factKey) = dim(dimKey),
    * with a pre-shuffle bloom guard on the fact side */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedKeys: Long = 4096L): DataFrame = {
    val dimHash = new XxHash64(Seq(Bridge.expression(dim(dimKey))))
    val bytes = dim
      .agg(Bridge.column(new BloomFilterAggregate(dimHash, expectedKeys)
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val guard = Bridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      new XxHash64(Seq(Bridge.expression(fact(factKey))))))
    val filtered = fact.filter(guard)
    filtered.join(dim, filtered(factKey) === dim(dimKey), "left_semi")
  }

  /** revenue of lineitems supplied by one nation's suppliers: the dim key
    * set (a nation's suppliers) guards the lineitem scan pre-shuffle */
  def bloomJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val supp = Tables(spark, dir, "supplier").filter(col("s_nationkey") === 3)
    bloomSemiJoin(li, supp, "l_suppkey", "s_suppkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double")
          .as("revenue"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, Q] = Map("q_bloom_join" -> bloomJoinQuery)

  val oracles: Map[String, String] = Map(
    "q_bloom_join" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM supplier
        |              WHERE s_suppkey = l_suppkey AND s_nationkey = 3)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
