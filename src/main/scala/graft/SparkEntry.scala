package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The capstone pipeline composition (exact dedup → lang/quality gates →
    * family dedup → per-shard packing → split assignment) — the engine's
    * whole LLM-data surface in one dataflow (354 rows at sf0.001). */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.e2e(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ AnalyticsDeep.queries ++ AsOfJoin.queries ++ RangeJoin.queries ++
      SkewJoin.queries ++ BucketJoin.queries ++ BloomJoin.queries ++ SpatialJoin.queries ++ TimeSeries.queries ++
      TextOps.queries ++ Sampling.queries ++ Dedup.queries ++ Similarity.queries ++
      GraftOps.queries ++ V3Ops.queries ++ Multimodal.queries ++ Pipeline.queries ++
      IncrementalAgg.queries ++ CorpusGraph.queries ++ Clustering.queries ++ Interop.queries ++
      IncrementalDedup.queries ++ GraphRank.queries ++ Sketches.queries ++ Behavioral.queries ++
      Scd2.queries ++ DataQuality.queries ++ UrlOps.queries ++ ImageCodec.queries ++
      AudioCodec.queries ++ StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Analytics.oracles ++ AnalyticsDeep.oracles ++ AsOfJoin.oracles ++ RangeJoin.oracles ++
      SkewJoin.oracles ++ BucketJoin.oracles ++ BloomJoin.oracles ++ SpatialJoin.oracles ++ TimeSeries.oracles ++
      TextOps.oracles ++ Sampling.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      GraftOps.oracles ++ V3Ops.oracles ++ Multimodal.oracles ++ Pipeline.oracles ++
      IncrementalAgg.oracles ++ CorpusGraph.oracles ++ Clustering.oracles ++ Interop.oracles ++
      IncrementalDedup.oracles ++ GraphRank.oracles ++ Sketches.oracles ++ Behavioral.oracles ++
      Scd2.oracles ++ DataQuality.oracles ++ UrlOps.oracles ++ ImageCodec.oracles ++
      AudioCodec.oracles ++ StreamingOps.oracles
}
