package graft

/** Session-hygiene pin for the round-12 cache sweep: a library query
  * must not leave anything pinned in the session's CacheManager. Six
  * multi-pass operators used `.cache()` on intermediates with no
  * unpersist point (their results are lazy, so there is nowhere to
  * release from) — each invocation pinned a cached relation for the
  * SESSION lifetime, the same accumulate-per-round class as the
  * round-11 memory-sink leak, just in CacheManager instead of the
  * temp-view catalog. They now pin intermediates via localCheckpoint
  * (blocks are ContextCleaner-freed once the query's references drop).
  * The two legitimate cache users release explicitly and are covered
  * here too: merge unpersists in a finally, hllRollup after an eager
  * result pin. */
class CacheHygieneSpec extends SparkSpec {

  test("multi-pass queries leave no CacheManager entries behind") {
    val dir = "/root/testdata/sf0.001"
    val keys = Seq("q_funnel", "q_cluster_kmeans", "q_dedup_jaccard",
      "q_dedup_minhash", "q_dedup_eval", "q_dedup_incremental",
      "q_hll_rollup", "q_merge_upsert")
    spark.catalog.clearCache()
    keys.foreach(k => SparkEntry.queries(k)(spark, dir).count())
    assert(spark.sharedState.cacheManager.isEmpty,
      "a query left a cached relation pinned in the session CacheManager")
  }
}
