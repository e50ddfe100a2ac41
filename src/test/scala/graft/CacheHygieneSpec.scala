package graft

/** Session-hygiene gate for the whole registry: a library query must
  * not leave anything pinned in the session behind its back — no
  * CacheManager entries (the round-12 leak class: a query-path
  * `.cache()` with no unpersist point pins a relation for the SESSION
  * lifetime, and CacheManager matches re-invocations by logical-plan
  * equality, so benches silently go warm and floors go soft), no
  * leaked temp views (the round-11 memory-sink class), and no
  * still-active streaming queries. Round 12 pinned the 8 known cache
  * users; this sweep runs EVERY registry query at sf0.001 and checks
  * after each one, so the NEXT leak is a named build failure instead
  * of a next-round diagnosis. The legitimate cache users release
  * explicitly (merge unpersists in a finally; hllRollup and the dedup
  * family after an eager result pin) and are covered by construction. */
class CacheHygieneSpec extends SparkSpec {

  test("every registry query leaves no CacheManager entries, temp views, or live streams") {
    val dir = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    val viewsBefore = spark.catalog.listTables().collect().map(_.name).toSet
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (k, fn) =>
      val err = try { fn(spark, dir).count(); None }
      catch { case e: Throwable => Some(s"$k FAILED: ${e.getMessage}") }
      val cacheLeak =
        if (spark.sharedState.cacheManager.isEmpty) None
        else { spark.catalog.clearCache(); Some(s"$k leaked a CacheManager entry") }
      val viewLeak = {
        val fresh = spark.catalog.listTables().collect().map(_.name).toSet -- viewsBefore
        if (fresh.isEmpty) None
        else {
          fresh.foreach(v => spark.catalog.dropTempView(v))
          Some(s"$k leaked temp view(s): ${fresh.mkString(", ")}")
        }
      }
      val streamLeak =
        if (spark.streams.active.isEmpty) None
        else {
          spark.streams.active.foreach(_.stop())
          Some(s"$k left ${spark.streams.active.length} active streaming queries")
        }
      err.toSeq ++ cacheLeak ++ viewLeak ++ streamLeak
    }
    assert(offenders.isEmpty,
      s"session-hygiene offenders:\n  ${offenders.mkString("\n  ")}")
  }
}
