package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic harness for the bounded pair-unfold cost (VERDICT r13
  * item 3): the round-13 self-join sweep replaced the rare-shingle
  * candidate self-join with an in-expression unfold
  * (`transform`/`slice`/`flatten` over one sorted bounded array per
  * shingle, Dedup.jaccardPairsLazy) — but Spark evaluates higher-order
  * functions INTERPRETED, outside whole-stage codegen, and the chain now
  * sits on the dedup family's hottest path. This isolates its cost with
  * three nested variants over the identical upstream work at sf0.1:
  *
  *  - ARRAYS:  shingle -> df -> tagged join -> groupBy(s) ->
  *             sort_array(collect_list) -> a codegen'd arithmetic count
  *             of the pairs each array WOULD emit (no HOF, no explode);
  *  - UNFOLD:  ARRAYS + the interpreted HOF chain + explode + count
  *             (pays HOF evaluation, not the pair shuffle);
  *  - FULL:    UNFOLD + the (a_id, b_id) pair aggregation — the
  *             production interRare stage.
  *
  * UNFOLD − ARRAYS ≈ the interpreted-HOF term; FULL − UNFOLD ≈ the pair
  * shuffle. Not part of the query registry; run on demand:
  * `SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.ops.UnfoldDiag'`. */
object UnfoldDiag {
  private def now(): Long = System.nanoTime()
  private def secs(t0: Long): Double = (now() - t0) / 1e9

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_DIAG_REPS", "5").toInt
    val spark = graft.Tables.SessionConfs.foldLeft(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // the production rare-arrays stage, replicated expression-for-
    // expression from Dedup.jaccardPairsLazy (same keys, same cap)
    def rareArrays(): DataFrame = {
      val docs = graft.Tables(spark, sf, "documents")
      val sh = Dedup.shingleArr(docs)
        .select(col("doc_id"), explode(col("sh")).as("s0"))
        .select(col("doc_id"), xxhash64(col("s0")).as("s"))
      val df = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      sh.join(df, "s").filter(col("df") <= Dedup.JACCARD_MAX_DF)
        .groupBy(col("s"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
    }
    val unfold = expr(
      "flatten(transform(ds, (x, i) -> " +
        "transform(slice(ds, i + 2, size(ds)), y -> " +
        "named_struct('a_id', x, 'b_id', y))))")

    def timed(tag: String, job: () => Long): Unit = {
      val t0 = now()
      val n = job()
      println(f"[unfolddiag] $tag%-7s ${secs(t0)}%.3f s (n=$n)")
    }
    // one warm pass of each variant (codegen + parquet footer caches)
    rareArrays().select(sum(expr("size(ds) * (size(ds) - 1) div 2"))).collect()
    rareArrays().select(explode(unfold).as("p")).count()

    for (rep <- 1 to reps) {
      println(s"[unfolddiag] rep=$rep")
      timed("ARRAYS", () =>
        rareArrays()
          .select(sum(expr("size(ds) * (size(ds) - 1) div 2")).as("n"))
          .collect()(0).getLong(0))
      timed("UNFOLD", () =>
        rareArrays().select(explode(unfold).as("p")).count())
      timed("FULL", () =>
        rareArrays().select(explode(unfold).as("p"))
          .groupBy(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
          .agg(count(lit(1)).as("ir")).count())
    }
    spark.stop()
  }
}
