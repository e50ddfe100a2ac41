package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Diagnostic harness for the q_overwrite_partitions flag (VERDICT r13
  * item 1): re-creates the query with PER-PHASE timers — table create,
  * full-events append (the parquet write that should dominate), the
  * one-day overwritePartitions commit (manifest-scoped file swap), and
  * the final full scan+agg — repeated N times with an io-canary sample
  * between repeats, so the flag can be pointed at a phase instead of
  * adjudicated by wall-clock alone. Not part of the query registry; run
  * on demand: `SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.ops.OwpDiag'`. */
object OwpDiag {
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
    // warm the exact query once (codegen + committer paths)
    graft.SparkEntry.queries("q_overwrite_partitions")(spark, sf).count()

    def ioCanary(): Double = {
      val dir = java.nio.file.Files.createTempDirectory("graft-owpdiag-io")
      val t0 = now()
      spark.range(0L, 2000000L, 1L, 8)
        .selectExpr("id", "id * 7 as v")
        .write.mode("overwrite").parquet(s"$dir/p")
      spark.read.parquet(s"$dir/p").count()
      val s = secs(t0)
      graft.Scratch.deleteRecursively(dir)
      s
    }
    ioCanary()

    for (rep <- 1 to reps) {
      val io = ioCanary()
      val whole = now()
      var t = now()
      val tbl = graft.table.GraftTable.create(spark,
        graft.Scratch.dir("owpdiag").toString,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
        partitionBy = Seq("day(ts)"))
      val tCreate = secs(t)
      val ev = graft.Tables(spark, sf, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      t = now()
      tbl.append(ev)
      val tAppend = secs(t)
      t = now()
      val patch = ev.filter(to_date(col("ts")) === lit("2024-01-15"))
        .withColumn("value", col("value") * 2.0)
      tbl.overwritePartitions(patch)
      val tOverwrite = secs(t)
      t = now()
      tbl.scan()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
        .orderBy("event_type").count()
      val tScan = secs(t)
      println(f"[owpdiag] rep=$rep io=${io}%.3f create=${tCreate}%.3f " +
        f"append=${tAppend}%.3f overwrite=${tOverwrite}%.3f scan=${tScan}%.3f " +
        f"total=${secs(whole)}%.3f")
    }
    spark.stop()
  }
}
