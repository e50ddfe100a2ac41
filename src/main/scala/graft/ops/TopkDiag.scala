package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Diagnostic harness for the q_stream_topk suite-context-vs-isolated gap
  * (VERDICT r10 item 1): re-creates the query with PER-PHASE timers
  * (staging links / sentinel write / stream run / batch tail), then runs
  * it isolated, after a streaming-suite prefix, after a batch prefix,
  * and after explicit state resets — so the environment term that
  * doubles it inside the 223-query bench JVM can be pointed at, not
  * guessed. Not part of the query registry; run on demand:
  * `SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.ops.TopkDiag'`. */
object TopkDiag {
  private def now(): Long = System.nanoTime()
  private def secs(t0: Long): Double = (now() - t0) / 1e9

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Tables.SessionConfs.foldLeft(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.SparkEntry.queries("q06_forecast_revenue")(spark, sf).count()

    def heap(tag: String): Unit = {
      val rt = Runtime.getRuntime
      println(f"[diag] heap[$tag] used=${(rt.totalMemory - rt.freeMemory) / 1e6}%.0f MB total=${rt.totalMemory / 1e6}%.0f MB")
    }

    // phase-instrumented replica of StreamingOps.streamTopk
    def topkPhased(tag: String): Unit = {
      val whole = now()
      var t0 = now()
      val tmp = graft.Scratch.dir("diagtopk").toString
      val in = java.nio.file.Paths.get(tmp, "in")
      Files.createDirectories(in)
      val src = java.nio.file.Paths.get(sf, "events.parquet")
      val files: Seq[java.nio.file.Path] =
        if (Files.isDirectory(src)) {
          import scala.jdk.CollectionConverters._
          val s = Files.list(src)
          try s.iterator().asScala.toList
            .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
          finally s.close()
        } else Seq(src)
      files.zipWithIndex.foreach { case (f, i) =>
        Files.createLink(in.resolve(f"linked-a-$i%05d.parquet"), f)
      }
      val raw = spark.read.parquet(s"$sf/events.parquet").schema
      val stage = secs(t0)

      t0 = now()
      val maxUs = graft.table.FooterStats
        .maxTimestampMicros(s"$sf/events.parquet", "ts")
        .getOrElse(graft.Tables(spark, sf, "events")
          .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0))
      val sentinel = spark.range(1).select(
        timestamp_micros(lit(maxUs + 10800000000L)).as("ts"),
        lit(-1L).as("event_id"), lit(0.0).as("value"))
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      val sentOut = raw("ts").dataType match {
        case LongType => sentinel.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
        case TimestampNTZType => sentinel.withColumn("ts", col("ts").cast(TimestampNTZType))
        case _ => sentinel
      }
      sentOut.coalesce(1).write.mode("append").parquet(s"$tmp/in")
      val sent = secs(t0)

      t0 = now()
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val cols = Seq("ts", "event_id", "value")
      val stream = graft.Tables.normalizeEventTs(
        spark.readStream
          .schema(org.apache.spark.sql.types.StructType(cols.map(c => raw(c))))
          .parquet(s"$tmp/in"))
      val agg = stream
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(graft.functions.TopKAgg.topK(col("value"), col("event_id"), 3).as("top"))
      val name = s"dg_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val run = secs(t0)

      t0 = now()
      val n = spark.table(name)
        .select(col("window.start").as("ws"), explode(col("top")).as("t"))
        .select(col("ws"), col("t.rank").as("rank"),
          col("t.id").as("event_id"), col("t.value").as("value"))
        .orderBy("ws", "rank").count()
      spark.catalog.dropTempView(name)
      spark.streams.resetTerminated()
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      val tail = secs(t0)
      val label = s"topk[$tag]"
      println(f"[diag] $label%-22s total=${secs(whole)}%.3f stage=$stage%.3f sentinel=$sent%.3f stream=$run%.3f tail=$tail%.3f rows=$n")
    }

    def runQuery(k: String): Double = {
      val t0 = now()
      graft.SparkEntry.queries(k)(spark, sf).count()
      secs(t0)
    }

    // sample all thread stacks while `body` runs; print the hottest
    // non-idle frames afterwards — the poor man's profiler for the
    // aged-JVM slowdown (what is the driver actually DOING during the
    // slow streaming run?)
    def profiled[A](tag: String)(body: => A): A = {
      val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var run = true
      val sampler = new Thread(() => {
        while (run) {
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            if (st.nonEmpty && !t.getName.contains("sampler")) {
              // full stack for fork/shell frames (WHO shells out?);
              // 3-frame summary for everything else runnable
              if (st.exists(f => f.getClassName.contains("ProcessImpl") ||
                  f.getClassName.contains("hadoop.util.Shell")))
                counts.merge(st.take(25).mkString("\n      "), 1, (a, b) => a + b)
              else if (t.getState == Thread.State.RUNNABLE)
                counts.merge(st.take(3).mkString(" <- "), 1, (a, b) => a + b)
            }
          }
          Thread.sleep(50)
        }
      }, "diag-sampler")
      sampler.setDaemon(true); sampler.start()
      val r = body
      run = false; sampler.join(500)
      import scala.jdk.CollectionConverters._
      counts.asScala.toSeq.sortBy(-_._2).take(14).foreach { case (f, n) =>
        println(s"[diag] HOT[$tag] $n  $f")
      }
      r
    }

    heap("start")
    topkPhased("iso-1"); topkPhased("iso-2")
    heap("after-iso")

    // FULL-SUITE aging: the streaming-family-only aging test showed just
    // +27%/7 rounds, but full 224-query bench rounds inflate the whole
    // streaming family ~3x by kept rounds 2-7 — so the aging driver is
    // in the batch/table queries. Age with complete suite rounds and
    // stack-sample the slow topk run to catch the mechanism in the act.
    val all = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_ == "q_stream_topk")
    for (round <- 1 to 1) {
      val t0 = now()
      all.foreach(runQuery)
      println(f"[diag] FULL aging round $round: ${secs(t0)}%.3f s")
      heap(s"round-$round")
    }
    profiled("aged-topk")(topkPhased("aged-profiled"))
    heap("end")
    spark.stop()
  }
}
