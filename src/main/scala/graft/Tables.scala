package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session conf every graft entrypoint (Verify/Bench/Explain/specs) sets
    * at construction: lets the parquet reader accept TIMESTAMP(NANOS)
    * columns as bigint. One testdata generation shipped events.ts as
    * NANOS; the conf only affects NANOS columns, so it is a no-op for the
    * micros generation. Kept here (next to the sniffing loader that
    * depends on it) so a new entrypoint can't miss it. */
  val SessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // zstd data files (round 16, guide §6: "smaller than snappy at
    // similar read speed"). Measured ABA on the write family at sf0.1
    // (OPTIMIZATION_r16.md): the zstd leg beat BOTH snappy legs on
    // 9 of 10 keys (totals 25.2 s vs 42.5/34.8 s in comparable-canary
    // windows), and the snappy legs' own io canaries read dirtier —
    // snappy's ~2-3x larger files self-inflict disk-queue pressure the
    // io bracket then measures. Scale-appropriate, not a local[32]
    // trick: at 100 TB smaller files cut the dominant I/O term and
    // zstd is the columnar-format default the guide recommends.
    "spark.sql.parquet.compression.codec" -> "zstd",
    // Long-lived-session hygiene (the round-11 aging diagnosis: a
    // 223-query × 7-round bench JVM slows its driver-bound streaming
    // queries as status stores and weak-ref cleanup lag accumulate).
    // Status retention defaults keep 1000 execution graphs / jobs /
    // stages — days of UI history for a server, pure heap growth for a
    // headless harness; ContextCleaner's periodic GC defaults to 30 min,
    // longer than a whole bench run, so shuffle/broadcast/checkpoint
    // refs were never collected mid-run. Neither touches query plans.
    "spark.sql.ui.retainedExecutions" -> "50",
    "spark.ui.retainedJobs" -> "200",
    "spark.ui.retainedStages" -> "200",
    "spark.cleaner.periodicGC.interval" -> "3min",
    // The round-11 stack-sampled smoking gun: the default FileContext
    // checkpoint manager routes EVERY checkpoint rename (offset log,
    // commit log, state snapshots × partitions × batches) through
    // Hadoop's symlink-aware renameInternal, which fork/execs a
    // `readlink` PROCESS per call — and fork cost scales with the JVM's
    // mapped address space, so streaming queries slowed ~3x as a
    // multi-round suite aged the JVM. The FileSystem-based manager
    // renames via pure-Java File.renameTo (atomic on a local/POSIX FS —
    // this harness's case); object-store deployments should leave the
    // default.
    "spark.sql.streaming.checkpointFileManagerClass" ->
      "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped in two physical shapes across testdata
      // generations: TIMESTAMP(NANOS) — which Spark's parquet reader only
      // accepts via the legacy nanos-as-long conf (set at session
      // construction from [[SessionConfs]]; round 6 set it HERE, a global
      // toggle hidden inside a table accessor) — and plain timestamp[us]
      // (no UTC adjustment → reads back as TIMESTAMP_NTZ). Sniff the
      // loaded schema instead of assuming either shape; every downstream
      // consumer sees a session-TZ TimestampType `ts` at micro precision
      // either way.
      normalizeEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** normalize the physically-varying events `ts` column to a session-TZ
    * TimestampType at micro precision — shared by the batch loader above
    * and the streaming link-staged source (StreamingOps), which reads the
    * RAW files and must apply the identical normalization INSIDE the
    * stream. */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      // nanos generation: truncate to micros (matches DuckDB's
      // micro-precision read; V3Ops.nanoTs keeps full nanos where the
      // format requires them)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType =>
      // micros generation: same wall-clock instant under the UTC
      // session TZ the harness pins everywhere
      df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }
}
