package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is physically TIMESTAMP(NANOS), which Spark's parquet
      // reader rejects; read it as raw nanos and truncate to micros. The
      // data DOES carry sub-microsecond components — truncation matches
      // DuckDB's micro-precision read exactly (V3Ops.nanoTs preserves the
      // full nanos where the format requires them).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
