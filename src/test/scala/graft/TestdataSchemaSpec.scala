package graft

import org.apache.spark.sql.types._

/** Pins the post-`Tables()` logical schema of every driver-generated
  * testdata table (TESTDATA.md). The driver regenerated the testdata
  * once (round 5: events.ts int64-nanos → timestamp[us]) and the
  * result was 20 cascading AnalysisExceptions with no named cause.
  * This spec exists so an incompatible regen fails HERE, as one
  * assertion naming the table and column, before anything else runs.
  *
  * Expected types are the POST-LOAD contract every operator codes
  * against, not the physical parquet types: events.ts must come back
  * as a session-TZ timestamp whatever the physical generation
  * (Tables.scala normalizes), while the plain TPC-H timestamp[us]
  * columns read as TIMESTAMP_NTZ (no UTC adjustment; harness pins the
  * session TZ to UTC so the instant semantics are identical).
  */
class TestdataSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  // types alone can't catch a UNIT flip (e.g. a future regen shipping ts
  // as int64 MICROS would satisfy the LongType branch but decode 1000x
  // off) — pin the decoded instants to a sane range as well
  test("events.ts decodes to plausible instants (unit sanity)") {
    import org.apache.spark.sql.functions._
    for (sfDir <- Seq(sf, sf01)) {
      val r = Tables(spark, sfDir, "events")
        .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
        .collect()(0)
      assert(r.getInt(0) >= 2000 && r.getInt(1) <= 2100,
        s"events.ts decodes to years [${r.getInt(0)}, ${r.getInt(1)}] at " +
          s"$sfDir — the loader is misreading the timestamp unit")
    }
  }

  test("footer-stat max(ts) equals the scanned max (streaming sentinel source)") {
    // the streaming sentinels derive their watermark horizon from parquet
    // FOOTER stats (no Spark job); the footer answer must equal the scan
    // on every testdata generation (nanos-as-int64 AND timestamp[us])
    import org.apache.spark.sql.functions._
    for (sfDir <- Seq(sf, sf01, "/root/testdata/sf0.1")) {
      val footer = graft.table.FooterStats
        .maxTimestampMicros(s"$sfDir/events.parquet", "ts")
      assert(footer.isDefined, s"no footer ts stats at $sfDir")
      val scanned = Tables(spark, sfDir, "events")
        .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
      assert(footer.get == scanned,
        s"footer max ${footer.get} != scanned max $scanned at $sfDir")
    }
  }

  for (sfDir <- Seq(sf, sf01); name <- Tables.names) {
    test(s"testdata schema guard: $name at $sfDir") {
      val got = Tables(spark, sfDir, name).schema
        .map(f => f.name -> f.dataType)
      val want = expected(name)
      assert(got.map(_._1) == want.map(_._1),
        s"column set/order drifted for $name: got ${got.map(_._1)}")
      for (((col, wantT), (_, gotT)) <- want.zip(got)) {
        // array element nullability is writer-dependent; compare ignoring it
        def norm(t: DataType): DataType = t match {
          case ArrayType(e, _) => ArrayType(norm(e))
          case o => o
        }
        assert(norm(gotT) == norm(wantT),
          s"$name.$col: expected $wantT, testdata now loads as $gotT " +
            "— the driver regenerated testdata incompatibly; fix Tables.scala")
      }
    }
  }
}
