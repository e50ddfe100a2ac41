package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The correctness gate must be fail-loud (round-5 finding 2): a query
  * that throws has to leave per-query evidence, never a silently-absent
  * output directory. */
class VerifyGateSpec extends SparkSpec {

  test("a throwing query leaves an _ERROR marker dir, not silence") {
    val out = Files.createTempDirectory("graft-vgate").toString
    val ok = Verify.runOne(spark, sf, out, "q_boom",
      (_, _) => throw new RuntimeException("deliberate"))
    assert(!ok)
    val marker = Paths.get(out, "q_boom", "_ERROR")
    assert(Files.exists(marker), "failed query must still create its dir")
    assert(Files.readString(marker).contains("deliberate"))
  }

  test("a succeeding query writes parquet and no marker") {
    val out = Files.createTempDirectory("graft-vgate2").toString
    val ok = Verify.runOne(spark, sf, out, "q_tiny",
      (s, _) => s.range(3).select(col("id")))
    assert(ok)
    assert(!Files.exists(Paths.get(out, "q_tiny", "_ERROR")))
    assert(spark.read.parquet(s"$out/q_tiny").count() == 3)
  }

  test("every registry query produces an output dir (success or marker)") {
    // the completeness invariant selfcheck.py enforces against
    // queries.json: registry key set == output dir set. Proven here on
    // the mechanism (runOne always creates the dir), and cheaply on a
    // sample of real queries rather than re-running all 180.
    val out = Files.createTempDirectory("graft-vgate3").toString
    val sample = SparkEntry.queries.keys.toSeq.sorted.take(3)
    sample.foreach(n => Verify.runOne(spark, sf, out, n, SparkEntry.queries(n)))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == sample.toSet,
      s"output dirs $dirs != sampled registry $sample")
  }
}
