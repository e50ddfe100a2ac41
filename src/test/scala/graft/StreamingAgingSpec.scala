package graft

/** Regression pin for the round-11 JVM-aging class: catalog-pinned
  * memory sinks and the default checkpoint manager's per-rename process
  * fork both made STREAMING work progressively slower inside one JVM —
  * q_stream_topk climbed 1.34 → 1.70 s over 7 suite rounds, and the
  * fork cost (scaling with JVM mapped memory) aged a full suite round
  * ~30%. Both causes are fixed (drainSink; the FileSystem-based
  * checkpoint manager in Tables.SessionConfs), and StreamingStateSpec
  * pins the STATE-level invariant (nothing pinned after a query). This
  * spec pins the TIMING slope itself, because the state-level spec
  * cannot see a regression that leaks something it doesn't enumerate:
  * run the same streaming mini-round back-to-back in one JVM and assert
  * the later rounds' wall stays within a generous bound of the early
  * rounds'. Skew tolerance: min-of-two on both sides (a steal burst
  * poisons at most one round per side), and a 2× bound — the round-11
  * pre-fix slope reached ~3× on an aged JVM, while post-fix rounds
  * repeat within ~±15%. */
class StreamingAgingSpec extends SparkSpec {

  test("back-to-back streaming rounds do not age the JVM") {
    val dir = "/root/testdata/sf0.001"
    val qs = Seq("q_stream_window", "q_stream_topk", "q_stream_sketch")
    def roundWall(): Double = {
      val t0 = System.nanoTime()
      qs.foreach(q => graft.ops.StreamingOps.queries(q)(spark, dir).count())
      (System.nanoTime() - t0) / 1e9
    }
    roundWall() // warm codegen, committers, state-store providers
    val walls = Vector.fill(4)(roundWall())
    val early = walls.take(2).min
    val late = walls.takeRight(2).min
    assert(late <= early * 2.0,
      s"streaming rounds aged the JVM: walls=${walls.map(w => f"$w%.2f").mkString(",")}")
  }
}
