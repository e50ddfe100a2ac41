package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pins Bench's BASELINE.md parsing. Round 5's canary-normalized verdict
  * silently never fired because the `canary floor:` phrase was
  * line-wrapped in the committed file and the regex wasn't
  * whitespace-tolerant — this spec makes both the committed-file parse
  * and the wrap-tolerance named assertions. */
class BenchParseSpec extends AnyFunSuite {

  test("canary floor parses from the committed BASELINE.md") {
    val f = Bench.canaryFloor()
    assert(f.nonEmpty, "BASELINE.md lost its `canary floor: N s` phrase")
    assert(f.get > 0.0 && f.get < 10.0, s"implausible canary floor: $f")
  }

  test("canary floor parse tolerates a line-wrapped phrase") {
    val t = Files.createTempFile("baseline", ".md")
    Files.writeString(t, "blah codegen; canary\nfloor: 0.055 s, measured")
    assert(Bench.canaryFloor(t.toString).contains(0.055))
    Files.delete(t)
  }

  test("per-query floors parse from the committed BASELINE.md") {
    val fl = Bench.floors()
    assert(fl.size > 100, s"floor table shrank: ${fl.size} rows parsed")
    // refresh semantics: a LATER table row overrides the main table.
    // q_dedup_jaccard has three generations — the pre-reshape 1.43, the
    // round-7 post-reshape 3.72 (soft: it embedded warm-cache reruns via
    // the since-fixed CacheManager leak), and the round-12 honest floor;
    // the pin is the round-12 run-B value, proving the LAST row wins
    assert(fl.get("q_dedup_jaccard").contains(6.327),
      s"round-12 floor row must override: ${fl.get("q_dedup_jaccard")}")
    // round-7 additions present
    assert(fl.contains("q_geo_sphere"))
    // round-8 refresh of the stale r4-pristine floors must override
    assert(fl.get("q_ann_ivf").contains(0.56),
      s"r8 floor-refresh row must override: ${fl.get("q_ann_ivf")}")
    assert(fl.get("q_events_window").contains(0.25))
    // round-11 refresh: the r3/r4-era recheck cluster + the documented
    // q_stream_topk re-floor override their earlier rows (min of the
    // two clean-window columns per the committed semantics)
    assert(fl.get("q01_pricing_summary").contains(0.326),
      s"r11 floor-refresh row must override q01: ${fl.get("q01_pricing_summary")}")
    assert(fl.get("q_bm25").contains(0.821),
      s"r11 floor-refresh row must override q_bm25: ${fl.get("q_bm25")}")
    assert(fl.get("q_stream_topk").contains(1.372),
      s"r11 topk re-floor must override the r10 row: ${fl.get("q_stream_topk")}")
    // first floor for the round-11 interop query
    assert(fl.get("q_interop_extbranch").contains(3.655))
  }

  test("sched floor parses from the committed BASELINE.md (round-8 commitment)") {
    val f = Bench.schedFloor()
    assert(f.nonEmpty, "BASELINE.md lost its `sched floor: N s` phrase")
    assert(f.get > 0.0 && f.get < 2.0, s"implausible sched floor: $f")
    // wrap tolerance, same guarantee as the CPU canary's phrase
    val t = Files.createTempFile("baseline", ".md")
    Files.writeString(t, "committed: sched\nfloor: 0.090 s, kept-round median")
    assert(Bench.schedFloor(t.toString).contains(0.090))
    Files.delete(t)
  }

  test("io floor parses from the committed BASELINE.md (round-8 closing commitment)") {
    val f = Bench.ioFloor()
    assert(f.nonEmpty, "BASELINE.md lost its `io floor: N s` phrase")
    assert(f.get > 0.0 && f.get < 5.0, s"implausible io floor: $f")
  }

  test("aging threshold parses from the committed BASELINE.md (round-12 commitment)") {
    val t = Bench.agingThreshold()
    assert(t.nonEmpty, "BASELINE.md lost its `aging threshold: N` phrase")
    assert(t.get > 1.0 && t.get < 3.0, s"implausible aging threshold: $t")
  }
}
