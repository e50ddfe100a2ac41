package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.Bench.{Bracket, cleanFlags, keptRounds, median, selectSamples}

/** Pins the steal-aware sample-selection logic (pure functions in
  * [[Bench]]): which rounds count as clean, which samples feed the
  * medians, and the all-dirty fallback. Rounds 5 and 6 both ran inside
  * 5x-steal windows — the selection is what lets a BENCH_r7 verdict
  * stand on clean windows only, so it gets its own pins. */
class BenchSampleSpec extends AnyFunSuite {

  private val floor = Some(0.055)

  test("a round is clean only when BOTH brackets sit under thresh x floor") {
    val rounds = Seq(
      Bracket(0.06, 0.07),  // clean
      Bracket(0.06, 0.30),  // post bracket stolen -> dirty
      Bracket(0.30, 0.06),  // pre bracket stolen -> dirty
      Bracket(0.25, 0.28))  // fully stolen -> dirty
    assert(cleanFlags(rounds, floor, 2.0) == Seq(true, false, false, false))
  }

  test("threshold is strict: exactly 2.0x the floor is NOT clean") {
    assert(cleanFlags(Seq(Bracket(0.11, 0.11)), floor, 2.0) == Seq(false))
    assert(cleanFlags(Seq(Bracket(0.1099, 0.1099)), floor, 2.0) == Seq(true))
  }

  test("no canary floor (fresh checkout): every round counts as clean") {
    val rounds = Seq(Bracket(9.0, 9.0), Bracket(0.06, 0.06))
    assert(cleanFlags(rounds, None, 2.0) == Seq(true, true))
    assert(cleanFlags(rounds, Some(0.0), 2.0) == Seq(true, true))
  }

  test("kept rounds = clean rounds; all-dirty run falls back to all rounds") {
    val mixed = Seq(Bracket(0.06, 0.06), Bracket(0.30, 0.30))
    assert(keptRounds(mixed, floor, 2.0) == Seq(true, false))
    // an all-stolen run must still report medians over SOMETHING — the
    // normalized verdict adjudicates them — never an empty sample set
    val dirty = Seq(Bracket(0.30, 0.30), Bracket(0.40, 0.25))
    assert(keptRounds(dirty, floor, 2.0) == Seq(true, true))
  }

  test("medians come from kept-round samples; dropped rounds don't poison") {
    // round 2 rode a steal burst: its 9.0 s sample must not survive
    val main = Vector(1.0, 9.0, 1.2)
    val kept = Seq(true, false, true)
    val sel = selectSamples(main, kept, Vector.empty, tailKept = false)
    assert(sel == Vector(1.0, 1.2))
    assert(median(sel) == 1.1)
  }

  test("tail samples join the medians only when the tail bracket is clean") {
    val main = Vector(1.0, 9.0)
    val kept = Seq(true, false)
    assert(selectSamples(main, kept, Vector(1.1, 1.3), tailKept = true) ==
      Vector(1.0, 1.1, 1.3))
    assert(selectSamples(main, kept, Vector(8.0, 7.0), tailKept = false) ==
      Vector(1.0))
  }

  test("failed (negative) samples survive selection for the medOf poisoning") {
    val sel = selectSamples(Vector(-1.0, 2.0), Seq(true, true),
      Vector.empty, tailKept = false)
    assert(sel.contains(-1.0), "selection must not drop failure markers")
  }
}
