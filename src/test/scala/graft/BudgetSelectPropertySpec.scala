package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Exactness property for the hierarchical budget-selection
  * decomposition: for ARBITRARY (score, n_words) corpora — tie pileups
  * on one score, everything in one bucket, doc_ids straddling TieSpan
  * boundaries, budgets landing exactly on document boundaries, zero
  * budgets — the histogram-pyramid + within-(score,span) prefix-sum
  * plan must select EXACTLY the documents the naive global greedy
  * (sort by score desc, doc_id; take while strictly-before tokens <
  * budget) selects. */
class BudgetSelectPropertySpec extends SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  // scores cluster (ties + adjacent buckets), words small so budgets hit
  // boundaries often; ~1/4 of generated corpora land in a single bucket
  private val genDocs: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(
    Gen.zip(
      Gen.oneOf(Gen.chooseNum(0L, 30L).map(_ * 10000L), // bucket edges
        Gen.chooseNum(0L, 300000L),                     // spread
        Gen.const(70000L)),                             // heavy tie pileup
      Gen.chooseNum(1L, 20L)))

  // id stride: 1 keeps every doc in one TieSpan span; TieSpan/2 makes
  // consecutive docs straddle span boundaries (2 per span), exercising
  // the tie-split level that dense small ids never reach
  private val genStride: Gen[Long] =
    Gen.oneOf(1L, graft.ops.Sampling.TieSpan / 2, graft.ops.Sampling.TieSpan * 3)

  test("bucketed selection equals naive global greedy on arbitrary corpora") {
    import spark.implicits._
    check(Prop.forAll(genDocs, Gen.chooseNum(0, 100), genStride) { (docs, budgetPct, stride) =>
      val rows = docs.zipWithIndex.map { case ((s, w), i) => (i.toLong * stride, s, w) }
      val total = rows.map(_._3).sum
      val budget = total * budgetPct / 100
      val ranked = rows.sortBy { case (id, s, _) => (-s, id) }
      val before = ranked.scanLeft(0L)(_ + _._3)
      val expected = ranked.zip(before).collect {
        case ((id, _, _), b) if b < budget => id
      }.sorted
      val scored = rows.toDF("doc_id", "score", "n_words")
      val got = Sampling.budgetSelectCore(scored,
        scored.sparkSession.range(1).select(lit(budget).as("budget")))
        .collect().map(_.getLong(0)).toSeq
      Prop(got == expected) :|
        s"budget=$budget got=${got.size} expected=${expected.size}"
    })
  }
}
