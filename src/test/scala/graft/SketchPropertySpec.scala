package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvSketchAgg

/** Algebraic laws the mergeable sketches must satisfy for their 100 TB
  * contract (arbitrary partitioning, re-partitioning, retries) to hold:
  * merge must be commutative, associative, idempotent, and agree with
  * building the sketch from the concatenated input. Exercised directly
  * on the aggregate's buffer operations with ScalaCheck inputs — no
  * Spark job, so thousands of cases run in milliseconds. */
class SketchPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  /** drive the TypedImperativeAggregate buffer ops directly */
  private def kmvOf(values: Seq[Long]): java.util.TreeSet[java.lang.Long] = {
    val agg = KmvSketchAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = false))
    val buf = agg.createAggregationBuffer()
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    values.foreach { v =>
      row.update(0, v)
      agg.update(buf, row)
    }
    buf
  }

  private def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val agg = KmvSketchAgg(org.apache.spark.sql.catalyst.expressions.Literal(1L))
    val out = agg.createAggregationBuffer()
    out.addAll(a); agg.merge(out, b)
  }

  private val genVals: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))

  test("kmv: merge of partition sketches equals sketch of the whole") {
    check(Prop.forAll(genVals, genVals) { (xs, ys) =>
      merge(kmvOf(xs), kmvOf(ys)) == kmvOf(xs ++ ys)
    })
  }

  test("kmv: merge is commutative and idempotent; duplicates don't matter") {
    check(Prop.forAll(genVals, genVals) { (xs, ys) =>
      val ab = merge(kmvOf(xs), kmvOf(ys))
      val ba = merge(kmvOf(ys), kmvOf(xs))
      ab == ba &&
        merge(ab, ab) == ab &&
        kmvOf(xs ++ xs) == kmvOf(xs)
    })
  }

  test("kmv: sketch is the ascending bottom-K distinct hashes, exact when small") {
    check(Prop.forAll(genVals) { xs =>
      val sk = kmvOf(xs)
      import scala.jdk.CollectionConverters._
      val arr = sk.iterator().asScala.map(_.longValue).toSeq
      arr == arr.sorted && arr.size <= KmvSketchAgg.K &&
        (xs.distinct.size > KmvSketchAgg.K || arr.size <= xs.distinct.size)
    })
  }

  test("kmv: serialization round-trips the buffer") {
    val agg = KmvSketchAgg(org.apache.spark.sql.catalyst.expressions.Literal(1L))
    check(Prop.forAll(genVals) { xs =>
      val b = kmvOf(xs)
      agg.deserialize(agg.serialize(b)) == b
    })
  }

  private def minhashOf(values: Seq[Long]): Seq[Long] = {
    val agg = graft.functions.MinHashSigAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = false))
    val buf = agg.createAggregationBuffer()
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    values.foreach { v => row.update(0, v); agg.update(buf, row) }
    buf.toSeq
  }

  test("minhash: merge of partition signatures equals whole-input signature") {
    val agg = graft.functions.MinHashSigAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L))
    check(Prop.forAll(genVals, genVals) { (xs, ys) =>
      val merged = agg.merge(
        minhashOf(xs).toArray, minhashOf(ys).toArray).toSeq
      merged == minhashOf(xs ++ ys) &&
        minhashOf(xs ++ xs) == minhashOf(xs) // duplicate-insensitive
    })
  }

  test("cms: merge is element-wise sum; total mass = input size * depth") {
    val agg = graft.functions.CmsSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L))
    def cmsOf(values: Seq[Long]): Array[Long] = {
      val a = graft.functions.CmsSketchAgg(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, org.apache.spark.sql.types.LongType, nullable = false))
      val buf = a.createAggregationBuffer()
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      values.foreach { v => row.update(0, v); a.update(buf, row) }
      buf
    }
    check(Prop.forAll(genVals, genVals) { (xs, ys) =>
      val merged = agg.merge(cmsOf(xs), cmsOf(ys)).toSeq
      merged == cmsOf(xs ++ ys).toSeq &&
        merged.sum == (xs.length + ys.length).toLong * graft.functions.CmsSketchAgg.D
    })
  }
}
