package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a first-class Catalyst aggregate — the mergeable
  * frequency summary for heavy-hitter / hot-key detection at 100 TB,
  * where an exact per-key count means shuffling every key and the sketch
  * means shuffling a fixed 32 KB counter grid.
  *
  * `TypedImperativeAggregate[Array[Long]]` carries the D×W counter grid
  * (D = 4 hash rows, W = 1024 buckets) as the aggregation buffer:
  * `update` bumps one counter per hash row locally, `merge` is
  * element-wise SUM — both commutative and associative, so the result is
  * partition-invariant and partial aggregation runs map-side. A probe
  * for key k reads `min_d grid[d][h_d(k)]`, an upper bound on the true
  * count (ε = e/W ≈ 0.27 % of N overestimate at δ = e^-4).
  *
  * The hash rows reuse the engine's md5 chain (`md5("cms<d>:" || value)`,
  * first 32 bits, low 10 bits as bucket), so every counter is an exact
  * integer reproducible in the DuckDB oracle — sketch AND probe replay
  * bit-for-bit. The operational use-case is skew detection: the probe
  * side of `q_cms_topk` is exactly the "which keys need salting" query
  * that feeds `SkewJoin`.
  *
  * Output: array<bigint> of length D*W (row-major), probed via
  * `element_at(sk, d*W + h_d(k) + 1)`.
  */
case class CmsSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import CmsSketchAgg._

  // MessageDigest reset()s after digest(); one instance per task thread
  // avoids a per-row getInstance allocation.
  @transient private lazy val md5 = MessageDigest.getInstance("MD5")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v match {
        case u: UTF8String => u.toString
        case other => other.toString
      }
      var d = 0
      while (d < D) {
        val digest = md5.digest(
          ("cms" + d + ":" + s).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val u32 = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
          ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
        buf(d * W + (u32 & (W - 1)).toInt) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_cms"
}

object CmsSketchAgg {
  val D = 4
  val W = 1024

  /** CMS overestimate bound as a fraction of total count: ε = e/W */
  val Epsilon: Double = math.E / W

  /** the sketch aggregate as a Column, for DataFrame use */
  def cms(c: Column): Column =
    Bridge.column(CmsSketchAgg(Bridge.expression(c)).toAggregateExpression())

  /** driver-side probe: min over hash rows — the same upper-bound
    * estimate the SQL probe path reads, for harness code that already
    * holds the collected grid (hot-key detection in Similarity) */
  def probe(grid: Array[Long], key: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    var best = Long.MaxValue
    var d = 0
    while (d < D) {
      val digest = md.digest(
        ("cms" + d + ":" + key).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val u32 = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      val v = grid(d * W + (u32 & (W - 1)).toInt)
      if (v < best) best = v
      d += 1
    }
    best
  }
}
