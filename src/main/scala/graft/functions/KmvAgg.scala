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

/** KMV ("bottom-k" / theta) distinct sketch as a mergeable Catalyst
  * aggregate — the sketch family Iceberg's Puffin stats files carry
  * (apache-datasketches-theta-v1) for column NDV. Unlike HLL it supports
  * SET ALGEBRA: the K smallest distinct hash values of a set are a
  * uniform sample of the hash space below a data-dependent threshold
  * theta (the K-th minimum), so union sketches combine by "merge and
  * keep the K smallest" and intersections are estimated by counting
  * common sample values below min(theta_a, theta_b).
  *
  * Scale shape: `update` folds one row into a capped ordered set (≤ K
  * longs), `merge` is a bounded set union — partials flow map-side, the
  * shuffle carries at most K longs per group per partition, and sketches
  * of different partitions / snapshots / tables merge losslessly. The
  * estimator (K-1)·2³²/theta is a single IEEE double division over exact
  * integers, so Spark and DuckDB replay it bit-identically.
  *
  * Output: array<bigint> — the ascending K minimum 32-bit hash values
  * (fewer than K ⇒ the set was small enough that the sketch is EXACT).
  * Relative error ~1/sqrt(K-1) ≈ 6.3 % at K = 256.
  */
case class KmvSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  import KmvSketchAgg._

  @transient private lazy val md5 = MessageDigest.getInstance("MD5")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def fold32(s: String): Long = {
    val d = md5.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < K) { buf.add(h); () }
    else if (h < buf.last()) { buf.add(h); if (buf.size > K) { buf.pollLast(); () } }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v match {
        case u: UTF8String => u.toString
        case other => other.toString
      }
      insert(buf, fold32("kmv:" + s))
    }
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val out = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    while (bb.remaining() >= 8) out.add(bb.getLong())
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_kmv"
}

object KmvSketchAgg {
  val K = 256
  /** hash-space size: fold32 values lie in [0, 2^32) */
  val SPACE: Double = 4294967296.0

  /** the sketch aggregate as a Column, for DataFrame use */
  def kmv(c: Column): Column =
    Bridge.column(KmvSketchAgg(Bridge.expression(c)).toAggregateExpression())
}
