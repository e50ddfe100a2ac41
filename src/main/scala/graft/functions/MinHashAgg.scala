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

/** MinHash set signature as a mergeable Catalyst aggregate — the
  * group-level face of MinHash dedup: estimate the Jaccard similarity
  * between the key SETS of two groups (dataset-overlap / drift
  * measurement) from two 512-byte signatures instead of a key-level
  * join. At 100 TB the exact answer joins every key of every group;
  * the sketch ships K=64 longs per group per partition and compares
  * signatures pairwise — O(groups²·K), independent of row count.
  *
  * K hash functions come from Kirsch-Mitzenmacher double hashing:
  * g_i = (h1 + i·h2) mod 2³², with h1/h2 the first 32 bits of
  * md5("mh1:"||v) / md5("mh2:"||v) — i ≤ 63 keeps i·h2 < 2³⁸, so the
  * arithmetic is exact BIGINT in both Spark and DuckDB and the
  * signature replays bit-for-bit in the oracle. `update` takes the
  * element-wise min over one row's K values, `merge` the element-wise
  * min of two signatures — commutative/associative/idempotent, so the
  * result is partition-invariant AND duplicate-insensitive (min over a
  * multiset equals min over its set, no pre-distinct needed).
  *
  * Output: array<bigint> of length K; P(sig_a[i] = sig_b[i]) = J(A,B).
  */
case class MinHashSigAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import MinHashSigAgg._

  @transient private lazy val md5 = MessageDigest.getInstance("MD5")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(K)(EMPTY)

  private def fold32(s: String): Long = {
    val d = md5.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v match {
        case u: UTF8String => u.toString
        case other => other.toString
      }
      val h1 = fold32("mh1:" + s)
      val h2 = fold32("mh2:" + s)
      var i = 0
      while (i < K) {
        val g = (h1 + i * h2) & 0xFFFFFFFFL
        if (g < buf(i)) buf(i) = g
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSigAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_minhash"
}

object MinHashSigAgg {
  val K = 64
  /** empty-register sentinel: larger than any 32-bit hash value */
  val EMPTY: Long = 1L << 32

  /** the signature aggregate as a Column, for DataFrame use */
  def minhash(c: Column): Column =
    Bridge.column(MinHashSigAgg(Bridge.expression(c)).toAggregateExpression())
}
