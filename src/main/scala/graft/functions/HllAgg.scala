package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog as a first-class Catalyst AGGREGATE expression — the
  * mergeable-sketch API a warehouse actually exposes (`hll_ndv(col)`
  * usable in any groupBy / SQL GROUP BY), not just a hand-rolled groupBy
  * pipeline. `TypedImperativeAggregate` carries the 2^p-byte register
  * array as the aggregation buffer: `update` folds one row locally,
  * `merge` takes the element-wise register max — so partial aggregation
  * happens map-side and the shuffle moves ONE 512-byte buffer per
  * partition per group, the textbook distributed-sketch contract.
  *
  * The hash chain (md5("hll:" || value), first 32 bits; p index bits;
  * rank = leading-zeros-in-23-bits + 1) is IDENTICAL to ops/Sketches'
  * expression pipeline, so the emitted (n_registers, t) pair — exact
  * integers — reproduces bit-for-bit in the DuckDB oracle, and the
  * estimate derives from them in pure IEEE arithmetic.
  *
  * Output: struct(n_registers BIGINT, t BIGINT, ndv_est DOUBLE).
  */
case class HllNdvAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val P = 9
  private val M = 1 << P
  private val WBits = 32 - P
  private val WMask = (1L << WBits) - 1

  // MessageDigest is stateful but reset()s after digest(); one instance
  // per task thread avoids a per-row getInstance allocation.
  @transient private lazy val md5 = MessageDigest.getInstance("MD5")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_registers", LongType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("ndv_est", DoubleType, nullable = false)))

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val s = "hll:" + (v match {
        case u: UTF8String => u.toString
        case other => other.toString
      })
      val digest = md5.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 4 bytes as an unsigned 32-bit value = first 8 hex chars
      val u32 = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      val idx = (u32 >>> WBits).toInt
      val w = u32 & WMask
      val rank =
        if (w == 0L) WBits + 1
        else WBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var present = 0L
    var t = 0L
    var i = 0
    while (i < M) {
      val r = buf(i)
      if (r > 0) { present += 1; t += 1L << (WBits + 1 - r) }
      else t += 1L << (WBits + 1)
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M.toDouble)
    val raw = alpha * M.toDouble * M.toDouble *
      (1L << (WBits + 1)).toDouble / t.toDouble
    // small-range regime: raw HLL floors at ~alpha*m regardless of the
    // true NDV — switch to linear counting over the zero registers. ln()
    // can differ between JVM and DuckDB libm by 1 ULP (verified: 2 of
    // 511 possible inputs), so the corrected branch rounds to 4 decimals
    // via explicit floor arithmetic, identical in both engines; the
    // large-range branch stays a pure rational function of exact ints.
    val zeros = M - present
    val est =
      if (raw <= 2.5 * M.toDouble && zeros > 0L) {
        val lc = M.toDouble * math.log(M.toDouble / zeros.toDouble)
        math.floor(lc * 10000.0 + 0.5) / 10000.0
      } else raw
    org.apache.spark.sql.catalyst.InternalRow(present, t, est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllNdvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllNdvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllNdvAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_hll_ndv"
}

object HllNdvAgg {
  /** the sketch aggregate as a Column, for DataFrame use */
  def hllNdv(c: Column): Column =
    Bridge.column(HllNdvAgg(Bridge.expression(c)).toAggregateExpression())
}
