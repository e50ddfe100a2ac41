package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Fixed-bin histogram quantiles as a mergeable Catalyst aggregate — the
  * sketch that replaces exact per-group sort quantiles at 100 TB. Exact
  * `percentile` sorts every group's values; this buffer is `bins` longs,
  * merges by element-wise SUM (commutative/associative → partition-
  * invariant, unlike t-digest whose result depends on merge order), and
  * the shuffle carries one fixed-size counter array per partition per
  * group regardless of row count.
  *
  * Binning is pure integer arithmetic — `bin = clamp((x-lo)*bins /
  * (hi-lo))` in BIGINT — and each quantile q is answered as the upper
  * edge of the first bin whose cumulative count reaches q*n, a fixed
  * IEEE double sequence over exact integers, so the DuckDB oracle
  * (width-bucket + windowed cumsum) reproduces every output bit.
  * Accuracy is ±(hi-lo)/bins by construction; `q_hist_quantiles` emits
  * the exact percentile beside the estimate so the error is visible.
  *
  * Output: struct(n BIGINT, p50 DOUBLE, p90 DOUBLE, p99 DOUBLE).
  */
case class HistQuantileAgg(
    child: Expression,
    lo: Long,
    hi: Long,
    bins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(hi > lo && bins > 0)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("p50", DoubleType, nullable = false),
    StructField("p90", DoubleType, nullable = false),
    StructField("p99", DoubleType, nullable = false)))

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Number].longValue
      val raw = (x - lo) * bins / (hi - lo)
      val bin = if (raw < 0) 0 else if (raw >= bins) bins - 1 else raw.toInt
      buf(bin) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < bins) { n += buf(i); i += 1 }
    val width = (hi - lo).toDouble / bins.toDouble
    def quantile(p: Double): Double = {
      val target = p * n.toDouble
      var cum = 0L
      var b = 0
      while (b < bins) {
        cum += buf(b)
        if (cum.toDouble >= target) return lo.toDouble + (b + 1).toDouble * width
        b += 1
      }
      hi.toDouble
    }
    InternalRow(n, quantile(0.5), quantile(0.9), quantile(0.99))
  }

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

  override def withNewMutableAggBufferOffset(newOffset: Int): HistQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistQuantileAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_hist_quantile"
}

object HistQuantileAgg {
  /** the sketch aggregate as a Column, for DataFrame use */
  def histQuantile(c: Column, lo: Long, hi: Long, bins: Int): Column =
    Bridge.column(
      HistQuantileAgg(Bridge.expression(c), lo, hi, bins).toAggregateExpression())

  /** SQL builder: graft_hist_quantile(col, lo, hi, bins) — bounds must be
    * foldable literals */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    def lit(e: Expression): Long = e.eval().asInstanceOf[Number].longValue
    HistQuantileAgg(exprs.head, lit(exprs(1)), lit(exprs(2)), lit(exprs(3)).toInt)
  }
}
