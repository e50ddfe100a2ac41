package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k as a first-class mergeable Catalyst AGGREGATE — the
  * streaming-rank primitive (`graft_top_k(value, id, k)` in any
  * groupBy, batch or streaming). The aggregation buffer is a k-bounded
  * array of (value, id) pairs ordered by (value DESC, id ASC):
  * `update` folds one row against the current worst entry, `merge`
  * merge-sorts two bounded buffers and re-truncates — so partial
  * aggregation happens map-side and the shuffle (or the streaming
  * state store) carries AT MOST k entries per group, never the group's
  * row count. That bound is the whole point at scale: an exact global
  * rank over an unbounded stream needs O(rows) state, while the
  * windowed top-k needs O(k × open windows) — the only continuous
  * "trending items" shape a 100 TB/day stream can afford (same state
  * contract as [[HllNdvAgg]], a constant-size mergeable buffer).
  *
  * Determinism: ties in value break by LOWER id, so the emitted
  * ranking is a total order reproducible by any engine's
  * `row_number() OVER (ORDER BY value DESC, id)` — the DuckDB oracle
  * replays it exactly; values pass through untouched (no arithmetic),
  * so the cross-engine hash compares bit-for-bit.
  *
  * Output: array<struct(rank BIGINT, id BIGINT, value DOUBLE)>,
  * rank 1..k in emission order.
  */
case class TopKAgg(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.ArrayList[(Double, Long)]]
  with ImplicitCastInputTypes {

  require(k > 0, "graft_top_k: k must be positive")

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  // declared input types + implicit casts: graft_top_k(int_col, int_id, k)
  // from the SQL surface analyzes to casts instead of failing executor-side
  // with a ClassCastException in update()'s asInstanceOf
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false))), containsNull = false)

  /** (value DESC, id ASC): true when (v1, id1) outranks (v2, id2) */
  private def beats(v1: Double, id1: Long, v2: Double, id2: Long): Boolean =
    v1 > v2 || (v1 == v2 && id1 < id2)

  override def createAggregationBuffer(): java.util.ArrayList[(Double, Long)] =
    new java.util.ArrayList[(Double, Long)](k)

  override def update(buf: java.util.ArrayList[(Double, Long)],
      input: InternalRow): java.util.ArrayList[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      insert(buf, v.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  /** ordered insert into the k-bounded buffer; drops the entry (or the
    * displaced worst) when the buffer is full and the candidate loses */
  private def insert(buf: java.util.ArrayList[(Double, Long)],
      v: Double, id: Long): Unit = {
    if (buf.size == k) {
      val worst = buf.get(k - 1)
      if (!beats(v, id, worst._1, worst._2)) return
      buf.remove(k - 1)
    }
    var i = 0
    while (i < buf.size && beats(buf.get(i)._1, buf.get(i)._2, v, id)) i += 1
    buf.add(i, (v, id))
  }

  override def merge(a: java.util.ArrayList[(Double, Long)],
      b: java.util.ArrayList[(Double, Long)]): java.util.ArrayList[(Double, Long)] = {
    var i = 0
    while (i < b.size) { insert(a, b.get(i)._1, b.get(i)._2); i += 1 }
    a
  }

  override def eval(buf: java.util.ArrayList[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      val (v, id) = buf.get(i)
      out(i) = InternalRow((i + 1).toLong, id, v)
      i += 1
    }
    new GenericArrayData(out): ArrayData
  }

  override def serialize(buf: java.util.ArrayList[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      val (v, id) = buf.get(i)
      bb.putDouble(v); bb.putLong(id); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.ArrayList[(Double, Long)](math.max(n, k))
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "graft_top_k"
}

object TopKAgg {
  /** the bounded rank aggregate as a Column, for DataFrame use */
  def topK(value: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(value), Bridge.expression(id), k)
        .toAggregateExpression())

  /** SQL-surface builder: `graft_top_k(value, id, k)`, k a foldable
    * positive integral literal — validated HERE so a bad k is an
    * analysis-time error naming the problem, not a runtime cast failure */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "graft_top_k(value, id, k)")
    val kExpr = exprs(2)
    require(kExpr.foldable,
      s"graft_top_k: k must be a literal, got non-foldable ${kExpr.sql}")
    val kVal = kExpr.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val v = kExpr.eval()
        require(v != null, "graft_top_k: k must not be null")
        v.asInstanceOf[Number].longValue
      case dt => throw new IllegalArgumentException(
        s"graft_top_k: k must be an integral literal, got ${kExpr.sql} " +
          s"of type ${dt.simpleString}")
    }
    require(kVal > 0 && kVal <= Int.MaxValue,
      s"graft_top_k: k must be a positive int, got $kVal")
    TopKAgg(exprs(0), exprs(1), kVal.toInt)
  }
}
