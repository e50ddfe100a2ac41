package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.Bridge

/** The (c) rung of the operator ladder: a WHOLE custom operator — logical
  * node + planner strategy + physical exec — for the as-of join, the one
  * operator family Spark genuinely lacks. The composed form
  * ([[graft.ops.AsOfJoin.asOf]]) unions both sides and runs a running-last
  * window: correct, but it SORTS THE UNION (left rows pay the right side's
  * sort and vice versa) and materializes a struct per row. This exec asks
  * Catalyst for hash co-partitioning + per-side (key, time) sort — the
  * same machinery SortMergeJoin uses — and then streams BOTH sorted
  * iterators through one two-pointer merge per partition: no union, no
  * struct boxing, no window state, early-out per key.
  *
  * Scale: identical exchange count to the window form (one hash shuffle
  * per side), but each side sorts only itself, and AQE still re-plans the
  * exchanges (the exec only states requirements). Null keys/times on the
  * left pass through with a null as-of value; null right times never
  * match (SQL comparison semantics).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    rightValue: Expression,
    // a constructor FIELD, not a lazy val: output attributes must keep
    // their exprId across copy()/transform or every parent reference
    // dangles (the plan prints with "!" markers and resolution fails)
    valueAttr: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ valueAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(valueAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.leftTime, p.rightKey, p.rightTime,
        p.rightValue, p.valueAttr) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    rightValue: Expression, valueAttr: AttributeReference)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ valueAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(valueAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val rValB = BindReferences.bindReference(rightValue, right.output)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val joined = new JoinedRow
      val valRow = new GenericInternalRow(1)
      val outProj = UnsafeProjection.create(output, left.output :+ valueAttr)
      // buffered right cursor
      var rRow: InternalRow = null
      var rKey = 0L
      var rTime = 0L
      var rHas = false
      def advanceRight(): Unit = {
        if (rIt.hasNext) {
          val r = rIt.next()
          val k = rKeyB.eval(r)
          val t = rTimeB.eval(r)
          if (k == null || t == null) advanceRight() // unmatched by SQL semantics
          else {
            rRow = r; rKey = k.asInstanceOf[Long]; rTime = t.asInstanceOf[Long]
            rHas = true
          }
        } else rHas = false
      }
      advanceRight()
      // last right value seen for lastKey
      var lastKey = 0L
      var lastHas = false
      var lastVal: Any = null
      lIt.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTimeB.eval(l)
        if (lk == null || lt == null) {
          valRow.update(0, null)
        } else {
          val lkL = lk.asInstanceOf[Long]
          val ltL = lt.asInstanceOf[Long]
          // consume right rows at or before (lk, lt)
          while (rHas && (rKey < lkL || (rKey == lkL && rTime <= ltL))) {
            lastKey = rKey
            lastHas = true
            lastVal = InternalRow.copyValue(rValB.eval(rRow))
            advanceRight()
          }
          valRow.update(0, if (lastHas && lastKey == lkL) lastVal else null)
        }
        outProj(joined(l, valRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNative {
  /** install the strategy once per session (idempotent) */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** DataFrame-facing API: left columns + `valueName` = as-of value of
    * `rightValue`. Keys and times must be BIGINT-comparable: bigint and
    * timestamp pass through (Long-backed internally), narrower integrals
    * are cast up; anything else is an ANALYSIS-time error here rather than
    * a ClassCastException deep inside the exec's two-pointer merge. */
  private def asLong(e: Expression, what: String): Expression = {
    import org.apache.spark.sql.types._
    e.dataType match {
      case LongType | TimestampType | TimestampNTZType => e
      case ByteType | ShortType | IntegerType =>
        org.apache.spark.sql.catalyst.expressions.Cast(e, LongType)
      case t => throw new IllegalArgumentException(
        s"asOf: $what is ${t.simpleString} ($e); keys/times must be " +
          "bigint/int/timestamp — cast explicitly first")
    }
  }

  def asOf(left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      rightValue: Column, valueName: String): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def res(plan: LogicalPlan, c: Column): Expression =
      Bridge.ofRows(spark, plan).select(c).queryExecution.analyzed
        .expressions.head match {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
        case e => e
      }
    Bridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      asLong(res(lPlan, leftKey), "left key"),
      asLong(res(lPlan, leftTime), "left time"),
      asLong(res(rPlan, rightKey), "right key"),
      asLong(res(rPlan, rightTime), "right time"),
      res(rPlan, rightValue),
      AttributeReference(valueName,
        res(rPlan, rightValue).dataType, nullable = true)()))
  }
}
