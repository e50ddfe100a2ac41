package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Linear sort clustering (`write.sort`) gives disjoint per-file ranges on
  * the LEADING column only — a predicate on the second column still scans
  * every file. Interleaving the bits of several columns' scaled values and
  * range-partitioning on that z-value instead keeps every clustered file
  * covering a small hyper-rectangle, so per-file min/max stats prune on
  * ANY clustered dimension. At 100 TB this is what makes point/range
  * queries on two or three independent dimensions each touch O(matching)
  * files rather than all of them.
  *
  * Built entirely from codegen'd built-ins: scale each column into a
  * 16-bit integer by global min/max, then OR together shifted bit picks —
  * a flat expression tree Catalyst fuses into one projection.
  */
object ZOrder {

  /** bits per dimension; 16 bits x up to 3 dims fits the 63 value bits of
    * a signed long (4 dims would need the sign bit) */
  val Bits = 16

  /** scale a column into [0, 2^Bits) by global [min, max]; nulls sort first */
  def scaled(c: Column, mn: Double, mx: Double): Column = {
    val range = if (mx > mn) mx - mn else 1.0
    val top = (1L << Bits) - 1L
    val s = ((c.cast("double") - lit(mn)) / lit(range)) * lit(top.toDouble)
    when(c.isNull, lit(0L))
      .otherwise(least(greatest(floor(s).cast("long"), lit(0L)), lit(top)))
  }

  /** bit-interleave k scaled values: bit b of dim j lands at position b*k+j */
  def interleave(cols: Seq[Column]): Column = {
    val k = cols.length
    require(k >= 1 && k * Bits <= 63, s"z-order supports 1..3 dims at $Bits bits")
    val terms = for {
      b <- 0 until Bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** z-value column for `cols` of `df`, scaling by the data's min/max
    * (one small agg job — the price of admission for a clustering write) */
  def zColumn(df: DataFrame, cols: Seq[Column]): Column = {
    val aggs = cols.flatMap(c =>
      Seq(min(c).cast("double"), max(c).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val scaledCols = cols.zipWithIndex.map { case (c, i) =>
      val mn = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val mx = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      scaled(c, mn, mx)
    }
    interleave(scaledCols)
  }
}
