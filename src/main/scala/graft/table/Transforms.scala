package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.functions._

/** Hidden-partitioning transforms (Iceberg semantics, Spark-native impl).
  *
  * Each transform exists twice, by design:
  *  - [[column]]: a Catalyst Column expression used at WRITE time to derive
  *    the hidden partition value from the data (codegen'd, distributed);
  *  - [[evalLiteral]]: a driver-side evaluation on a filter literal used at
  *    PLAN time for manifest pruning. Both sides must agree exactly —
  *    bucket uses Spark's own Murmur3Hash expression on the driver so the
  *    hash function is literally the same code.
  *
  * Time transforms produce epoch ordinals (years/months/days/hours since
  * 1970-01-01 UTC), which are monotonic in the source value — that is what
  * makes range predicates on the source prunable on the partition value.
  */
object Transforms {

  /** write-side: partition value as a Column over the physical data cols;
    * `dtypes` are the source fields' DDL types (needed by truncate) */
  def column(t: PartFieldMeta, srcs: Seq[Column], dtypes: Seq[String]): Column = t.transform match {
    case "identity" => srcs.head
    // TIMESTAMP (instant) sources derive the calendar ordinal from
    // unix_micros in fixed UTC (the epoch-day → date arithmetic is
    // timezone-free), never from year()/month()/cast-to-date — those read
    // the SESSION timezone, and a non-UTC session would disagree with
    // evalLiteral's UTC pruning and silently prune files that contain
    // matching rows. TIMESTAMP_NTZ and DATE sources keep the plain
    // calendar functions below: those are wall-clock/timezone-free
    // already and agree with evalLiteral's wall-clock-as-UTC evaluation
    // (an ntz column must NOT take this branch — cast(ntz as timestamp)
    // is itself session-timezone-dependent).
    case "year" | "month" | "day" if dtypes.head == "timestamp" =>
      val us = unix_micros(srcs.head)
      val epochDay = floor(us / lit(86400000000L)).cast("int")
      lazy val utcDate = date_add(lit(java.sql.Date.valueOf("1970-01-01")), epochDay)
      t.transform match {
        case "day" => epochDay.cast("long")
        case "year" => year(utcDate).cast("long") - 1970L
        case "month" =>
          (year(utcDate).cast("long") - 1970L) * 12L + month(utcDate).cast("long") - 1L
      }
    case "year" => year(srcs.head).cast("long") - 1970L
    case "month" => (year(srcs.head).cast("long") - 1970L) * 12L + month(srcs.head).cast("long") - 1L
    case "day" => datediff(srcs.head.cast("date"), lit("1970-01-01").cast("date")).cast("long")
    case "hour" => floor(unix_micros(srcs.head) / 3600000000L)
    case "bucket" =>
      // multi-arg (v3): hash all source columns together, Murmur3 seed 42
      pmod(hash(srcs: _*), lit(t.param.get)).cast("long")
    case "truncate" =>
      val w = t.param.get
      // numeric: floor-to-width; string: prefix
      if (dtypes.head.startsWith("string")) substring(srcs.head, 1, w)
      else srcs.head.cast("long") - pmod(srcs.head.cast("long"), lit(w.toLong))
    case other => throw new IllegalArgumentException(s"unknown transform $other")
  }

  /** Coerce a parsed filter literal (Catalyst internal value) to the source
    * FIELD's type before transform evaluation — `o_custkey = 10` parses as
    * Int but the column is bigint, and Murmur3 hashes int and long
    * DIFFERENTLY, so bucket pruning without coercion would silently drop
    * every matching file. Timestamps stay as Long micros (Murmur3 hashes
    * TimestampType by its underlying long). */
  def coerce(v: Any, dtype: String): Option[Any] = {
    val base = dtype.takeWhile(_ != '(')
    (base, v) match {
      case ("bigint", i: Int) => Some(i.toLong)
      case ("bigint", l: Long) => Some(l)
      case ("int", i: Int) => Some(i)
      case ("int", l: Long) if l.isValidInt => Some(l.toInt)
      case ("smallint", i: Int) if i.isValidShort => Some(i.toShort)
      case ("double", i: Int) => Some(i.toDouble)
      case ("double", l: Long) => Some(l.toDouble)
      case ("double", d: Double) => Some(d)
      case ("float", d: Double) => Some(d.toFloat)
      case ("float", i: Int) => Some(i.toFloat)
      case ("string", u: org.apache.spark.unsafe.types.UTF8String) => Some(u.toString)
      case ("string", s: String) => Some(s)
      case ("timestamp" | "timestamp_ntz", l: Long) => Some(l)
      case ("date", i: Int) => Some(i)
      case _ => None
    }
  }

  /** driver-side: apply the transform to a literal filter value.
    * `v` is the internal representation: Long micros for timestamps,
    * Int days for dates, String, or numeric. Returns the partition value
    * in the same encoding the write side produces. */
  def evalLiteral(t: PartFieldMeta, vs: Seq[Any]): Option[String] = t.transform match {
    case "identity" => Some(vs.head.toString)
    case "year" | "month" | "day" | "hour" =>
      val micros = vs.head match {
        case l: Long => l
        case i: Int => i.toLong * 86400000000L // DateType days -> micros
        case _ => return None
      }
      val odt = java.time.Instant.EPOCH.plus(java.time.Duration.ofNanos(micros * 1000))
        .atOffset(java.time.ZoneOffset.UTC)
      Some(t.transform match {
        case "year" => (odt.getYear - 1970).toString
        case "month" => ((odt.getYear - 1970) * 12 + odt.getMonthValue - 1).toString
        case "day" => Math.floorDiv(micros, 86400000000L).toString
        case "hour" => Math.floorDiv(micros, 3600000000L).toString
      })
    case "bucket" =>
      val h = Murmur3Hash(vs.map(v => Literal(v)), 42).eval(null).asInstanceOf[Int]
      Some(Math.floorMod(h.toLong, t.param.get.toLong).toString)
    case "truncate" =>
      val w = t.param.get
      vs.head match {
        case s: String => Some(s.take(w))
        case l: Long => Some((l - Math.floorMod(l, w.toLong)).toString)
        case i: Int => Some((i.toLong - Math.floorMod(i.toLong, w.toLong)).toString)
        case _ => None
      }
    case _ => None
  }

  /** Monotonic transforms preserve source ordering, so source range
    * predicates translate to partition-value range predicates. */
  def monotonic(t: String): Boolean =
    t == "identity" || t == "year" || t == "month" || t == "day" ||
      t == "hour" || t == "truncate"
}
