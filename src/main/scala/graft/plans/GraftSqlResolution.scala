package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

import graft.table.{GraftCatalog, GraftTable, Pruning}

/** SQL-surface resolution for graft tables: an analyzer rule that resolves
  * `graft.<namespace>.<table>` relations into the graft read path, so
  * plain Spark SQL works against the table format:
  *
  * {{{
  *   spark.conf.set("spark.graft.warehouse", "/warehouse")
  *   spark.sql("SELECT count(*) FROM graft.db.orders WHERE o_custkey = 7")
  * }}}
  *
  * The substituted subtree is the SAME plan `GraftTable.scan()` builds —
  * schema-evolution alignment, MoR delete anti-joins, everything — and
  * because it lands during analysis, Catalyst then pushes the query's
  * filters/projections into the underlying parquet scans exactly as it
  * does for the DataFrame API.
  *
  * Manifest pruning: when the relation sits directly under a Filter (the
  * common `SELECT ... WHERE ...` shape), the rule extracts the simple
  * conjuncts from the still-unresolved WHERE tree and prunes the file list
  * BEFORE the scan is constructed — the Filter node itself stays in the
  * plan, so pruning only skips task launch, never changes results. At
  * 100 TB this is the difference between listing 100k files and the
  * handful whose partition/stats ranges can match.
  */
class GraftSqlResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  private def isGraft(u: UnresolvedRelation): Boolean =
    u.multipartIdentifier.length == 3 &&
      u.multipartIdentifier.head.equalsIgnoreCase("graft")

  /** resolve `graft.ns.tbl[$meta][@branch]` to the graft scan plan.
    * `cond` is the unresolved WHERE tree when one sits directly above the
    * relation; `snapshotId`/`asOfMs` carry SQL time travel
    * (`VERSION AS OF` / `TIMESTAMP AS OF`). */
  private def substitute(u: UnresolvedRelation, cond: Option[Expression],
      snapshotId: Option[Long] = None,
      asOfMs: Option[Long] = None): Option[LogicalPlan] = {
    val Seq(_, ns, ident) = u.multipartIdentifier
    val wh = spark.conf.getOption("spark.graft.warehouse").getOrElse(
      throw new IllegalStateException(
        "set spark.graft.warehouse to resolve graft.<ns>.<table> relations"))
    val cat = new GraftCatalog(spark, wh)
    // `tbl$files` / `tbl$snapshots` / `tbl$refs` are metadata tables;
    // `tbl@branch` reads a named ref (branch or tag)
    val (ident2, ref) = ident.indexOf('@') match {
      case -1 => (ident, None)
      case i => (ident.substring(0, i), Some(ident.substring(i + 1)))
    }
    val (tbl, metaKind) = ident2.indexOf('$') match {
      case -1 => (ident2, None)
      case i => (ident2.substring(0, i), Some(ident2.substring(i + 1)))
    }
    if (!cat.tableExists(ns, tbl)) None // leave for the analyzer to report
    else {
      val t: GraftTable = cat.loadTable(ns, tbl)
      val df = metaKind match {
        case Some(k) => t.metaTable(k, ref.getOrElse("main"))
        case None =>
          val preds = cond.map(Pruning.extractExpr).getOrElse(Nil)
          if (preds.nonEmpty && snapshotId.isEmpty && asOfMs.isEmpty && ref.isEmpty)
            t.scanPruned(preds)
          else t.scan(snapshotId = snapshotId, asOfTimestampMs = asOfMs, ref = ref)
      }
      Some(df.queryExecution.analyzed)
    }
  }

  /** SQL time travel (`FOR VERSION AS OF n` / `FOR TIMESTAMP AS OF ts`):
    * version is the snapshot id; the timestamp expression evaluates in the
    * session timezone to epoch millis */
  private def timeTravel(u: UnresolvedRelation, ts: Option[Expression],
      version: Option[String]): Option[LogicalPlan] = {
    val asOfMs = ts.map { e =>
      val v = Cast(e, TimestampType,
        Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
      // Cast returns null (not an error) for unparseable input with ANSI
      // off — null would unbox to epoch 0 and silently read 1970 state
      if (v == null) throw new IllegalArgumentException(
        s"invalid TIMESTAMP AS OF expression: ${e.sql}")
      Math.floorDiv(v.asInstanceOf[Long], 1000L)
    }
    substitute(u, None, snapshotId = version.map(_.toLong), asOfMs = asOfMs)
  }

  // top-down so Filter-over-relation matches before the bare relation does
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version) if isGraft(u) =>
      timeTravel(u, ts, version).getOrElse(tt)
    case f @ Filter(cond, u: UnresolvedRelation) if isGraft(u) =>
      substitute(u, Some(cond)).map(rel => f.copy(child = rel)).getOrElse(f)
    case f @ Filter(cond, a @ SubqueryAlias(_, u: UnresolvedRelation)) if isGraft(u) =>
      substitute(u, Some(cond))
        .map(rel => f.copy(child = a.copy(child = rel))).getOrElse(f)
    case u: UnresolvedRelation if isGraft(u) =>
      substitute(u, None).getOrElse(u)
  }
}
