package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

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

  /** resolve `graft.ns.tbl[$meta]` to the graft scan plan; `cond` is the
    * unresolved WHERE tree when one sits directly above the relation */
  private def substitute(u: UnresolvedRelation,
      cond: Option[Expression]): Option[LogicalPlan] = {
    val Seq(_, ns, ident) = u.multipartIdentifier
    val wh = spark.conf.getOption("spark.graft.warehouse").getOrElse(
      throw new IllegalStateException(
        "set spark.graft.warehouse to resolve graft.<ns>.<table> relations"))
    val cat = new GraftCatalog(spark, wh)
    // `tbl$files` / `tbl$snapshots` / `tbl$refs` are metadata tables
    val (tbl, metaKind) = ident.indexOf('$') match {
      case -1 => (ident, None)
      case i => (ident.substring(0, i), Some(ident.substring(i + 1)))
    }
    if (!cat.tableExists(ns, tbl)) None // leave for the analyzer to report
    else {
      val t: GraftTable = cat.loadTable(ns, tbl)
      val df = metaKind match {
        case Some(k) => t.metaTable(k)
        case None =>
          val preds = cond.map(Pruning.extractExpr).getOrElse(Nil)
          if (preds.isEmpty) t.scan() else t.scanPruned(preds)
      }
      Some(df.queryExecution.analyzed)
    }
  }

  // top-down so Filter-over-relation matches before the bare relation does
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case f @ Filter(cond, u: UnresolvedRelation) if isGraft(u) =>
      substitute(u, Some(cond)).map(rel => f.copy(child = rel)).getOrElse(f)
    case f @ Filter(cond, a @ SubqueryAlias(_, u: UnresolvedRelation)) if isGraft(u) =>
      substitute(u, Some(cond))
        .map(rel => f.copy(child = a.copy(child = rel))).getOrElse(f)
    case u: UnresolvedRelation if isGraft(u) =>
      substitute(u, None).getOrElse(u)
  }
}
