package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.table.GraftCatalog

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
  * does for the DataFrame API. (Driver-side manifest pruning needs the
  * filter at scan construction, so SQL reads prune by partition/stats
  * only when the filter is re-stated via `scan(filter=...)`; file-level
  * parquet pushdown still applies either way.) */
class GraftSqlResolution(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation if u.multipartIdentifier.length == 3 &&
        u.multipartIdentifier.head.equalsIgnoreCase("graft") =>
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
      if (!cat.tableExists(ns, tbl)) u // leave for the analyzer to report
      else {
        val t = cat.loadTable(ns, tbl)
        metaKind.map(k => t.metaTable(k)).getOrElse(t.scan())
          .queryExecution.analyzed
      }
  }
}
