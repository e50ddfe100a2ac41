package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.Bridge

import graft.table.{Catalog, GraftTable, WriteMode}

/** SQL DML over graft tables, the surface the reference drives everything
  * through (`tests/iceberg_feature_tests.py:520-780` issues MERGE/UPDATE/
  * DELETE/INSERT as Spark SQL strings): each statement parses to Spark's
  * own DML logical node, [[GraftSqlResolution]] rewrites it to one of
  * these `RunnableCommand`s, and execution calls the same [[GraftTable]]
  * commit paths the DataFrame API uses — one atomic snapshot per
  * statement, copy-on-write or merge-on-read per session config.
  *
  * Source subqueries (INSERT ... SELECT, MERGE ... USING) are stored as
  * UNRESOLVED logical plans and analyzed when the command runs, so they
  * may reference temp views, other graft tables, parquet paths — anything
  * the session can resolve.
  */
private[plans] object GraftDml {

  def load(spark: SparkSession, ns: String, tbl: String): GraftTable =
    Catalog(spark).loadTable(ns, tbl)

  /** row-level write mode for SQL statements: `spark.graft.write.mode` =
    * copy-on-write (default) | merge-on-read | deletion-vector */
  def writeMode(spark: SparkSession): WriteMode.Value =
    spark.conf.getOption("spark.graft.write.mode").map(_.toLowerCase).collect {
      case "merge-on-read" | "mor" => WriteMode.MergeOnRead
      case "deletion-vector" | "dv" => WriteMode.DeletionVector
    }.getOrElse(WriteMode.CopyOnWrite)

  /** align an arbitrary query result to the table's logical schema:
    * positional when `userCols` is empty (classic INSERT), by target
    * column list otherwise; unlisted columns become NULL. `byName`
    * (INSERT ... BY NAME) matches on output names instead. */
  def align(t: GraftTable, df: DataFrame, userCols: Seq[String],
      byName: Boolean): DataFrame = {
    val target = t.scan().schema.fields
    val outCols =
      if (byName) {
        val have = df.columns.map(c => c.toLowerCase -> c).toMap
        target.map(f => have.get(f.name.toLowerCase)
          .map(c => col(c).cast(f.dataType).as(f.name))
          .getOrElse(lit(null).cast(f.dataType).as(f.name)))
      } else if (userCols.nonEmpty) {
        require(userCols.length == df.columns.length,
          s"INSERT column list has ${userCols.length} columns but query " +
            s"produces ${df.columns.length}")
        val provided = userCols.map(_.toLowerCase).zip(df.columns).toMap
        target.map(f => provided.get(f.name.toLowerCase)
          .map(c => col(c).cast(f.dataType).as(f.name))
          .getOrElse(lit(null).cast(f.dataType).as(f.name)))
      } else {
        require(df.columns.length == target.length,
          s"INSERT query produces ${df.columns.length} columns, table has " +
            s"${target.length}")
        target.zip(df.columns).map { case (f, c) =>
          col(c).cast(f.dataType).as(f.name)
        }
      }
    df.select(outCols.toSeq: _*)
  }
}

/** `INSERT INTO | OVERWRITE graft.ns.tbl [(cols)] [BY NAME] <query>` */
case class GraftInsertCommand(ns: String, tbl: String, query: LogicalPlan,
    userCols: Seq[String], overwrite: Boolean, byName: Boolean,
    branch: String = "main")
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftDml.load(spark, ns, tbl)
    val aligned = GraftDml.align(t, Bridge.ofRows(spark, query), userCols, byName)
    // Spark's own INSERT OVERWRITE switch: in dynamic mode only the
    // partitions present in the incoming data are replaced (the
    // idempotent-backfill semantics); static mode replaces the table
    val dynamic = spark.conf
      .getOption("spark.sql.sources.partitionOverwriteMode")
      .exists(_.equalsIgnoreCase("dynamic"))
    if (overwrite && dynamic && t.meta.currentSpec.fields.nonEmpty)
      t.overwritePartitions(aligned, branch)
    else if (overwrite) t.overwrite(aligned, branch)
    else t.append(aligned, branch)
    Nil
  }
}

/** `DELETE FROM graft.ns.tbl WHERE <cond>` */
case class GraftDeleteCommand(ns: String, tbl: String, condSql: String,
    branch: String = "main")
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftDml.load(spark, ns, tbl)
      .delete(condSql, GraftDml.writeMode(spark), branch)
    Nil
  }
}

/** `UPDATE graft.ns.tbl SET c = e, ... [WHERE <cond>]` */
case class GraftUpdateCommand(ns: String, tbl: String,
    set: Seq[(String, String)], condSql: String, branch: String = "main")
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftDml.load(spark, ns, tbl)
      .update(condSql, set.toMap, GraftDml.writeMode(spark), branch)
    Nil
  }
}

/** `MERGE INTO graft.ns.tbl t USING <source> s ON <cond>
  *    WHEN MATCHED THEN UPDATE SET ...|* / DELETE
  *    WHEN NOT MATCHED THEN INSERT ...|*`
  *
  * Expressions arrive requalified to the `t`/`s` aliases
  * [[GraftTable.merge]] binds; `*` actions expand against the target
  * schema at run time (source columns must carry the target names). */
case class GraftMergeCommand(ns: String, tbl: String, source: LogicalPlan,
    onSql: String, matchedSet: Seq[(String, String)], matchedStar: Boolean,
    matchedDelete: Boolean, insertSet: Option[Seq[(String, String)]],
    insertStar: Boolean, branch: String = "main")
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftDml.load(spark, ns, tbl)
    val src = Bridge.ofRows(spark, source)
    def star = t.scan().schema.fieldNames.map(f => f -> s"s.`$f`").toSeq
    val mset = if (matchedStar) star else matchedSet
    val ins = if (insertStar) Some(star) else insertSet
    t.merge(src, onSql, mset.toMap, matchedDelete, ins.map(_.toMap), branch)
    Nil
  }
}
