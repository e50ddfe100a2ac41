package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 phase profile of q_cdc_apply (the suite's slowest
  * engine-bound key, floor 3.49 s): replays GraftOps.cdcApply step by
  * step with wall timers so the optimization round can see WHERE the
  * seconds live — source build, replica seed, source row-ops, the
  * changes() window, and the three replica applications — instead of
  * guessing from the end-to-end number.
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.ops.CdcDiag [sfDir] */
object CdcDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.SessionConfs.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[cdcdiag] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm the session the same way Bench does
    spark.range(1000000L).selectExpr("sum(id)").collect()
    GraftOps.cdcApply(spark, dir).count() // warm codegen/readers once
    println("[cdcdiag] --- timed replay ---")
    import graft.table.{GraftTable, WriteMode}
    val ddl = "o_orderkey bigint, o_custkey bigint, o_orderstatus string, " +
      "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    val o = timed("load orders")(graft.Tables(spark, dir, "orders"))
    val src = timed("create src")(GraftTable.create(spark,
      graft.Scratch.dir("cdcdiag-src").toString, ddl))
    val s1 = timed("src append even")(src.append(o.filter(col("o_orderkey") % 2 === 0)))
    val rep = timed("create rep")(GraftTable.create(spark,
      graft.Scratch.dir("cdcdiag-rep").toString, ddl))
    timed("rep seed append")(rep.append(src.scan(snapshotId = Some(s1.snapshotId))))
    timed("src append odd")(src.append(o.filter(col("o_orderkey") % 2 === 1)))
    timed("src update mor")(src.update("o_orderkey % 7 = 0",
      Map("o_totalprice" -> "o_totalprice + 5.0"), WriteMode.MergeOnRead))
    timed("src delete mor")(src.delete("o_orderkey % 10 = 0", WriteMode.MergeOnRead))
    val ch = timed("changes + checkpoint")(
      src.changes(s1.snapshotId).localCheckpoint())
    val inserts = ch.filter(col("_change_type") === "insert")
      .drop("_change_type", "_row_id", "_last_updated_sequence_number")
    timed("rep append inserts")(rep.append(inserts))
    val updates = ch.filter(col("_change_type") === "update_after")
      .drop("_change_type", "_row_id", "_last_updated_sequence_number")
    timed("rep merge updates")(rep.merge(updates, on = "t.o_orderkey = s.o_orderkey",
      matchedSet = Map("o_totalprice" -> "s.o_totalprice")))
    val deletes = ch.filter(col("_change_type") === "delete")
      .select(col("o_orderkey"))
    timed("rep deleteByKeys")(rep.deleteByKeys(deletes))
    timed("final scan agg")(rep.scan()
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_keys"))
      .count())
    spark.stop()
  }
}
