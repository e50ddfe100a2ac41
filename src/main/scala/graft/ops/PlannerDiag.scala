package graft.ops

import org.apache.spark.sql.SparkSession

import graft.table._

/** Round-16 live-Spark validation of the segment-pruned scan planner
  * (VERDICT r15 item 4): ManifestDiag times the planning PRIMITIVES with
  * no Spark session; this closes the gap to a real query on a real
  * many-file graft table.
  *
  * Layout: `build` creates a table with `segs` append commits, each
  * writing `filesPerSeg` one-row files into DISJOINT identity partitions
  * (the daily-append shape: segment i covers k in [i*f, (i+1)*f) — every
  * segment carries complete SegStats, so a point query can prove all
  * but one segment disjoint). `measure` runs in a FRESH JVM (cold
  * manifest cache) and times DataFrame construction — scan() does all
  * driver-side planning eagerly (manifest reads, pruning, file listing):
  *   - point: scan(filter = k = <mid>) — the segment-pruned path
  *   - full:  scan() — the pre-round-15 read-everything shape
  * cold = first touch, warm = median of 5 repeats.
  *
  * Usage (via scripts/benchjvm.sh, GRAFT_MAIN=graft.ops.PlannerDiag):
  *   build <loc> [segs] [filesPerSeg]
  *   measure <loc>
  */
object PlannerDiag {

  private def timeMs[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e6)
  }

  private def session(): SparkSession = SparkSession.builder()
    .appName("graft-planner-diag").master("local[32]")
    .config("spark.sql.shuffle.partitions", 32)
    .config("spark.ui.enabled", false)
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val spark = session()
    import org.apache.spark.sql.functions._
    args.toList match {
      case "build" :: loc :: rest =>
        val segs = rest.headOption.map(_.toInt).getOrElse(100)
        val filesPerSeg = rest.drop(1).headOption.map(_.toInt).getOrElse(100)
        val t = GraftTable.create(spark, loc, "k bigint, v double", Seq("k"))
        (0 until segs).foreach { s =>
          val df = spark.range(s.toLong * filesPerSeg, (s + 1).toLong * filesPerSeg)
            .select(col("id").as("k"), (col("id") % 7).cast("double").as("v"))
          t.append(df)
          if ((s + 1) % 20 == 0) println(s"[plannerdiag] ${s + 1}/$segs segments")
        }
        val head = t.meta.head("main").get
        println(s"[plannerdiag] built $loc: ${head.manifests.size} segments, " +
          s"${Meta.readEntries(loc, head).size} files, " +
          s"${head.manifestStats.count(_._2.complete)} complete-stats segments")
      case "measure" :: loc :: _ =>
        // point FIRST: its pruned planning must not ride a cache warmed
        // by the full read, so the mid key comes from scalar metadata
        // (segment count x files per segment), never from readEntries
        val t = GraftTable.load(spark, loc)
        val head = t.meta.head("main").get
        val midK = head.manifests.size.toLong * 100 / 2
        Meta.recordReads = true
        Meta.readLog.clear()
        val (dfP, pointCold) = timeMs(t.scan(filter = Some(s"k = $midK")))
        val segsOpenedPoint = Meta.readLog.size
        val pointWarm = (1 to 5)
          .map(_ => timeMs(t.scan(filter = Some(s"k = $midK")))._2).sorted.apply(2)
        Meta.readLog.clear()
        val (dfF, fullCold) = timeMs(t.scan())
        val segsOpenedFull = Meta.readLog.size
        val fullWarm = (1 to 5).map(_ => timeMs(t.scan())._2).sorted.apply(2)
        Meta.recordReads = false
        println(f"""{"metric":"planner_diag","segments":${head.manifests.size},""" +
          f""""point_cold_ms":$pointCold%.1f,"point_warm_ms":$pointWarm%.1f,""" +
          f""""point_segments_opened":$segsOpenedPoint,""" +
          f""""point_files":${dfP.inputFiles.length},""" +
          f""""full_cold_ms":$fullCold%.1f,"full_warm_ms":$fullWarm%.1f,""" +
          f""""full_segments_opened":$segsOpenedFull,""" +
          f""""full_files":${dfF.inputFiles.length}}""")
      // Round-16 delta-scoped changes() end-to-end cost: on the same
      // many-file table, commit a ONE-file CoW update and a ONE-key
      // equality delete, then time the scoped changelog vs the full
      // state diff for each window. The diag that turns the read-log
      // spec ("plans O(touched) files") into wall-clock evidence.
      case "cdc" :: loc :: _ =>
        import spark.implicits._
        val t = GraftTable.load(spark, loc)
        val head0 = t.meta.head("main").get
        val files0 = Meta.readEntries(loc, head0).count(_.fileType == "data")
        val midK = head0.manifests.size.toLong * 100 / 2
        t.update(s"k = $midK", Map("v" -> "v + 1.0"))
        val s0 = head0
        val (nS, msS) = timeMs(t.changes(s0.snapshotId).count())
        val (bS, aS) = t.lastChangesScope.map { case (b, a) => (b.size, a.size) }
          .getOrElse((-1, -1))
        val (nD, msD) = timeMs(t.changesStateDiff(s0.snapshotId).count())
        val s1 = t.meta.head("main").get
        t.deleteByKeys(Seq(midK + 1).toDF("k"))
        val (nSe, msSe) = timeMs(t.changes(s1.snapshotId).count())
        val (bSe, aSe) = t.lastChangesScope.map { case (b, a) => (b.size, a.size) }
          .getOrElse((-1, -1))
        val (nDe, msDe) = timeMs(t.changesStateDiff(s1.snapshotId).count())
        println(f"""{"metric":"cdc_diag","table_files":$files0,""" +
          f""""upd_scoped_ms":$msS%.1f,"upd_scope_files":[$bS,$aS],"upd_rows":$nS,""" +
          f""""upd_statediff_ms":$msD%.1f,"upd_statediff_rows":$nD,""" +
          f""""eq_scoped_ms":$msSe%.1f,"eq_scope_files":[$bSe,$aSe],"eq_rows":$nSe,""" +
          f""""eq_statediff_ms":$msDe%.1f,"eq_statediff_rows":$nDe}""")
      case other =>
        System.err.println(s"usage: build|measure|cdc <loc> — got $other")
        sys.exit(2)
    }
    spark.stop()
  }
}
