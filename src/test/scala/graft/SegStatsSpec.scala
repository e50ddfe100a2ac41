package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.table._

/** Round-14 per-segment partition summaries (VERDICT r13 item 5): a
  * partition-scoped commit must never OPEN a manifest segment proven
  * disjoint from its touched partitions — the 1000x-files headroom item
  * past the documented ~30 MB/100 TB manifest budget (Meta.scala layout
  * note). Pins the pure summary/skip rules, the end-to-end read-log
  * proof on a real overwritePartitions, overlay conservatism, and
  * additive back-compat (stats-less snapshots read exactly as before). */
class SegStatsSpec extends SparkSpec {

  private def loc(): String =
    Files.createTempDirectory("graft-segstats").toString

  private def part(d: String) = Map("ts_day" -> d)

  private def dataEntry(p: Map[String, String], path: String = "d.parquet") =
    FileMeta(path, "data", 0, 0, p, 1, 1, 1, Map.empty)

  test("segStats: bounded all-data segments are complete; overlays or overflow are not") {
    val a = dataEntry(part("1"), "a"); val b = dataEntry(part("2"), "b")
    assert(Meta.segStats(Seq(a, b)) ==
      SegStats(List(part("1"), part("2")), complete = true))
    // duplicate tuples collapse
    assert(Meta.segStats(Seq(a, a)).partitions == List(part("1")))
    // any non-data entry (posdel/dv/eqdel applies by path or keys, not
    // partition) poisons completeness — the segment must always be read
    val dv = FileMeta("v.parquet", "dv", 0, 0, Map.empty, 1, 1, 2,
      Map.empty, appliesTo = Some("a"))
    assert(!Meta.segStats(Seq(a, dv)).complete)
    // tuple-count overflow -> incomplete (bounded metadata growth)
    val many = (0 to Meta.SegStatsCap).map(i => dataEntry(part(i.toString), s"f$i"))
    assert(!Meta.segStats(many).complete)
    // empty segment: nothing provable
    assert(!Meta.segStats(Nil).complete)
  }

  test("segmentSkippable: only an affirmative disjointness proof skips") {
    val touched = Set(part("5"))
    val disjoint = Some(SegStats(List(part("1"), part("2")), complete = true))
    val hit = Some(SegStats(List(part("2"), part("5")), complete = true))
    val incomplete = Some(SegStats(Nil, complete = false))
    assert(Meta.segmentSkippable(disjoint, touched))
    assert(!Meta.segmentSkippable(hit, touched))
    assert(!Meta.segmentSkippable(incomplete, touched))
    // absent stats (pre-round-14 snapshot): unprunable
    assert(!Meta.segmentSkippable(None, touched))
    // an unpartitioned entry ({} tuple) never equals a nonempty touched
    // tuple — exact map equality, the unpruned path's own rule
    assert(Meta.segmentSkippable(
      Some(SegStats(List(Map.empty[String, String]), complete = true)), touched))
  }

  test("overwritePartitions never opens segments disjoint from the touched day") {
    import spark.implicits._
    val t = GraftTable.create(spark, loc(),
      "id bigint, ts timestamp, v double", partitionBy = Seq("day(ts)"))
    // two appends -> two all-data segments with disjoint day tuples
    t.append(Seq((1L, "2024-01-01 10:00:00", 1.0), (2L, "2024-01-01 11:00:00", 2.0))
      .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp")))
    t.append(Seq((3L, "2024-02-01 10:00:00", 3.0))
      .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp")))
    val head1 = t.meta.head("main").get
    assert(head1.manifests.size == 2)
    assert(head1.manifests.forall(s =>
      head1.manifestStats.get(s).exists(_.complete)),
      s"append segments must carry complete stats: ${head1.manifestStats}")
    // patch ONLY February; January's segment must never be opened
    val patch = Seq((30L, "2024-02-01 12:00:00", 30.0))
      .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    Meta.readLog.clear()
    Meta.recordReads = true
    try t.overwritePartitions(patch)
    finally Meta.recordReads = false
    val reads = Meta.readLog.asScala.toSet
    val head2 = t.meta.head("main").get
    // the commit's own added segment carries the touched (February)
    // tuple in its stats — use it to identify the disjoint January
    // segment without re-deriving the partition encoding
    val newSegs = head2.manifests.filterNot(head1.manifests.contains)
    assert(newSegs.size == 1, s"expected one added segment: $newSegs")
    val touchedTuples = head2.manifestStats(newSegs.head).partitions.toSet
    val disjointSegs = head1.manifests.filter(s =>
      Meta.segmentSkippable(head1.manifestStats.get(s), touchedTuples))
    assert(disjointSegs.size == 1, s"expected one disjoint segment: $disjointSegs")
    assert(!disjointSegs.exists(reads),
      s"disjoint segment was opened during the commit: $reads")
    // and the commit is still CORRECT: January intact, February replaced
    val rows = t.scan().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, 1.0), (2L, 2.0), (30L, 30.0)), s"got $rows")
    // the skipped segment is still referenced, stats carried forward
    assert(disjointSegs.forall(head2.manifests.contains),
      "skipped segment must be carried by reference")
    assert(disjointSegs.forall(s => head2.manifestStats.contains(s)),
      "carried segment must keep its stats")
  }

  test("overlay segments are always opened and their deletes survive the swap") {
    import spark.implicits._
    val t = GraftTable.create(spark, loc(),
      "id bigint, ts timestamp, v double", partitionBy = Seq("day(ts)"))
    t.append(Seq((1L, "2024-01-01 10:00:00", 1.0), (2L, "2024-01-01 11:00:00", 2.0),
      (3L, "2024-02-01 10:00:00", 3.0))
      .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp")))
    // MoR delete on a January row -> posdel overlay entry
    t.delete("id = 2", WriteMode.MergeOnRead)
    val head = t.meta.head("main").get
    val overlaySegs = head.manifests.filter(s =>
      Meta.readManifest(t.location, s).exists(_.fileType != "data"))
    assert(overlaySegs.nonEmpty)
    assert(overlaySegs.forall(s => !head.manifestStats.get(s).exists(_.complete)),
      "a segment carrying an overlay must be incomplete (unprunable)")
    val patch = Seq((30L, "2024-02-01 12:00:00", 30.0))
      .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    Meta.readLog.clear()
    Meta.recordReads = true
    try t.overwritePartitions(patch)
    finally Meta.recordReads = false
    assert(overlaySegs.forall(Meta.readLog.asScala.toSet),
      "overlay segments must be read during a partition-scoped commit")
    // January's delete still applies; February swapped
    val rows = t.scan().orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L, 30L), s"got $rows")
  }

  test("back-compat: a snapshot without stats reads everything, exactly as before") {
    val snapNoStats = SnapshotMeta(1L, None, 1L, 0L, "append", 0,
      List("manifests/x.jsonl"))
    assert(snapNoStats.manifestStats.isEmpty)
    // readEntriesTouching degrades to readEntries: the one segment is read
    val l = loc()
    Files.createDirectories(java.nio.file.Paths.get(l, "manifests"))
    Meta.writeManifest(l, "x", Seq(dataEntry(part("1"))))
    val got = Meta.readEntriesTouching(l, snapNoStats, Set(part("99")))
    assert(got.size == 1)
  }

  test("coalesce shards by partition; pruning survives rewriteManifests") {
    import spark.implicits._
    // shard-entries=2 makes sharding observable on a tiny table; the
    // production default (4096-entry shards, ~48 max) is the same code
    val t = GraftTable.create(spark, loc(),
      "id bigint, ts timestamp, v double", partitionBy = Seq("day(ts)"),
      properties = Map("write.manifest.shard-entries" -> "2"))
    def add(id: Long, day: String): Unit =
      t.append(Seq((id, s"$day 10:0$id:00", id.toDouble))
        .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp")))
    add(1, "2024-01-01"); add(2, "2024-01-01")
    add(3, "2024-02-01"); add(4, "2024-03-01")
    t.delete("id = 4", WriteMode.MergeOnRead) // live overlay on March
    t.rewriteManifests()
    val head = t.meta.head("main").get
    // 4 data entries in 2-entry shards + the overlay segment
    assert(head.manifests.size == 3, s"got ${head.manifests}")
    val (complete, incomplete) = head.manifests.partition(s =>
      head.manifestStats.get(s).exists(_.complete))
    assert(complete.size == 2 && incomplete.size == 1,
      s"stats: ${head.manifestStats}")
    // sharding is partition-contiguous: January's two files share a shard
    val janShard = complete.filter(s =>
      head.manifestStats(s).partitions.size == 1)
    assert(janShard.size == 1, s"expected one single-tuple (Jan) shard: " +
      s"${head.manifestStats}")
    // a January-scoped overwrite must read the Jan shard + the overlay
    // segment, never the Feb/Mar data shard — pruning ALIVE post-rewrite
    val patch = Seq((10L, "2024-01-01 12:00:00", 10.0))
      .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    Meta.readLog.clear()
    Meta.recordReads = true
    try t.overwritePartitions(patch)
    finally Meta.recordReads = false
    val reads = Meta.readLog.asScala.toSet
    val febMarShard = (complete.toSet - janShard.head).head
    assert(!reads(febMarShard),
      s"Feb/Mar shard was opened during a Jan-scoped commit: $reads")
    assert(reads(incomplete.head), "overlay segment must always be read")
    // correctness across the whole dance: Jan replaced, Feb intact,
    // March's MoR delete still applied
    val rows = t.scan().orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(3L, 10L), s"got $rows")
  }

  test("property: a skippable segment can never contain a touched entry or an overlay") {
    // the soundness invariant the whole feature stands on: for ARBITRARY
    // entry mixes and touched sets, segStats + segmentSkippable may keep
    // a disjoint segment (costs time) but must NEVER skip a segment
    // holding an entry a partition-scoped commit would remove (data with
    // partition in touched) or must inspect (any overlay). A drift
    // between the two functions would silently leave removed partitions
    // live — this pins them against each other, not against examples.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genTuple: Gen[Map[String, String]] = Gen.oneOf(
      (0 to 6).map(i => Map("d" -> i.toString)) ++
        Seq(Map.empty[String, String], Map("d" -> "1", "b" -> "0")))
    val genEntry: Gen[FileMeta] = for {
      p <- genTuple
      ft <- Gen.frequency(8 -> Gen.const("data"),
        1 -> Gen.oneOf("posdel", "dv", "eqdel"))
    } yield FileMeta("f", ft, 0, 0, p, 1, 1, 1, Map.empty)
    val genSeg: Gen[List[FileMeta]] = Gen.listOf(genEntry)
    val genTouched: Gen[Set[Map[String, String]]] =
      Gen.listOf(genTuple).map(_.toSet)
    val prop = Prop.forAll(genSeg, genTouched) { (seg, touched) =>
      val skip = Meta.segmentSkippable(Some(Meta.segStats(seg)), touched)
      !skip || seg.forall(e =>
        e.fileType == "data" && !touched.contains(e.partition))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("metadata json round-trips the stats (and coalesce recomputes them)") {
    import spark.implicits._
    val t = GraftTable.create(spark, loc(),
      "id bigint, ts timestamp, v double", partitionBy = Seq("day(ts)"))
    t.append(Seq((1L, "2024-01-01 10:00:00", 1.0))
      .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp")))
    // reload from disk: json4s round-trip of the nested stats map
    val r = GraftTable.load(spark, t.location)
    val head = r.meta.head("main").get
    assert(head.manifestStats.nonEmpty &&
      head.manifestStats.values.forall(_.complete))
    // rewriteManifests coalesces into one segment with fresh stats
    r.rewriteManifests()
    val head2 = r.meta.head("main").get
    assert(head2.manifests.size == 1)
    assert(head2.manifestStats.get(head2.manifests.head).exists(_.complete))
  }
}
