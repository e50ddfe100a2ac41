package graft.ops

import java.nio.file.Files

import graft.table._

/** Round-15 measurement harness for the metadata plane's scale claims
  * (no SparkSession — this is pure driver-side work, which is the
  * point: planning cost is driver stall). Builds a synthetic snapshot
  * with N data entries across 48 partition-clustered shards carrying
  * complete stats — the post-rewriteManifests layout of a large table —
  * and times, 5 reps each:
  *   - cold  : full readEntries with the parsed-manifest cache DISABLED
  *             per rep impossible in-process (the cache is global), so
  *             cold is the FIRST read of each of 5 distinct planes;
  *   - warm  : repeat readEntries of one plane (cache hits);
  *   - prune : segment-pruned scan planning for a one-partition
  *             predicate (Pruning.segmentScanSkippable + intersecting
  *             reads only) on an uncached plane — what a point query
  *             pays on first touch;
  * Prints one JSON line. Run:
  *   GRAFT_MAIN=graft.ops.ManifestDiag scripts/benchjvm.sh [nEntries]
  */
object ManifestDiag {

  private def timeMs[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e6)
  }

  private def buildPlane(n: Int, shards: Int): (String, SnapshotMeta, TableMeta) = {
    val loc = Files.createTempDirectory("graft-manifestdiag").toString
    val perShard = math.max(1, n / shards)
    val segs = (0 until shards).map { s =>
      val entries = (0 until perShard).map(i => FileMeta(
        s"data/s1/f${s}_$i.parquet", "data", 0, 0, Map("d" -> s.toString),
        1000000L, 128L << 20, 1L,
        Map("1" -> ColStats(Some((i * 1000).toString),
          Some((i * 1000 + 999).toString), 0L))))
      val rel = Meta.writeManifest(loc, s"1-c$s-diag", entries)
      rel -> Meta.segStats(entries)
    }
    val snap = SnapshotMeta(1L, None, 1L, 0L, "append", 0,
      segs.map(_._1).toList, Map.empty, segs.toMap)
    val schema = SchemaMeta(0, List(
      FieldMeta(1, "v", "bigint", nullable = true),
      FieldMeta(2, "d", "string", nullable = true)))
    val m = TableMeta(3, "diag", 2, 0, 0, 1L, 1L, 0L, 0, 0,
      List(schema), List(PartSpecMeta(0, List(
        PartFieldMeta("d", "identity", List(2))))), List(snap), Map.empty,
      Map.empty)
    (loc, snap, m)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(100000)
    val shards = 48
    val reps = 5
    // distinct planes so each "cold" rep truly parses from disk
    val planes = (1 to reps).map(_ => buildPlane(n, shards))
    val cold = planes.map { case (loc, snap, _) =>
      timeMs(Meta.readEntries(loc, snap))._2
    }
    val (locW, snapW, mW) = planes.head
    val warm = (1 to reps).map(_ => timeMs(Meta.readEntries(locW, snapW))._2)
    // pruned planning on UNCACHED planes: fresh plane per rep, predicate
    // d = '7' (one shard intersects), the scanSnapshot planning rule
    val prunePlanes = (1 to reps).map(_ => buildPlane(n, shards))
    val preds = Seq(Pruning.Pred("d", "=",
      Seq(org.apache.spark.unsafe.types.UTF8String.fromString("7"))))
    val prune = prunePlanes.map { case (loc, snap, m) =>
      val (es, ms) = timeMs {
        snap.manifests
          .filterNot(seg => Pruning.segmentScanSkippable(
            m, snap.manifestStats.get(seg), preds))
          .flatMap(Meta.readManifest(loc, _))
          .filter(f => Pruning.fileMatches(f, m, preds))
      }
      require(es.nonEmpty && es.forall(_.partition("d") == "7"),
        s"pruned planning returned wrong files: ${es.size}")
      ms
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println(f"""{"diag":"manifest","entries":$n,"shards":$shards,""" +
      f""""cold_ms":${med(cold)}%.1f,"warm_ms":${med(warm)}%.1f,""" +
      f""""pruned_first_touch_ms":${med(prune)}%.1f,""" +
      f""""cold_all":[${cold.map(c => f"$c%.1f").mkString(",")}],""" +
      f""""warm_all":[${warm.map(c => f"$c%.1f").mkString(",")}],""" +
      f""""prune_all":[${prune.map(c => f"$c%.1f").mkString(",")}]}""")
  }
}
