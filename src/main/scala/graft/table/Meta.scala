package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Metadata model for the graft table format — a Spark-native lakehouse
  * layout with Iceberg-equivalent semantics (snapshots, manifests, hidden
  * partitioning, schema evolution by field id, refs, row lineage).
  *
  * Layout under a table location:
  * {{{
  *   metadata/v00001.json     TableMeta (whole table state, atomic create-new)
  *   manifests/<name>.jsonl   one manifest SEGMENT: one FileMeta per line.
  *                            A snapshot lists its segments in order
  *                            (SnapshotMeta.manifests); commits reference
  *                            the parent's untouched segments and write
  *                            only the delta — O(change) metadata/commit.
  *   data/s<snap>/...         data parquet (physical cols named f<fieldId>)
  *   deletes/...              position/equality/deletion-vector parquet
  * }}}
  *
  * Driver-scale note: a manifest line is ~300 bytes, so 100k files at
  * 100 TB is ~30 MB of JSONL — driver-safe; segments shard the listing so
  * a commit never rewrites it whole (rewriteManifests coalesces).
  *
  * Compat: tables written before segmented manifests carried a single
  * `manifest` string per snapshot; the reader maps it to a one-segment
  * list (see [[Meta.readJsonVersion]]).
  */
final case class FieldMeta(
    id: Int,
    name: String,
    dtype: String, // Spark DDL type string, e.g. "bigint", "decimal(12,2)"
    nullable: Boolean = true,
    initialDefault: Option[String] = None, // v3 column default, SQL literal text
    doc: Option[String] = None)

final case class SchemaMeta(schemaId: Int, fields: List[FieldMeta]) {
  def byName(n: String): FieldMeta = fields.find(_.name == n)
    .getOrElse(throw new IllegalArgumentException(s"no field '$n'"))
  def byId(id: Int): Option[FieldMeta] = fields.find(_.id == id)
}

/** transform ∈ identity|year|month|day|hour|bucket|truncate; bucket may take
  * several source columns (v3 multi-arg transform). */
final case class PartFieldMeta(
    name: String,
    transform: String,
    sourceIds: List[Int],
    param: Option[Int] = None)

final case class PartSpecMeta(specId: Int, fields: List[PartFieldMeta])

final case class ColStats(min: Option[String], max: Option[String], nullCount: Long)

/** One tracked file. fileType ∈ data|posdel|eqdel|dv.
  * - stats keyed by field id (as string, for json map keys)
  * - partition keyed by partition-field name, value encoded as string
  * - eqFieldIds: key fields for equality deletes
  * - appliesTo: target data file for deletion vectors
  * - firstRowId: v3 row lineage — rows in a data file without a
  *   materialized `_row_id` column get firstRowId + rowIndex. */
final case class FileMeta(
    path: String, // relative to table location
    fileType: String,
    specId: Int,
    schemaId: Int,
    partition: Map[String, String],
    rowCount: Long,
    sizeBytes: Long,
    sequenceNumber: Long,
    stats: Map[String, ColStats],
    eqFieldIds: List[Int] = Nil,
    appliesTo: Option[String] = None,
    firstRowId: Long = -1L,
    // true for files REGISTERED in place by add_files (Iceberg migrate
    // analog): columns carry LOGICAL names (name mapping), path may be
    // absolute (outside the table tree)
    nameMapped: Boolean = false)

final case class SnapshotMeta(
    snapshotId: Long,
    parentId: Option[Long],
    sequenceNumber: Long,
    timestampMs: Long,
    operation: String, // append|delete|overwrite|replace
    schemaId: Int,
    // manifest SEGMENTS (relative jsonl paths), in order. A commit carries
    // its parent's untouched segments by reference and writes only the
    // delta — O(change) metadata per commit, not O(table) — the same
    // shape as Iceberg's manifest list. Segments shared across snapshots
    // are cleaned only when no surviving snapshot references them.
    manifests: List[String],
    // Iceberg snapshot-summary analog: what THIS commit changed
    // (added/removed file and record counts) — O(1) observability per
    // commit without diffing manifests
    summary: Map[String, String] = Map.empty,
    // Round-14 additive field (readers may ignore — FORMAT.md §Round-14):
    // per-segment partition summaries keyed by segment rel path, letting
    // a partition-scoped commit skip READING segments proven disjoint
    // from its touched partitions (Iceberg manifest-list partition
    // summaries analog). Absent key -> segment unprunable (back-compat:
    // every pre-round-14 snapshot reads exactly as before).
    manifestStats: Map[String, SegStats] = Map.empty)

/** Partition summary for one manifest segment: the distinct partition
  * tuples of its entries. `complete = true` ONLY when every entry is a
  * data file and the distinct-tuple count stayed under
  * [[Meta.SegStatsCap]] — an incomplete segment can never be skipped
  * (delete/DV overlays apply by target path, not partition, so any
  * segment carrying one must always be opened). */
final case class SegStats(partitions: List[Map[String, String]] = Nil,
    complete: Boolean = false)

final case class RefMeta(snapshotId: Long, isBranch: Boolean)

final case class TableMeta(
    formatVersion: Int, // 2 or 3
    tableUuid: String,
    lastFieldId: Int,
    lastSchemaId: Int,
    lastSpecId: Int,
    lastSnapshotId: Long,
    lastSequenceNumber: Long,
    lastRowId: Long,
    currentSchemaId: Int,
    currentSpecId: Int,
    schemas: List[SchemaMeta],
    specs: List[PartSpecMeta],
    snapshots: List[SnapshotMeta],
    refs: Map[String, RefMeta],
    properties: Map[String, String]) {

  def schema(id: Int): SchemaMeta = schemas.find(_.schemaId == id).get
  def currentSchema: SchemaMeta = schema(currentSchemaId)
  def spec(id: Int): PartSpecMeta = specs.find(_.specId == id).get
  def currentSpec: PartSpecMeta = spec(currentSpecId)
  def snapshot(id: Long): SnapshotMeta = snapshots.find(_.snapshotId == id)
    .getOrElse(throw new IllegalArgumentException(s"no snapshot $id"))
  def head(ref: String): Option[SnapshotMeta] =
    refs.get(ref).map(r => snapshot(r.snapshotId))
}

/** Thrown when an optimistic commit loses the race for the next metadata
  * version (or cannot be rebased); callers retry from fresh state. */
class CommitConflictException(msg: String) extends RuntimeException(msg)

/** Thrown when a write violates a table CHECK constraint, or when
  * ADD CONSTRAINT finds existing rows that violate the new predicate. */
class ConstraintViolationException(msg: String) extends RuntimeException(msg)

object Meta {
  implicit val formats: Formats = DefaultFormats

  def writeJson(meta: TableMeta, location: String): Unit =
    writeJsonAt(meta, location, 1 + currentVersion(location).getOrElse(0))

  /** Publish table state as version file `next`. The publish is atomic
    * CREATE-NEW, so when two committers compute the same next version the
    * second one throws [[CommitConflictException]] instead of silently
    * replacing the first one's commit. */
  def writeJsonAt(meta: TableMeta, location: String, next: Int): Unit = {
    val dir = Paths.get(location, "metadata")
    Files.createDirectories(dir)
    // tmp name must be unique PER WRITER: two committers racing for the
    // same version would otherwise interleave on one tmp file and the
    // winner could link the loser's bytes
    val tmp = dir.resolve(
      s".v$next-${java.util.UUID.randomUUID.toString.take(8)}.json.tmp")
    Files.writeString(tmp, Serialization.writePretty(meta))
    // hard link fails if the target exists; a plain rename (ATOMIC_MOVE)
    // REPLACES an existing target on POSIX, which is exactly the
    // lost-commit hole this closes
    try Files.createLink(dir.resolve(f"v$next%05d.json"), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new CommitConflictException(
          s"metadata version $next was published concurrently — retry")
    }
    Files.deleteIfExists(tmp)
  }

  def currentVersion(location: String): Option[Int] = {
    val dir = Paths.get(location, "metadata")
    if (!Files.isDirectory(dir)) return None
    val vs = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d+\\.json") => s.drop(1).dropRight(5).toInt }
      .toSeq
    if (vs.isEmpty) None else Some(vs.max)
  }

  def readJson(location: String): TableMeta =
    readJsonVersion(location, currentVersion(location)
      .getOrElse(throw new IllegalArgumentException(s"not a graft table: $location")))

  /** read the table state at a SPECIFIC metadata version — committers pin
    * the version they validated against and publish at exactly version+1,
    * so any interleaved publication turns into a create-new conflict
    * instead of a lost update */
  def readJsonVersion(location: String, v: Int): TableMeta = {
    val p = Paths.get(location, "metadata", f"v$v%05d.json")
    import org.json4s.{JArray, JString}
    // legacy-format shim: pre-segmented-manifest snapshots carried a single
    // `manifest` string — map it to a one-segment `manifests` list so tables
    // written by older builds stay readable (no formatVersion bump needed:
    // the on-disk segment files themselves are unchanged). Scoped to the
    // elements of the top-level `snapshots` array: an unscoped recursive
    // transform would also mangle a table PROPERTY literally keyed
    // "manifest" (properties are user-controlled strings) into an array
    // and make the table unreadable.
    val ast = org.json4s.jackson.JsonMethods.parse(Files.readString(p))
      .transformField {
        case ("snapshots", JArray(snaps)) =>
          ("snapshots", JArray(snaps.map(_.transformField {
            case ("manifest", JString(m)) =>
              ("manifests", JArray(List(JString(m))))
          })))
      }
    ast.extract[TableMeta]
  }

  def writeManifest(location: String, name: String, entries: Seq[FileMeta]): String = {
    val dir = Paths.get(location, "manifests")
    Files.createDirectories(dir)
    val rel = s"manifests/$name.jsonl"
    val tmp = dir.resolve(s".$name.jsonl.tmp")
    Files.writeString(tmp, entries.map(Serialization.write(_)).mkString("\n"))
    Files.move(tmp, Paths.get(location, rel), StandardCopyOption.ATOMIC_MOVE)
    rel
  }

  /** jackson-module-scala mapper for the manifest hot path: json4s extracts
    * through runtime reflection per field (~100 µs/entry — 10k-file tables
    * pay ~1 s per metadata read, 100k-file tables ~10 s of driver stall);
    * databind with the Scala module is ~10x faster and Spark already ships
    * it. Metadata v*.json stays on json4s (one small document, and its
    * writer controls the shape); manifests are the O(files) plane. */
  private[table] val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m.configure(com.fasterxml.jackson.databind.DeserializationFeature
      .FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  // test observability, default OFF (the log would grow unbounded in a
  // long Verify/Bench JVM): SegStatsSpec flips `recordReads` around a
  // partition-scoped commit to PROVE disjoint segments are never opened
  @volatile private[graft] var recordReads: Boolean = false
  private[graft] val readLog =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Parsed-manifest cache (rounds 15-16). Segments are IMMUTABLE once
    * published — snapId-uuid names from every writer (native
    * [[writeManifest]] AND scripts/extwriter.py), atomic-rename
    * create-new, never rewritten in place — so a parse is valid for
    * the file's lifetime, and the jackson pass is the real cost of a
    * metadata read (ManifestDiag, this machine: a 100k-entry plane
    * parses in ~245 ms cold and ~2 ms cached; 1M entries ~3.2 s cold).
    * Round-16 shape (closing the round-15 ADVICE + VERDICT items):
    *  - BYTE-weighted bound — the weight is the raw JSONL length, what
    *    the heap actually pays within a small constant — default 128 MB
    *    (~400k entries at the measured ~300 B/entry) via
    *    -Dgraft.manifest.cache.bytes; the old entry knob
    *    -Dgraft.manifest.cache.entries is still honored when set
    *    (0 disables, N caps at N x 300 B). The 1M-entry default pinned
    *    several hundred MB in any embedding JVM; a bounded default with
    *    scan-resistant admission keeps the useful residency instead.
    *  - SCAN-RESISTANT admission: once full, a candidate is admitted
    *    only while it has been asked for STRICTLY more often than the
    *    LRU-coldest resident (frequency sketch with periodic halving).
    *    A sequential pass over a plane larger than the bound then keeps
    *    the resident prefix hot instead of cycling everything through —
    *    plain LRU measured warm == cold in exactly that shape (round
    *    15: 1M-entry plane, 200k bound).
    *  - per-key SINGLE-FLIGHT: concurrent first reads of one segment
    *    parse once; losers await the winner's result.
    * Cache hits still hit the read log: the SegStats read-log proofs pin
    * which segments a commit/scan DECIDES to open — the algorithmic
    * layer — not disk syscalls; MetaCacheSpec pins the immutability
    * contract and the scan-resistance itself. */
  private val manifestCacheMaxBytes: Long =
    sys.props.get("graft.manifest.cache.entries").flatMap(_.toLongOption) match {
      case Some(n) => math.max(0L, n) * 300L
      case None => sys.props.get("graft.manifest.cache.bytes")
        .flatMap(_.toLongOption).getOrElse(128L << 20)
    }
  private[graft] final case class SegVal(entries: Seq[FileMeta], weight: Long)

  /** The cache policy, instantiable with a small bound for tests
    * (MetaCacheSpec's scan-resistance leg). Thread-safe; `get` runs one
    * parse per key under concurrency (single-flight). */
  private[graft] final class ManifestCache(val maxBytes: Long) {
    private val resident =
      new java.util.LinkedHashMap[String, SegVal](64, 0.75f, true)
    private var residentBytes = 0L
    def sizeBytes: Long = resident.synchronized(residentBytes)
    // access-frequency sketch for admission decisions; halved (zeros
    // dropped) every FreqWindow bumps so stale history cannot pin a
    // once-hot segment forever (the Caffeine aging trick)
    private val segFreq = new java.util.HashMap[String, Int]()
    private var segFreqOps = 0L
    private val FreqWindow = 1 << 18
    private def bumpFreq(key: String): Int = {
      segFreqOps += 1
      if (segFreqOps % FreqWindow == 0) {
        val it = segFreq.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1) it.remove() else e.setValue(e.getValue / 2)
        }
      }
      val f = segFreq.getOrDefault(key, 0) + 1
      segFreq.put(key, f)
      f
    }
    private val inflight =
      new java.util.concurrent.ConcurrentHashMap[String,
        java.util.concurrent.CompletableFuture[SegVal]]()
    @volatile private[graft] var hits = 0L
    @volatile private[graft] var misses = 0L

    def get(key: String, parse: () => SegVal): Seq[FileMeta] = {
      val hit = resident.synchronized {
        val v = resident.get(key)
        if (v != null) { bumpFreq(key); v } else null
      }
      if (hit != null) { hits += 1; return hit.entries }
      misses += 1
      val mine = new java.util.concurrent.CompletableFuture[SegVal]()
      val race = inflight.putIfAbsent(key, mine)
      if (race != null) return race.join().entries
      try {
        val v = parse()
        resident.synchronized {
          val f = bumpFreq(key)
          if (!resident.containsKey(key)) {
            // admit freely into free space; once full, evict LRU-coldest
            // residents only while this candidate is strictly hotter —
            // stop (reject admission) at the first victim at least as
            // hot. One sequential pass over an over-bound plane then
            // leaves the resident prefix in place (every candidate and
            // victim reads freq 1 vs 1+) instead of cycling it.
            var admit = true
            while (admit && residentBytes + v.weight > maxBytes) {
              val it = resident.entrySet().iterator()
              if (!it.hasNext) admit = false // single over-bound shard: serve uncached
              else {
                val victim = it.next()
                if (segFreq.getOrDefault(victim.getKey, 0) >= f) admit = false
                else {
                  residentBytes -= victim.getValue.weight
                  it.remove()
                }
              }
            }
            if (admit) {
              resident.put(key, v)
              residentBytes += v.weight
            }
          }
        }
        mine.complete(v)
        v.entries
      } catch {
        case t: Throwable => mine.completeExceptionally(t); throw t
      } finally inflight.remove(key)
    }
  }

  private val manifestCache = new ManifestCache(manifestCacheMaxBytes)
  private[graft] def manifestCacheSize: Long = manifestCache.sizeBytes

  private[graft] def parseManifest(location: String, rel: String): SegVal = {
    val s = Files.readString(Paths.get(location, rel))
    val entries =
      if (s.isEmpty) Nil
      else s.split('\n').toSeq.filter(_.nonEmpty)
        .map(mapper.readValue(_, classOf[FileMeta]))
    SegVal(entries, math.max(1L, s.length.toLong))
  }

  def readManifest(location: String, rel: String): Seq[FileMeta] = {
    if (recordReads) readLog.add(rel)
    if (manifestCacheMaxBytes <= 0) return parseManifest(location, rel).entries
    val key = Paths.get(location, rel).toAbsolutePath.toString
    manifestCache.get(key, () => parseManifest(location, rel))
  }

  /** all live file entries at a snapshot, across its manifest segments */
  def readEntries(location: String, snap: SnapshotMeta): Seq[FileMeta] =
    snap.manifests.flatMap(readManifest(location, _))

  /** Per-segment partition-summary cap: beyond this many distinct tuples
    * a segment is recorded incomplete (unprunable) — bounds metadata
    * growth to ~cap × tuple-size per segment while covering the common
    * shapes (a daily append segment carries 1-31 tuples). */
  val SegStatsCap = 100

  /** Summary of one segment's entries for [[SnapshotMeta.manifestStats]]:
    * complete only for bounded all-data segments (see [[SegStats]]). */
  def segStats(entries: Seq[FileMeta]): SegStats = {
    val tuples = entries.map(_.partition).distinct
    if (entries.nonEmpty && entries.forall(_.fileType == "data") &&
        tuples.size <= SegStatsCap)
      SegStats(tuples.toList, complete = true)
    else SegStats(Nil, complete = false)
  }

  /** Can a partition-scoped commit skip reading this segment? Only with
    * an affirmative PROOF of disjointness: stats present, complete, and
    * no tuple of the segment in the touched set. Tuple membership is
    * EXACT map equality — the same rule the unpruned path applies per
    * entry — so pruning can never change which entries match. */
  def segmentSkippable(stats: Option[SegStats],
      touched: Set[Map[String, String]]): Boolean =
    stats.exists(s => s.complete && !s.partitions.exists(touched))

  /** entries at a snapshot, skipping segments proven disjoint from the
    * touched partition tuples (segments without stats are read — every
    * pre-round-14 snapshot behaves exactly as [[readEntries]]) */
  def readEntriesTouching(location: String, snap: SnapshotMeta,
      touched: Set[Map[String, String]]): Seq[FileMeta] =
    snap.manifests
      .filterNot(seg => segmentSkippable(snap.manifestStats.get(seg), touched))
      .flatMap(readManifest(location, _))
}
