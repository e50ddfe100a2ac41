package graft.table

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Filesystem-warehouse catalog (the hadoop-catalog analog): a namespace is
  * a directory, a table is a graft-format directory inside it. All state is
  * on the filesystem — service catalogs (REST/JDBC/Hive/...) would plug in
  * behind the same interface by swapping the listing/pointer operations. */
class GraftCatalog(val spark: SparkSession, val warehouse: String) {

  private def nsPath(ns: String): Path = Paths.get(warehouse, ns)
  private def tblPath(ns: String, t: String): Path = nsPath(ns).resolve(t)

  def createNamespace(ns: String): Unit =
    Files.createDirectories(nsPath(ns))

  def listNamespaces(): Seq[String] = {
    val w = Paths.get(warehouse)
    if (!Files.isDirectory(w)) return Nil
    Files.list(w).iterator().asScala.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq.sorted
  }

  def createTable(ns: String, name: String, ddl: String,
      partitionBy: Seq[String] = Nil, properties: Map[String, String] = Map.empty,
      formatVersion: Int = 3): GraftTable = {
    createNamespace(ns)
    GraftTable.create(spark, tblPath(ns, name).toString, ddl, partitionBy,
      properties, formatVersion)
  }

  def loadTable(ns: String, name: String): GraftTable = {
    require(tableExists(ns, name), s"no such table $ns.$name")
    GraftTable.load(spark, tblPath(ns, name).toString)
  }

  def tableExists(ns: String, name: String): Boolean =
    Meta.currentVersion(tblPath(ns, name).toString).isDefined

  def listTables(ns: String): Seq[String] = {
    val p = nsPath(ns)
    if (!Files.isDirectory(p)) return Nil
    Files.list(p).iterator().asScala
      .filter(d => Meta.currentVersion(d.toString).isDefined)
      .map(_.getFileName.toString)
      // dot-prefixed dirs are in-flight staging tables (CTAS REPLACE swap)
      .filterNot(_.startsWith("."))
      .toSeq.sorted
  }

  def renameTable(ns: String, from: String, to: String): Unit = {
    require(tableExists(ns, from), s"no such table $ns.$from")
    require(!tableExists(ns, to), s"table $ns.$to exists")
    Files.move(tblPath(ns, from), tblPath(ns, to))
  }

  def dropTable(ns: String, name: String): Unit = {
    val p = tblPath(ns, name)
    if (Files.isDirectory(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
  }

  /** drop an EMPTY namespace (callers enforce emptiness for DDL) */
  def dropNamespace(ns: String): Unit =
    Files.deleteIfExists(nsPath(ns))

  /** staging-dir name for an RTAS swap targeting `tbl` — the fixed-width
    * uuid makes the TARGET parseable back out of the name, which is what
    * lets [[cleanStaging]] recover a swap that crashed between drop(old)
    * and rename(staging, target) */
  def stagingName(tbl: String): String =
    s".rtas_${java.util.UUID.randomUUID.toString.take(8)}_$tbl"

  private val StagingRe = "^\\.rtas_[0-9a-f]{8}_(.+)$".r

  /** Reconcile in-flight staging tables (dot-prefixed dirs from CTAS
    * REPLACE swaps) whose last metadata write is older than `olderThanMs`.
    * Age guard for the same reason removeOrphanFiles has one: a LIVE RTAS
    * may still be materializing into a young staging dir.
    *
    * RESTORE-FIRST: a swap that crashed between dropTable(old) and
    * renameTable(staging, target) leaves the fully-materialized staging
    * dir as the ONLY surviving copy of the table — deleting it would
    * destroy data. So a stale staging whose parsed target is missing and
    * whose materialization completed (>= 1 snapshot) is renamed into
    * place, finishing the interrupted swap; everything else (target
    * alive, or crashed mid-materialize with zero snapshots) is removed.
    *
    * @return (restored, removed) counts */
  def cleanStaging(ns: String, olderThanMs: Long): (Int, Int) = {
    val p = nsPath(ns)
    if (!Files.isDirectory(p)) return (0, 0)
    val stale = Files.list(p).iterator().asScala
      .filter(d => d.getFileName.toString.startsWith(".") && Files.isDirectory(d))
      .filter(d => Files.getLastModifiedTime(d).toMillis < olderThanMs)
      .toSeq
    var restored = 0
    stale.foreach { d =>
      val target = d.getFileName.toString match {
        case StagingRe(t) => Some(t)
        case _ => None
      }
      val complete = Meta.currentVersion(d.toString).isDefined &&
        scala.util.Try(Meta.readJson(d.toString).snapshots.nonEmpty).getOrElse(false)
      target.filter(t => complete && !tableExists(ns, t)) match {
        case Some(t) => Files.move(d, tblPath(ns, t)); restored += 1
        case None =>
          Files.walk(d).sorted(Comparator.reverseOrder[Path]())
            .iterator().asScala.foreach(Files.deleteIfExists(_))
      }
    }
    (restored, stale.size - restored)
  }
}
