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

  /** Remove in-flight staging tables (dot-prefixed dirs from CTAS REPLACE
    * swaps) whose last metadata write is older than `olderThanMs` — the
    * cleanup for a writer that crashed between materialize and swap. Age
    * guard for the same reason removeOrphanFiles has one: a LIVE RTAS may
    * still be materializing into a young staging dir. */
  def cleanStaging(ns: String, olderThanMs: Long): Int = {
    val p = nsPath(ns)
    if (!Files.isDirectory(p)) return 0
    val stale = Files.list(p).iterator().asScala
      .filter(d => d.getFileName.toString.startsWith(".") && Files.isDirectory(d))
      .filter(d => Files.getLastModifiedTime(d).toMillis < olderThanMs)
      .toSeq
    stale.foreach { d =>
      Files.walk(d).sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
    }
    stale.size
  }
}
