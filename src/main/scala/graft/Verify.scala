package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Run one registry query into `outDir/<name>`. A query that throws
    * must still leave evidence the driver can mark `err` — round 5
    * proved that a silently-absent directory just shrinks the
    * correctness JSON (179→141 with zero err entries). On failure the
    * dir is created with an `_ERROR` marker carrying the message.
    * Returns true on success. */
  def runOne(spark: SparkSession, sfDir: String, outDir: String,
      name: String, fn: (SparkSession, String) => DataFrame): Boolean =
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      true
    } catch { case e: Throwable =>
      System.err.println(s"[verify] $name failed: ${e.getMessage}")
      val d = Paths.get(s"$outDir/$name")
      Files.createDirectories(d)
      Files.writeString(d.resolve("_ERROR"),
        s"${e.getClass.getName}: ${e.getMessage}")
      false
    }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (fast local iteration);
    // the driver always calls with 2 args -> full run
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.SessionConfs.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // a reused outDir can hold result dirs from an earlier (differently
    // filtered) run; selfcheck compares every dir it finds, so stale dirs
    // would silently mix old results into this run's verdict — drop any
    // result dir not in THIS run's selection before writing anything
    Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !selected.contains(f.getName))
      .foreach { d =>
        System.err.println(s"[verify] clearing stale result dir ${d.getName}")
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
        }
        rm(d)
      }
    val failed = selected.toSeq.collect {
      case (name, fn) if !runOne(spark, sfDir, outDir, name, fn) => name
    }
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} FAILED: " +
        failed.sorted.mkString(", "))
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // registry key list for THIS run (the driver always runs unfiltered →
    // full registry): lets selfcheck.py detect a query that produced NO
    // output at all — absence must be loud
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      selected.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
