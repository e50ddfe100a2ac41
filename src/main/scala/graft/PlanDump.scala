package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Tables.SessionConfs.foldLeft(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"########## $q")
      val df = SparkEntry.queries(q)(spark, dir)
      df.count()
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
