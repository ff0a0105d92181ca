package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted plans for the plan-quality audit. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSet else Set("q1_catalog_scan", "q12_revenue_join", "q6_weak_programs")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.filter(kv => names(kv._1)).foreach { case (name, fn) =>
      println(s"########## $name")
      fn(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
