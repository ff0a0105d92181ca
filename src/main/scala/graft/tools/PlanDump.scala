package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the executed physical plan of named queries — plan-audit
  * tooling (not part of the engine). Usage:
  * runMain graft.tools.PlanDump <sfDir> <name>[,<name>...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      println(s"==== $n ====")
      println(df.queryExecution.executedPlan.toString)
    } finally spark.stop()
  }
}
