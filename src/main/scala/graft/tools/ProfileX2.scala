package graft.tools

import graft.Tables
import graft.ext.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the x2/x3 text-analytics bench regression
  * (VERDICT r2 #1). Times each projected column in isolation, and the
  * composition, with and without the range-sort, to attribute cost.
  */
object ProfileX2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-x2")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-28s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    val docs = Tables.documents(spark, sfDir)
    time("scan_only") { docs.select("doc_id") }
    time("n_ws") { docs.select(TextAnalysis.wsTokenCount(col("text")).as("n_ws")) }
    time("n_bpe") { docs.select(TextAnalysis.bpeTokenCount(col("text")).as("n_bpe")) }
    time("n_stop") { docs.select(TextAnalysis.stopwordCount(col("text"), TextAnalysis.langStopwords.head._2).as("n_stop")) }
    time("n_punct") { docs.select(TextAnalysis.punctCount(col("text")).as("n_punct")) }
    val all = docs.select(
      col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("n_ws"),
      TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
      TextAnalysis.stopwordCount(col("text"), TextAnalysis.langStopwords.head._2).as("n_stop"),
      TextAnalysis.punctCount(col("text")).as("n_punct"))
    time("all_no_sort") { all }
    time("all_sorted") { all.orderBy("doc_id") }
    time("all_repart32_sorted") {
      docs.repartition(32).select(
        col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("n_ws"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
        TextAnalysis.stopwordCount(col("text"), TextAnalysis.langStopwords.head._2).as("n_stop"),
        TextAnalysis.punctCount(col("text")).as("n_punct"))
        .orderBy("doc_id")
    }
    spark.stop()
  }
}
