package graft.tools

import graft.Tables
import graft.ext.{Dedup, TextAnalysis, TimeSeries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage profiler for the sf1 slowest three (x66 boilerplate 38.3 s,
  * x113 lerp grid 15.9 s, x29 repetition 14.3 s at sf1 in round 10):
  * times each pipeline stage in isolation to attribute the cost and
  * answer the round-10 brief's question — is there a hot INTERPRETED
  * lambda (higher-order function) worth the JlProject/DotProduct
  * native-expression treatment, or is the cost already in codegen'd
  * operators doing irreducible work?
  *
  * Run: `sbt "runMain graft.tools.ProfileTop3"` with
  * `SPARK_GRAFT_SF_DIR` pointing at sf0.1 or the make_sf1.py corpus.
  * Verdict recorded in COVERAGE.md.
  */
object ProfileTop3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-top3")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (0 until 3).map { _ =>
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
      }
      val best = ts.minBy(_._1)
      println(f"PROF $name%-34s wall=${best._1}%7.3fs cpu=${best._2}%8.2fs " +
        ts.map(t => f"${t._1}%.2f").mkString("[", " ", "]"))
      System.out.flush()
    }

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")

    // ---- x29 repetition: all plain codegen column math ----
    time("x29/scan_split_count") {
      docs.select(col("doc_id"), TextAnalysis.wsTokenCount(col("text")).as("n")) }
    time("x29/plus_dup_word") {
      docs.select(col("doc_id"), TextAnalysis.wsTokenCount(col("text")).as("n"),
        TextAnalysis.dupWordRatio(col("text")).as("dw")) }
    time("x29/plus_dup_bigram") {
      docs.select(col("doc_id"), TextAnalysis.wsTokenCount(col("text")).as("n"),
        TextAnalysis.dupWordRatio(col("text")).as("dw"),
        TextAnalysis.dupBigramRatio(col("text")).as("db")) }
    time("x29/full_with_sort") {
      graft.SparkEntry.queries("x29_repetition_filter")(spark, sfDir) }

    // ---- x66 boilerplate: occurrence build vs df-count vs windows ----
    time("x66/occ_posexplode_md5") {
      docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_words"),
        posexplode(graft.functions.WordShingles.word_shingles_pos(col("text"), 4)))
        .select(col("doc_id"), col("n_words"), col("pos"),
          Dedup.md5Hash60(col("col")).as("h")) }
    time("x66/boiler_df_count") {
      val occ = docs.select(col("doc_id"),
        posexplode(graft.functions.WordShingles.word_shingles_pos(col("text"), 4)))
        .select(col("doc_id"), Dedup.md5Hash60(col("col")).as("h"))
      occ.select(col("h"), col("doc_id")).distinct()
        .groupBy(col("h")).agg(count(lit(1)).as("dfh"))
        .where(col("dfh") >= 3).select(col("h")) }
    time("x66/full_coverage") {
      Dedup.boilerplateCoverage(docs, col("doc_id"), col("text"), n = 4, minDf = 3L) }

    // ---- x113 lerp grid: election vs grid join vs fill windows ----
    val events = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "value")
    time("x113/hourly_last_election") {
      TimeSeries.hourlyLast(events, col("user_id"), col("ts"),
        col("event_id"), col("value")) }
    time("x113/plus_grid_join") {
      TimeSeries.hourlyGrid(TimeSeries.hourlyLast(events, col("user_id"),
        col("ts"), col("event_id"), col("value"))) }
    time("x113/full_lerp") {
      TimeSeries.lerpGrid(events, col("user_id"), col("ts"),
        col("event_id"), col("value")) }
    spark.stop()
  }
}
