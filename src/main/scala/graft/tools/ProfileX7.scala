package graft.tools

import graft.Tables
import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for x7: times each stage of the MinHash+LSH
  * pipeline in isolation to attribute the bench cost. */
object ProfileX7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-x7")
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
    time("scan") { docs.select("doc_id") }
    time("distinctContents") {
      Dedup.distinctContents(docs, col("doc_id"), col("text")) }
    time("shingle_explode_md5") {
      Dedup.distinctContents(docs, col("doc_id"), col("text"))
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
        .select(col("doc_id"), Dedup.md5Hash60(col("sh")).as("h")) }
    time("plus_64min_agg") {
      val hashed = Dedup.distinctContents(docs, col("doc_id"), col("text"))
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
        .select(col("doc_id"), Dedup.md5Hash60(col("sh")).as("h"))
      val mins = Dedup.hashCoeffs(64).zipWithIndex.map { case ((a, b, c), i) =>
        min((lit(a) * col("h").bitwiseAND(lit((1L << 30) - 1))
          + lit(b) * shiftright(col("h"), 30) + lit(c)) % lit(Dedup.HashP)).as(s"mh_$i")
      }
      hashed.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*) }
    time("plus_collect_set") {
      val hashed = Dedup.distinctContents(docs, col("doc_id"), col("text"))
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
        .select(col("doc_id"), Dedup.md5Hash60(col("sh")).as("h"))
      hashed.groupBy(col("doc_id")).agg(collect_set(col("h")).as("hs")) }
    time("full_minhashPairs") {
      Dedup.minhashPairs(docs, col("doc_id"), col("text")).orderBy("a", "b") }
    spark.stop()
  }
}
