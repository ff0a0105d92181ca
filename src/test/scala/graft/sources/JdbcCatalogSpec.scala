package graft.sources

import java.sql.DriverManager

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S1/S3 scan + S6 partial-upsert over a real JDBC database (embedded
  * Derby — ships with Spark; the SQL is MySQL-portable unchanged). */
class JdbcCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def freshTable(name: String): Unit = {
    try JdbcCatalog.execute(url, Seq(s"DROP TABLE $name")) catch { case _: Throwable => () }
    JdbcCatalog.execute(url, Seq(
      s"""CREATE TABLE $name (
         |  id VARCHAR(32) PRIMARY KEY,
         |  video_format VARCHAR(32),
         |  video_resolution VARCHAR(32),
         |  audio_format VARCHAR(32),
         |  audio_sampling_rate VARCHAR(32),
         |  target_matching_id VARCHAR(32),
         |  flow_score INT,
         |  resolution_type INT)""".stripMargin,
      s"INSERT INTO $name VALUES ('s1', 'h264', '1920x1080', 'aac', '44100', '300', 10, 1)",
      s"INSERT INTO $name VALUES ('s2', 'hevc', '1280x720', 'mp3', '48000', '301', 95, 5)",
      s"INSERT INTO $name VALUES ('s3', '', '', '', '', '', 50, 2)"))
  }

  private def dbState(name: String): Map[String, (String, String, Int, Int)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT id, video_format, target_matching_id, flow_score, resolution_type FROM $name")
      Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => r.getString(1) -> ((r.getString(2), r.getString(3), r.getInt(4), r.getInt(5))))
        .toMap
    } finally conn.close()
  }

  test("jdbc scan pushes filter + projection into the database — StreamTest.cpp:685-689") {
    freshTable("cat_scan")
    val df = JdbcCatalog.read(spark, url, "cat_scan")
      .where(col("flow_score") > 40)
      .select(col("id"), col("flow_score"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThan(FLOW_SCORE,40)") || plan.contains("GreaterThan(flow_score,40)"), plan)
    // projection pruning: the scan reads 2 columns, not 8
    assert(!plan.toLowerCase.contains("video_resolution"), plan)
    val got = df.as[(String, Int)].collect().toSet
    assert(got === Set(("s2", 95), ("s3", 50)))
  }

  test("partitioned jdbc read splits the key range across tasks") {
    freshTable("cat_part")
    val df = JdbcCatalog.readPartitioned(spark, url, "cat_part",
      partitionColumn = "flow_score", lower = 0, upper = 100, numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 3)
  }

  test("partial UPDATE skips empty fields, always writes score — StreamTest.cpp:151-190") {
    freshTable("cat_up")
    val updates = Seq(
      // s1: empty video_format keeps 'h264'; non-empty matching id wins
      ("s1", "", "640x360", "", "", "999", 77, 4),
      // s3: all skip-empty fields empty → only score/resolution change
      ("s3", "", "", "", "", "", 61, 3),
      // unmatched id: the reference UPDATE never inserts → no-op
      ("s9", "av1", "1x1", "opus", "8000", "7", 1, 1))
      .toDF("url_id", "video_format", "video_resolution", "audio_format",
        "audio_sampling_rate", "target_matching_id", "flow_score", "resolution_type")
    JdbcCatalog.upsertPartial(updates, url, "cat_up")
    val st = dbState("cat_up")
    assert(st("s1") === (("h264", "999", 77, 4)))
    assert(st("s2") === (("hevc", "301", 95, 5))) // untouched
    assert(st("s3") === (("", "", 61, 3)))
    assert(!st.contains("s9"))
  }

  test("streaming foreachBatch partial upsert over JDBC (S6/ST7)") {
    freshTable("cat_stream")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, String, String, String, String, Int, Int)]
    val df = mem.toDF().toDF("url_id", "video_format", "video_resolution",
      "audio_format", "audio_sampling_rate", "target_matching_id",
      "flow_score", "resolution_type")
    val q = JdbcCatalog.upsertWriter(df, url, "cat_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("jdbc_ckpt").toString)
      .start()
    mem.addData(("s1", "av1", "", "", "", "", 33, 9))
    q.processAllAvailable()
    mem.addData(("s2", "", "", "", "", "302", 44, 8))
    q.processAllAvailable()
    q.stop()
    val st = dbState("cat_stream")
    assert(st("s1") === (("av1", "300", 33, 9)))
    assert(st("s2") === (("hevc", "302", 44, 8)))
  }
}
