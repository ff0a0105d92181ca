package graft

import graft.functions.PolyHash
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends SparkSpec {
  test("poly_hash and dot_product are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT poly_hash('hello') AS h, dot_product(array(1d,2d), array(3d,4d)) AS d")
      .collect().head
    assert(r.getLong(0) === PolyHash.hash("hello"))
    assert(r.getDouble(1) === 11.0)
  }

  test("md5_hash60, word_shingles, stopword_count are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT md5_hash60('hello') AS h,
        |       word_shingles('a b c d', 3) AS sh,
        |       stopword_count('the cat and the hat', 'the', 'and') AS n""".stripMargin)
      .collect().head
    assert(r.getLong(0) ===
      graft.functions.Md5Hash60.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello")))
    assert(r.getSeq[String](1) === Seq("a b c", "b c d"))
    assert(r.getInt(2) === 3)
  }

  test("parameter args must be non-null literals — clear error, not NPE") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("abc", 2)).toDF("t", "n").createOrReplaceTempView("ext_guard_t")
    // non-literal shingle size: usage string, not an opaque planner error
    val e1 = intercept[Exception] {
      spark.sql("SELECT word_shingles(t, n) FROM ext_guard_t").collect()
    }
    assert(e1.getMessage.contains("word_shingles(text, n)"), e1.getMessage)
    // NULL stopword literal: usage string, not an NPE
    val e2 = intercept[Exception] {
      spark.sql("SELECT stopword_count(t, CAST(NULL AS STRING)) FROM ext_guard_t")
        .collect()
    }
    assert(e2.getMessage.contains("stopword_count"), e2.getMessage)
  }
}

class RollupCsvSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("rollup CSV has the reference's 29-column layout — StreamTest.cpp:1186-1236") {
    assert(graft.sinks.Report.RollupCsvColumns.length === 29)
  }

  test("writeRollupCsv round-trips through the csv sink") {
    import spark.implicits._
    val df = Seq(("s1", 1L, 1001, "0x0", "hls"), ("s1", 2L, 0, "1920x1080", ""))
      .toDF("url_id", "seq", "item", "video_resolution", "streaming_protocol")
      .withColumn("flow_address", lit("http://x"))
      .withColumn("target_matching", lit("Prog A"))
      .withColumn("target_matching_id", lit("300"))
      .withColumn("bitrate", lit(""))
      .withColumn("stream_length", lit(""))
      .withColumn("video_format", lit(""))
      .withColumn("audio_format", lit(""))
      .withColumn("audio_sampling_rate", lit(""))
    val rollup = graft.ops.DetectionRollup.rollup(df, col("seq"))
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    graft.sinks.Report.writeRollupCsv(rollup, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.columns.toSeq === graft.sinks.Report.RollupCsvColumns)
    val row = back.collect().head
    assert(row.getAs[String]("video_resolution") === "1920x1080")
    assert(row.getAs[String]("n_open_input") === "1")
    assert(row.getAs[String]("n_detection") === "2")
  }
}

class ZorderSqlSpec extends SparkSpec {
  test("zorder_key is callable from SQL and matches the Column form") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT zorder_key(3L, 5L, 8) AS z").collect().head
    assert(r.getLong(0) === 39L)
  }
}
