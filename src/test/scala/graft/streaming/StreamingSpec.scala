package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import graft.model.DetectionEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(urlId: String, item: Int, t: String, res: String = "",
      proto: String = ""): DetectionEvent =
    DetectionEvent(urlId, s"http://x/$urlId", item, "0", "", proto, "", "",
      "", res, "", "", Timestamp.valueOf(t), "300", "Prog A")

  test("ST1 ingest: MemoryStream → date-partitioned fact store") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DetectionEvent]
    val dir = Files.createTempDirectory("graft-fact").toString
    val cp = Files.createTempDirectory("graft-cp").toString
    val q = DetectionPipeline.ingest(mem.toDS(), dir, cp)
    mem.addData(
      ev("s1", 0, "2024-03-01 10:00:00"),
      ev("s1", 1001, "2024-03-01 11:00:00"),
      ev("s2", 0, "2024-03-02 09:00:00"))
    q.processAllAvailable()
    q.stop()
    val stored = spark.read.parquet(dir)
    assert(stored.count() === 3)
    // date partitioning happened (100 TB pruning posture)
    assert(stored.select("event_date").distinct().count() === 2)
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("event_date=")))
  }

  test("ST3 day-so-far recompute rolls up only the target day") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DetectionEvent]
    val dir = Files.createTempDirectory("graft-fact2").toString
    val cp = Files.createTempDirectory("graft-cp2").toString
    val q = DetectionPipeline.ingest(mem.toDS(), dir, cp)
    mem.addData(
      ev("s1", 0, "2024-03-01 10:00:00", proto = "hls"),
      ev("s1", 1001, "2024-03-01 11:00:00"),
      ev("s1", 0, "2024-03-01 23:30:00"),
      ev("s1", 0, "2024-03-02 01:00:00")) // next day: excluded
    q.processAllAvailable()
    q.stop()
    val out = DetectionPipeline.rollupDaySoFar(spark, dir,
      java.time.LocalDate.of(2024, 3, 1),
      Instant.parse("2024-03-01T23:59:59Z")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Int]("n_detection") === 3)
    assert(out.head.getAs[Int]("n_error") === 1)
    assert(out.head.getAs[String]("streaming_protocol") === "hls")
  }

  test("ST4 incremental windowed daily counts match the recompute") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DetectionEvent]
    val agg = DetectionPipeline.streamingDailyCounts(mem.toDS())
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("daily_counts").start()
    mem.addData(
      ev("s1", 0, "2024-03-01 10:00:00"),
      ev("s1", 1001, "2024-03-01 12:00:00"),
      ev("s2", 0, "2024-03-01 13:00:00"),
      ev("s1", 0, "2024-03-02 10:00:00"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("daily_counts")
      .select(date_format(col("day_start"), "yyyy-MM-dd").as("d"),
        col("url_id"), col("n_error"), col("n_detection"))
      .as[(String, String, Int, Int)].collect().toSet
    assert(rows === Set(
      ("2024-03-01", "s1", 1, 2),
      ("2024-03-01", "s2", 0, 1),
      ("2024-03-02", "s1", 0, 1)))
  }

  test("isLastLoop: fires only when next wake crosses UTC midnight — StreamTest.cpp:47-70") {
    def at(s: String) = Instant.parse(s)
    assert(!DetectionPipeline.isLastLoop(at("2024-03-01T10:00:00Z"), 120))
    assert(DetectionPipeline.isLastLoop(at("2024-03-01T22:00:00Z"), 120))  // == midnight
    assert(DetectionPipeline.isLastLoop(at("2024-03-01T23:30:00Z"), 120))
    assert(!DetectionPipeline.isLastLoop(at("2024-03-01T21:59:59Z"), 120))
    // exactly once per day at the 120-min cadence starting 00:30
    val fires = (0 until 12).map(i =>
      at("2024-03-01T00:30:00Z").plusSeconds(i * 7200L))
      .count(DetectionPipeline.isLastLoop(_, 120))
    assert(fires === 1)
  }

  test("E3 finalize + S6 partial upsert keep non-empty existing fields") {
    val rollup = Seq(
      ("s1", "Prog A", "300", "1920x1080", "hls", "", 10, 2),
      ("s2", "Prog B", "301", "", "", "mp3", 5, 5)
    ).toDF("url_id", "target_matching", "target_matching_id",
      "video_resolution", "streaming_protocol", "audio_format", "n_detection", "n_error")
      .withColumn("bitrate", lit(""))
      .withColumn("stream_length", lit(""))
      .withColumn("video_format", lit(""))
      .withColumn("audio_sampling_rate", lit(""))
    val programs = Seq(("77", "Prog A FHD")).toDF("id", "stream_name")
    val finalized = DetectionPipeline.finalizeDay(rollup, programs)
    val f = finalized.collect().map(r => r.getAs[String]("url_id") -> r).toMap
    assert(f("s1").getAs[Int]("flow_score") === 80)
    assert(f("s1").getAs[String]("target_matching_id") === "77") // rematched
    assert(f("s2").getAs[Int]("flow_score") === 0)   // all errors
    assert(f("s2").getAs[String]("target_matching_id") === "301") // kept

    val existing = Seq(
      ("s1", "http://x/s1", "Prog A", 0, "hls", "h264", "640x360", "aac", "44100", "300", 50, 4),
      ("s3", "http://x/s3", "Prog C", 0, "hls", "", "", "", "", "999", 10, 1)
    ).toDF("id", "url", "target_matching", "is_del", "stream_type",
      "video_format", "video_resolution", "audio_format", "audio_sampling_rate",
      "target_matching_id", "flow_score", "resolution_type")
    val merged = DetectionPipeline.upsertCatalog(existing, finalized)
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    val s1 = merged("s1")
    assert(s1.getAs[String]("video_resolution") === "1920x1080") // updated
    assert(s1.getAs[String]("video_format") === "h264")          // empty update → kept
    assert(s1.getAs[Int]("flow_score") === 80)                   // always written
    assert(s1.getAs[Int]("resolution_type") === 17)
    val s3 = merged("s3")
    assert(s3.getAs[Int]("flow_score") === 10)                   // untouched row
  }
}

class SessionWindowSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("ST8: session_window groups events within the gap (beyond-reference)") {
    val df = Seq(
      ("u1", "2024-03-01 10:00:00"), ("u1", "2024-03-01 10:03:00"), // one session
      ("u1", "2024-03-01 11:00:00"),                                 // new session
      ("u2", "2024-03-01 10:00:00")
    ).toDF("user", "ts_s").withColumn("ts", col("ts_s").cast("timestamp"))
    val sessions = df.groupBy(session_window(col("ts"), "5 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("n"))
      .as[(String, Long)].collect().toSet
    assert(sessions === Set(("u1", 2L), ("u1", 1L), ("u2", 1L)))
  }
}

class StatefulCountsSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import java.sql.Timestamp

  private def ev(urlId: String, item: Int, t: String) =
    graft.model.DetectionEvent(urlId, s"http://x/$urlId", item, "0", "", "", "", "",
      "", "", "", "", Timestamp.valueOf(t), "300", "Prog A")

  test("ST6: mapGroupsWithState carries counters across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.model.DetectionEvent]
    val q = DetectionPipeline.statefulRunningCounts(mem.toDS())
      .toDF("url_id", "n_error", "n_detection")
      .writeStream.outputMode("update")
      .format("memory").queryName("running_counts").start()
    mem.addData(ev("s1", 0, "2024-03-01 10:00:00"), ev("s1", 1001, "2024-03-01 10:01:00"))
    q.processAllAvailable()
    mem.addData(ev("s1", 1002, "2024-03-01 10:02:00"), ev("s2", 0, "2024-03-01 10:03:00"))
    q.processAllAvailable()
    q.stop()
    // update mode: take the LAST emission per stream
    val rows = spark.table("running_counts").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    val last = rows.zipWithIndex.groupBy(_._1._1).map { case (k, v) => v.maxBy(_._2)._1 }
    assert(last.toSet === Set(("s1", 2, 3), ("s2", 0, 1)))
  }
}

class StatefulAlertsSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import java.sql.Timestamp

  private def ev(urlId: String, item: Int, t: String) =
    graft.model.DetectionEvent(urlId, s"http://x/$urlId", item, "0", "", "", "", "",
      "", "", "", "", Timestamp.valueOf(t), "300", "Prog A")

  test("flatMapGroupsWithState fires exactly one alert at the threshold crossing") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.model.DetectionEvent]
    val q = DetectionPipeline.statefulErrorAlerts(mem.toDS(), alertThreshold = 2)
      .toDF("url_id", "n_error", "n_detection")
      .writeStream.outputMode("append")
      .format("memory").queryName("error_alerts").start()
    // batch 1: one error on s1 — below threshold, no alert
    mem.addData(ev("s1", 1001, "2024-03-01 10:00:00"), ev("s1", 0, "2024-03-01 10:00:30"))
    q.processAllAvailable()
    assert(spark.table("error_alerts").count() === 0)
    // batch 2: s1 crosses 2 errors → exactly one alert; s2 stays quiet
    mem.addData(ev("s1", 1002, "2024-03-01 10:01:00"), ev("s2", 0, "2024-03-01 10:01:10"))
    q.processAllAvailable()
    // batch 3: more s1 errors → already alerted, no re-fire
    mem.addData(ev("s1", 1003, "2024-03-01 10:02:00"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("error_alerts").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(rows.toSeq === Seq(("s1", 2, 3)))
  }
}

class StreamStreamJoinSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import java.sql.Timestamp

  test("watermarked interval join pairs errors with in-window clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val errs = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    def t(s: String) = Timestamp.valueOf(s)
    val joined = DetectionPipeline.errorClickJoin(
      errs.toDF().toDF("event_id", "user_id", "ts"),
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      lookbackSeconds = 60)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("err_click_pairs").start()
    clicks.addData(
      (10L, 1L, t("2024-03-01 10:00:00")),  // 30 s before the error: in window
      (11L, 1L, t("2024-03-01 09:58:00")),  // 150 s before: outside lookback
      (12L, 2L, t("2024-03-01 10:00:20")))  // other user
    errs.addData((100L, 1L, t("2024-03-01 10:00:30")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("err_click_pairs")
      .select("err_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got === Set((100L, 10L)))
  }
}

class StreamingDedupSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import java.sql.Timestamp

  private def ev(id: String, item: Int, t: String) =
    graft.model.DetectionEvent(id, s"http://x/$id", item, "0", "", "", "", "",
      "", "", "", "", Timestamp.valueOf(t), "300", "Prog A")

  test("streaming exact dedup: dropDuplicates with watermark suppresses replays") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.model.DetectionEvent]
    val deduped = mem.toDS().toDF()
      .withWatermark("created_time", "1 hour")
      .dropDuplicates("url_id", "created_time")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("deduped_events").start()
    mem.addData(
      ev("s1", 0, "2024-03-01 10:00:00"),
      ev("s1", 0, "2024-03-01 10:00:00"),   // same-batch duplicate
      ev("s2", 0, "2024-03-01 10:05:00"))
    q.processAllAvailable()
    mem.addData(ev("s1", 0, "2024-03-01 10:00:00")) // cross-batch replay
    q.processAllAvailable()
    q.stop()
    assert(spark.table("deduped_events").count() === 2)
  }
}

/** Streaming twins for the curation scan-side ops: hash sampling,
  * PII redaction and the C4 keep decision are pure row-local column
  * expressions, so the SAME code runs under readStream — and because
  * the sample decision is hash-keyed (not rand()), the streaming keep
  * set is IDENTICAL to the batch keep set over the same rows. */
class StreamingCurationSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.functions._
  import graft.ext.{Sampling, TextAnalysis}

  private val docs = Seq(
    (1L, "reach me at bob@example.com or 12345678 thanks a lot today."),
    (2L, "the quick brown fox jumps over the lazy dog again today."),
    (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed."),
    (4L, "short"),
    (5L, "a perfectly ordinary sentence that should sail through fine.")
  )

  private def curate(df: org.apache.spark.sql.DataFrame) =
    Sampling.hashSample(df, col("doc_id"), rate = 0.6)
      .select(col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("redacted"),
        TextAnalysis.c4Keep(
          TextAnalysis.wsTokenCount(col("text")),
          TextAnalysis.meanWordLen(col("text")),
          lower(col("text")).contains("lorem ipsum"),
          TextAnalysis.bulletLineCount(col("text")),
          size(TextAnalysis.lines(col("text")))).as("keep"))

  test("streaming curation pipeline matches batch row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = curate(mem.toDS().toDF("doc_id", "text"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("curated").start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curated")
      .as[(Long, String, Int)].collect().toSet
    val batch = curate(docs.toDF("doc_id", "text"))
      .as[(Long, String, Int)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty) // the 0.6 hash sample keeps some of 5 docs
    // redaction visibly applied on any surviving PII doc
    streamed.find(_._1 == 1L).foreach { r =>
      assert(r._2.contains("<EMAIL>") && r._2.contains("<ID>"))
    }
  }
}

class AnomalyStreamSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import graft.streaming.AnomalyStream
  import graft.streaming.AnomalyStream.BucketCount

  private def b(key: Long, hour: Int, cnt: Long) = BucketCount(
    key, java.sql.Timestamp.valueOf(f"2024-06-01 $hour%02d:00:00"), cnt)

  test("spike alerts once on arrival with the batch z formula; steady keys stay silent") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BucketCount]
    val q = AnomalyStream.alerts(mem.toDS(), flagAt = 1.4, minHistory = 4)
      .writeStream.outputMode("append").format("memory").queryName("rate_alerts").start()
    // history for key 1: 2,2,2,6 (same fixture as RateAnomalySpec:
    // mean 3, sample std 2); key 2 constant
    mem.addData(b(1, 0, 2), b(1, 1, 2), b(1, 2, 2), b(1, 3, 6),
      b(2, 0, 3), b(2, 1, 3), b(2, 2, 3), b(2, 3, 3), b(2, 4, 3))
    q.processAllAvailable()
    // next batch: key 1 gets cnt=6 against history (2,2,2,6):
    // n=4, s=12, ss=48 -> var=(4*48-144)/12=4, std 2, z=(6-3)/2=1.5 -> alert
    mem.addData(b(1, 4, 6), b(2, 5, 3))
    q.processAllAvailable()
    q.stop()
    val alerts = spark.table("rate_alerts")
      .as[AnomalyStream.RateAlert].collect().toSeq
    assert(alerts.map(a => (a.key, a.cnt, a.z)) === Seq((1L, 6L, 1.5)))
  }
}

class FunnelStreamSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import graft.streaming.FunnelStream
  import graft.streaming.FunnelStream.StepEvent

  test("stage advances fire once, in order; out-of-order steps don't advance") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StepEvent]
    val q = FunnelStream.advances(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("funnel_adv").start()
    // user 1 completes across two batches; user 2's step 3 precedes its
    // step 2 acceptance time -> never reaches stage 3; duplicate step 1
    // is ignored
    mem.addData(StepEvent(1, 10, 1), StepEvent(1, 20, 2), StepEvent(2, 10, 1),
      StepEvent(2, 30, 2), StepEvent(2, 20, 3))
    q.processAllAvailable()
    mem.addData(StepEvent(1, 30, 3), StepEvent(1, 40, 1))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_adv")
      .as[FunnelStream.StageAdvance].collect().toSeq
      .map(a => (a.user, a.stage, a.tus)).sorted
    assert(got === Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L),
      (2L, 1, 10L), (2L, 2, 30L)))
    // batch equivalence on the same (in-order) event set
    val batchStages = graft.ops.EventAnalytics.funnel3(
      Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), (1L, 40L, "a"),
        (2L, 10L, "a"), (2L, 30L, "b"), (2L, 20L, "c"))
        .toDF("user_id", "tus_raw", "et")
        .select(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.col("tus_raw")).as("ts"),
          org.apache.spark.sql.functions.col("et")),
      org.apache.spark.sql.functions.col("user_id"),
      org.apache.spark.sql.functions.col("ts"),
      org.apache.spark.sql.functions.col("et"), "a", "b", "c")
      .select("user_id", "stage").as[(Long, Int)].collect().toMap
    val streamStages = got.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(streamStages === batchStages)
  }

  test("reorder buffer: fully shuffled arrival matches batch funnel3 exactly") {
    implicit val sqlCtx = spark.sqlContext
    def s(sec: Long): Long = sec * 1000000L // event times at seconds scale (watermark is ms-granular)
    val mem = MemoryStream[StepEvent]
    val q = FunnelStream.advancesReordered(mem.toDS(), maxDelay = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("funnel_reord").start()
    // user 1 arrives fully REVERSED across batches; user 2's step 2
    // arrives a batch before its step 1 (the case the fast path cannot
    // credit); user 3 is in-order but its step 3 predates its step 2
    mem.addData(StepEvent(1, s(30), 3), StepEvent(2, s(40), 2))
    q.processAllAvailable()
    mem.addData(StepEvent(1, s(20), 2), StepEvent(3, s(5), 1),
      StepEvent(3, s(15), 2), StepEvent(3, s(12), 3))
    q.processAllAvailable()
    mem.addData(StepEvent(1, s(10), 1), StepEvent(2, s(20), 1))
    q.processAllAvailable()
    // nothing finalized yet: the watermark (max event time - 10 min) is
    // still below every buffered event
    assert(spark.table("funnel_reord").where("user < 99").count() === 0L)
    // two far-future sentinel batches: the first advances the watermark
    // past every real event, the second gives the engine a batch in
    // which the armed event-time timeouts fire and flush the buffers
    mem.addData(StepEvent(99, s(7200), 1))
    q.processAllAvailable()
    mem.addData(StepEvent(99, s(7201), 1))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_reord")
      .as[FunnelStream.StageAdvance].collect().toSeq
      .filter(_.user < 99)
      .map(a => (a.user, a.stage, a.tus)).sorted
    assert(got === Seq(
      (1L, 1, s(10)), (1L, 2, s(20)), (1L, 3, s(30)),
      (2L, 1, s(20)), (2L, 2, s(40)),
      (3L, 1, s(5)), (3L, 2, s(15))))
    // exact batch parity: same events through funnel3 (t1/t2/t3 AND stage)
    import org.apache.spark.sql.functions.{col => c, timestamp_micros}
    val batch = graft.ops.EventAnalytics.funnel3(
      Seq((1L, s(30), "c"), (1L, s(20), "b"), (1L, s(10), "a"),
        (2L, s(40), "b"), (2L, s(20), "a"),
        (3L, s(5), "a"), (3L, s(15), "b"), (3L, s(12), "c"))
        .toDF("user_id", "tus_raw", "et")
        .select(c("user_id"), timestamp_micros(c("tus_raw")).as("ts"), c("et")),
      c("user_id"), c("ts"), c("et"), "a", "b", "c")
      .select("user_id", "t1", "t2", "t3")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().toSeq.sorted
    val streamTimes = got.groupBy(_._1).toSeq.map { case (u, rows) =>
      val byStage = rows.map(r => r._2 -> r._3).toMap
      (u, byStage.get(1), byStage.get(2), byStage.get(3))
    }.sorted
    assert(streamTimes === batch)
  }
}
