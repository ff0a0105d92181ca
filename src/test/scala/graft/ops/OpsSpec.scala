package graft.ops

import graft.SparkSpec
import graft.model.{ErrorCode, ResolutionDim}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit specs for the reference-semantics operators (SURVEY.md §5.2):
  * score truncation/clamp edges, "0x0" override, resolution fallback,
  * FHD/HD match-miss keeping the old id, bucket boundaries.
  */
class FlowScoreSpec extends SparkSpec {
  test("score truncates like C++ (int) and clamps at 0 — StreamTest.cpp:987-996") {
    assert(FlowScore.score(3, 1) === 66)   // 66.67 truncated, not rounded
    assert(FlowScore.score(3, 0) === 100)
    assert(FlowScore.score(3, 3) === 0)
    assert(FlowScore.score(0, 0) === 0)    // no detections → 0
    assert(FlowScore.score(0, 5) === 0)
    assert(FlowScore.score(7, 2) === 71)   // 71.43 → 71
  }

  test("column twin matches the Scala twin on a grid") {
    import spark.implicits._
    val grid = for (d <- 0 to 10; e <- 0 to 12) yield (d, e)
    val df = grid.toDF("det", "err")
      .withColumn("s", FlowScore.score(col("det"), col("err")))
    val got = df.collect().map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2))).toMap
    grid.foreach { case (d, e) =>
      assert(got((d, e)) === FlowScore.score(d, e), s"det=$d err=$e")
    }
  }
}

class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: String, seq: Long, item: Int, res: String, proto: String = "") =
    (id, seq, item, res, proto)

  private def roll(rows: Seq[(String, Long, Int, String, String)]) = {
    val df = rows
      .toDF("url_id", "seq", "item", "video_resolution", "streaming_protocol")
      .withColumn("flow_address", lit(""))
      .withColumn("target_matching", lit(""))
      .withColumn("target_matching_id", lit(""))
      .withColumn("bitrate", lit(""))
      .withColumn("stream_length", lit(""))
      .withColumn("video_format", lit(""))
      .withColumn("audio_format", lit(""))
      .withColumn("audio_sampling_rate", lit(""))
    DetectionRollup.rollup(df, col("seq"))
  }

  test("first non-empty in arrival order — StreamTest.cpp:847-901") {
    val out = roll(Seq(
      ev("s1", 1, 0, "", ""),
      ev("s1", 2, 0, "", "hls"),
      ev("s1", 3, 0, "", "flv"))).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("streaming_protocol") === "hls")
  }

  test("0x0 placeholder is overwritten by the next value — StreamTest.cpp:903-910") {
    val a = roll(Seq(ev("s", 1, 0, "0x0"), ev("s", 2, 0, "1920x1080"))).collect().head
    assert(a.getAs[String]("video_resolution") === "1920x1080")
    // placeholder then empty then real: reference ends at the real value
    val b = roll(Seq(ev("s", 1, 0, "0x0"), ev("s", 2, 0, ""), ev("s", 3, 0, "640x360")))
      .collect().head
    assert(b.getAs[String]("video_resolution") === "640x360")
    // nothing but placeholders/empties: last value wins
    val c = roll(Seq(ev("s", 1, 0, "0x0"), ev("s", 2, 0, ""))).collect().head
    assert(c.getAs[String]("video_resolution") === "")
    val d = roll(Seq(ev("s", 1, 0, ""), ev("s", 2, 0, "0x0"))).collect().head
    assert(d.getAs[String]("video_resolution") === "0x0")
    // real value is never overwritten
    val e = roll(Seq(ev("s", 1, 0, "1280x720"), ev("s", 2, 0, "0x0"))).collect().head
    assert(e.getAs[String]("video_resolution") === "1280x720")
  }

  test("16-way pivot + error/detection counts — StreamTest.cpp:912-936") {
    val rows = ErrorCode.errorCodes.zipWithIndex.map { case (code, i) =>
      ev("s", i + 10L, code, "")
    } ++ Seq(ev("s", 1, 0, ""), ev("s", 2, 0, ""))
    val out = roll(rows).collect().head
    ErrorCode.counterColumns.foreach { case (_, name) =>
      assert(out.getAs[Int](name) === 1, name)
    }
    assert(out.getAs[Int]("n_error") === 16)
    assert(out.getAs[Int]("n_detection") === 18)
  }
}

class RematchSpec extends SparkSpec {
  import spark.implicits._

  test("resolution classify: exact map, UNKNOWN, CUSTOM — StreamTest.h:181-194") {
    assert(ResolutionDim.classify("1920x1080") === 17)
    assert(ResolutionDim.classify("160x120") === 2)
    assert(ResolutionDim.classify("8192x4320") === 26)
    assert(ResolutionDim.classify("") === 1)
    assert(ResolutionDim.classify("0x0") === 1)
    assert(ResolutionDim.classify("123x456") === 27)
    // column twin agrees
    val vals = ResolutionDim.byString.map(_._1) ++ Seq("", "0x0", "999x999")
    val got = vals.toDF("r")
      .withColumn("t", ProgramRematch.resolutionType(col("r")))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    vals.foreach(v => assert(got(v) === ResolutionDim.classify(v), v))
  }

  test("FHD suffix for >=1080p, HD otherwise; miss keeps old id — StreamTest.cpp:998-1023") {
    val scored = Seq(
      ("u1", "News", "old1", "1920x1080"),  // FHD match → 11
      ("u2", "News", "old2", "640x360"),    // HD match → 12
      ("u3", "Sports", "old3", "1920x1080"),// no "Sports FHD" in dim → keep old3
      ("u4", "Movies", "old4", "")          // UNKNOWN → HD suffix, no match → old4
    ).toDF("url_id", "target_matching", "target_matching_id", "video_resolution")
    val programs = Seq(("11", "News FHD"), ("12", "News HD"), ("13", "Sports HD x"))
      .toDF("id", "stream_name")
    val out = ProgramRematch.rematch(scored, programs)
      .select("url_id", "target_matching_id", "resolution_type", "is_fhd")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(out("u1") === (("11", 17, true)))
    assert(out("u2") === (("12", 4, false)))
    assert(out("u3") === (("old3", 17, true)))
    assert(out("u4") === (("old4", 1, false)))
  }

  test("unmatched streams surface via left-anti") {
    val scored = Seq(("u3", "Sports", "old3", "1920x1080"))
      .toDF("url_id", "target_matching", "target_matching_id", "video_resolution")
    val programs = Seq(("11", "News FHD")).toDF("id", "stream_name")
    assert(ProgramRematch.unmatched(scored, programs).count() === 1)
  }
}

class VendorStatsSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    VendorStats.VendorRule(Seq("http://a.example:80/"), "Vendor A"),
    VendorStats.VendorRule(Seq("http://b.example:80/", "http://b2.example:80/"), "Vendor B"))

  test("bucket boundaries 59/60/80/81/100 + filters — StreamTest.cpp:441-464") {
    val rows = Seq(
      ("1", "http://a.example:80/s1", "300", 0, "hls", 59),   // lt60
      ("2", "http://a.example:80/s2", "300", 0, "hls", 60),   // 60-80
      ("3", "http://a.example:80/s3", "300", 0, "hls", 80),   // 60-80 (inclusive)
      ("4", "http://a.example:80/s4", "300", 0, "hls", 81),   // 80-100
      ("5", "http://a.example:80/s5", "300", 0, "hls", 100),  // 80-100
      ("6", "http://b.example:80/s6", "300", 0, "hls", 10),   // vendor B
      ("7", "http://b2.example:80/s7", "300", 0, "hls", 90),  // vendor B (2nd prefix)
      ("8", "http://c.example:80/s8", "300", 0, "hls", 50),   // Other → excluded by IN
      ("9", "http://a.example:80/s9", "100", 0, "hls", 50),   // id < 237 → filtered
      ("10", "http://a.example:80/s10", "300", 1, "hls", 50), // is_del → filtered
      ("11", "http://a.example:80/s11", "300", 0, "XXX", 50), // stream_type → filtered
      ("12", "http://a.example:80/s12", "", 0, "hls", 50),    // empty id → excluded, not an ANSI error
      ("13", "http://a.example:80/s13", "oops", 0, "hls", 50) // non-numeric id → excluded (MySQL coercion)
    ).toDF("id", "url", "target_matching_id", "is_del", "stream_type", "flow_score")
    val out = VendorStats.vendorFlowStats(rows, rules)
      .collect().map(r => r.getAs[String]("vendor") -> r).toMap
    val a = out("Vendor A")
    assert(a.getAs[Int]("count_lt60") === 1)
    assert(a.getAs[Int]("count_60_80") === 2)
    assert(a.getAs[Int]("count_80_100") === 2)
    assert(a.getAs[Int]("total") === 5)
    assert(a.getAs[Double]("pct_lt60") === 20.0)
    val b = out("Vendor B")
    assert(b.getAs[Int]("total") === 2)
    assert(b.getAs[Double]("pct_60_80") === 0.0)
    assert(!out.contains("Other"))
  }
}

class ProgramHealthSpec extends SparkSpec {
  import spark.implicits._

  test("HAVING MAX(score)<=60 + semi-join + distinct — StreamTest.cpp:625-638") {
    val sources = Seq(
      ("a", "300", 0, "hls", 50), ("b", "300", 0, "hls", 60),  // prog 300: max 60 → weak
      ("c", "301", 0, "hls", 50), ("d", "301", 0, "hls", 61),  // prog 301: max 61 → healthy
      ("e", "100", 0, "hls", 10),                               // below floor → excluded
      ("f", "302", 1, "hls", 10),                               // deleted → excluded
      ("g", "303", 0, "XXX", 10)                                // XXX → excluded
    ).toDF("id", "target_matching_id", "is_del", "stream_type", "flow_score")
    val programs = Seq(("300", "Weak One"), ("301", "Healthy"), ("302", "Gone"))
      .toDF("id", "stream_name")
    val got = ProgramHealth.weakPrograms(sources, programs).as[String].collect().toSeq
    assert(got === Seq("Weak One"))
  }
}

class BatchingSpec extends SparkSpec {
  import spark.implicits._

  test("rows chunk 30-per-batch with batch ids and counts — StreamTest.cpp:516-531") {
    val df = (1 to 65).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    val out = Batching.withBatches(df, Seq(col("k")), 30)
      .select("k", "rn", "batch_id", "batch_rows", "n_batches")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4)))
    assert(out.length === 65)
    val byK = out.map(t => t._1 -> t).toMap
    assert(byK(1L) === ((1L, 1, 1, 30L, 3)))
    assert(byK(30L) === ((30L, 30, 1, 30L, 3)))
    assert(byK(31L) === ((31L, 31, 2, 30L, 3)))
    assert(byK(65L) === ((65L, 65, 3, 5L, 3)))
    // every row lands in exactly one batch (ScalaCheck-style invariant)
    assert(out.map(_._2).toSet === (1 to 65).toSet)
  }

  test("two-phase rank at volume: 5M rows, rn is the exact sort position") {
    import org.apache.spark.sql.functions._
    // shuffled input across 32 partitions; rank must equal id+1 after the
    // range sort, with no single-task funnel (zipWithIndex offsets)
    val df = spark.range(0, 5000000, 1, 32)
      .select((col("id") * 2654435761L % 5000000).as("noise"), col("id"))
    val out = Batching.withBatches(df, Seq(col("id")), 30000)
    val bad = out.where(col("rn") =!= col("id") + 1).count()
    assert(bad === 0L)
    val nb = out.select(max(col("n_batches"))).head().getInt(0)
    assert(nb === math.ceil(5000000 / 30000.0).toInt)
    // the rank must stay inside Catalyst: no RDD round-trip in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD"), plan.take(2000))
  }

  test("driver-side chunk covers all rows exactly once") {
    val chunks = Batching.chunk((1 to 7).toSeq, 3)
    assert(chunks.map(_.size) === Seq(3, 3, 1))
    assert(chunks.flatten === (1 to 7).toSeq)
  }
}

class ErrorMessagesSpec extends SparkSpec {
  import spark.implicits._
  import graft.model.ErrorCode

  test("typedlit map lookup resolves every code; unknown coalesces — StreamTest.h:59-77") {
    val codes = (ErrorCode.messages.keys.toSeq :+ 9999).toDF("item")
    val got = ErrorMessages.withErrorMessage(codes)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    ErrorCode.messages.foreach { case (c, m) => assert(got(c) === m, c) }
    assert(got(9999) === "unknown error")
  }

  test("F5: from_json MapType round-trip with map_keys/map_values") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{MapType, StringType}
    val df = Seq("""{"k": 12, "v": "x"}""").toDF("props")
      .withColumn("m", from_json(col("props"), MapType(StringType, StringType)))
    val r = df.select(
      map_keys(col("m")).as("ks"), map_values(col("m")).as("vs"),
      to_json(col("m")).as("re")).collect().head
    assert(r.getSeq[String](0) === Seq("k", "v"))
    assert(r.getSeq[String](1) === Seq("12", "x"))
    assert(r.getString(2) === """{"k":"12","v":"x"}""")
  }
}

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of picks the latest right row at or before the left time") {
    val left = Seq((1L, "u", "2024-01-01 10:00:00"), (2L, "u", "2024-01-01 12:00:00"),
      (3L, "u", "2024-01-01 08:00:00"), (4L, "v", "2024-01-01 10:00:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val right = Seq((10L, "u", "2024-01-01 09:00:00"), (11L, "u", "2024-01-01 10:00:00"),
      (12L, "u", "2024-01-01 11:00:00"), (13L, "w", "2024-01-01 01:00:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val got = AsofJoin.asof(left, right, "user_id", "ts", "ts", "event_id", "event_id")
      .select("event_id", "asof_event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(1L) === 11L)  // simultaneous right row IS visible (<=)
    assert(got(2L) === 12L)  // latest before noon
    assert(got(3L) === -1L)  // nothing before 08:00
    assert(got(4L) === -1L)  // no rows for that user
  }

  test("asofNearest: |Δt|-closest wins, ties go backward, exact match is distance 0") {
    val left = Seq((1L, "u", 90L), (2L, "u", 150L), (3L, "u", 100L),
      (4L, "u", 300L), (5L, "v", 10L))
      .toDF("event_id", "user_id", "us")
      .withColumn("ts", expr("timestamp_micros(1704067200000000 + us)"))
    val right = Seq((10L, "u", 100L), (11L, "u", 200L))
      .toDF("event_id", "user_id", "us")
      .withColumn("ts", expr("timestamp_micros(1704067200000000 + us)"))
    val got = AsofJoin.asofNearest(left, right, "user_id", "ts", "ts",
        "event_id", "event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) "-" else r.getString(3))).toMap
    assert(got(1L) === ((10L, 10L, "f")))   // only forward exists
    assert(got(2L) === ((10L, 50L, "b")))   // 50 vs 50: backward wins tie
    assert(got(3L) === ((10L, 0L, "b")))    // exact match, distance 0
    assert(got(4L) === ((11L, 100L, "b")))  // only backward exists
    assert(got(5L) === ((-1L, -1L, "-")))   // key with no right rows
  }
}

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val large = (1 to 500).map(i => (i.toLong, if (i % 10 == 0) "hot" else s"k$i"))
      .toDF("id", "key")
    val small = Seq(("hot", "H"), ("k7", "A"), ("k13", "B")).toDF("key", "v")
    val plain = large.join(small, Seq("key")).select("id", "v")
      .as[(Long, String)].collect().toSet
    val salted = Salting.saltedJoin(large, small, "key", "id", 8)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(salted === plain)
    assert(salted.size === 52) // 50 hot + k7 + k13
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._
  import java.sql.Timestamp

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("binned range join == naive range join (randomized, multi-bin intervals)") {
    val rnd = new scala.util.Random(7)
    val points = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(5).toLong, ts(rnd.nextInt(100000).toLong)) }
      .toDF("event_id", "user_id", "ts")
    val intervals = (0 until 120).map { i =>
      val start = rnd.nextInt(100000).toLong
      // lengths from sub-bin to several bins (bin = 1800 s)
      (1000L + i, rnd.nextInt(5).toLong, ts(start), ts(start + rnd.nextInt(7000)))
    }.toDF("iv_id", "user_id", "w_start", "w_end")
    val binned = RangeJoin.pointInInterval(points, intervals,
        "user_id", "ts", "w_start", "w_end", binSeconds = 1800)
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, Seq("user_id"))
      .where(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(binned === naive)
    assert(naive.nonEmpty)
  }

  test("boundaries: start inclusive, end exclusive, bin-edge points match") {
    val points = Seq(
      (1L, 1L, ts(3600)),   // exactly at start -> in
      (2L, 1L, ts(5399)),   // last second -> in
      (3L, 1L, ts(5400)),   // exactly at end -> out
      (4L, 1L, ts(3599)),   // just before -> out
      (5L, 2L, ts(3600))    // other key -> out
    ).toDF("event_id", "user_id", "ts")
    val intervals = Seq((100L, 1L, ts(3600), ts(5400)))
      .toDF("iv_id", "user_id", "w_start", "w_end")
    val got = RangeJoin.pointInInterval(points, intervals,
        "user_id", "ts", "w_start", "w_end", binSeconds = 1800)
      .select("event_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }

  test("plan: equi-join on (key, bin), no nested-loop join") {
    val points = Seq((1L, 1L, ts(100))).toDF("event_id", "user_id", "ts")
    val intervals = Seq((2L, 1L, ts(50), ts(150)))
      .toDF("iv_id", "user_id", "w_start", "w_end")
    val plan = RangeJoin.pointInInterval(points, intervals,
        "user_id", "ts", "w_start", "w_end", binSeconds = 60)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan.take(2000))
  }

  test("interval overlap == naive overlap join, each pair exactly once") {
    val rnd = new scala.util.Random(11)
    // lengths from sub-bin to several bins so pairs share many bins
    val left = (0 until 150).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i.toLong, rnd.nextInt(4).toLong, ts(s), ts(s + 1 + rnd.nextInt(6000)))
    }.toDF("l_id", "user_id", "l_start", "l_end")
    val right = (0 until 150).map { i =>
      val s = rnd.nextInt(100000).toLong
      (1000L + i, rnd.nextInt(4).toLong, ts(s), ts(s + 1 + rnd.nextInt(6000)))
    }.toDF("r_id", "user_id", "r_start", "r_end")
    val got = RangeJoin.intervalOverlap(left, right, "user_id",
        "l_start", "l_end", "r_start", "r_end", binSeconds = 1800)
      .select("l_id", "r_id").as[(Long, Long)].collect()
    val naive = left.join(right, Seq("user_id"))
      .where(col("l_start") < col("r_end") && col("r_start") < col("l_end"))
      .select("l_id", "r_id").as[(Long, Long)].collect()
    // toSet equality AND length equality: multi-bin pairs must not
    // be emitted once per shared bin
    assert(got.toSet === naive.toSet)
    assert(got.length === naive.length)
    assert(naive.nonEmpty)
  }

  test("interval overlap boundaries: half-open, touching intervals miss") {
    val left = Seq((1L, 1L, ts(1000), ts(2000))).toDF("l_id", "user_id", "l_start", "l_end")
    val right = Seq(
      (10L, 1L, ts(2000), ts(3000)), // touches at l_end -> out (half-open)
      (11L, 1L, ts(1999), ts(3000)), // 1 s overlap -> in
      (12L, 1L, ts(0), ts(1000)),    // touches at l_start -> out
      (13L, 1L, ts(0), ts(1001)),    // 1 s overlap -> in
      (14L, 2L, ts(1000), ts(2000))  // other key -> out
    ).toDF("r_id", "user_id", "r_start", "r_end")
    val got = RangeJoin.intervalOverlap(left, right, "user_id",
        "l_start", "l_end", "r_start", "r_end", binSeconds = 600)
      .select("r_id").as[Long].collect().toSet
    assert(got === Set(11L, 13L))
  }

  test("interval overlap plan: no nested-loop join") {
    val left = Seq((1L, 1L, ts(0), ts(100))).toDF("l_id", "user_id", "l_start", "l_end")
    val right = Seq((2L, 1L, ts(50), ts(150))).toDF("r_id", "user_id", "r_start", "r_end")
    val plan = RangeJoin.intervalOverlap(left, right, "user_id",
        "l_start", "l_end", "r_start", "r_end", binSeconds = 60)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan.take(2000))
  }
}

class StreamingRangeJoinSpec extends SparkSpec {
  import spark.implicits._
  import java.sql.Timestamp
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("range join is streaming-compatible: stream points vs static intervals") {
    // the binned form is a stateless explode + equi-join + filter, so it
    // plans as a plain stream-static join — no watermark, no state store
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val points = mem.toDS().toDF("event_id", "user_id", "ts")
    val intervals = Seq((100L, 1L, ts(1000), ts(2000)), (200L, 2L, ts(0), ts(500)))
      .toDF("iv_id", "user_id", "w_start", "w_end")
    val joined = RangeJoin.pointInInterval(points, intervals,
      "user_id", "ts", "w_start", "w_end", binSeconds = 600)
    val q = joined.select("event_id", "iv_id").writeStream
      .format("memory").queryName("srj_out").outputMode("append").start()
    try {
      mem.addData((1L, 1L, ts(1500)), (2L, 1L, ts(2500)), (3L, 2L, ts(100)))
      q.processAllAvailable()
      val got = spark.table("srj_out").as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 100L), (3L, 200L)))
    } finally q.stop()
  }
}

class StreamingIncrementalDedupSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.functions._

  test("stream-static anti join dedups a doc stream against the history store") {
    // the streaming twin of x30: new docs arrive as a stream, the
    // historical corpus is a static digest table - dropDuplicates only
    // sees the stream, the anti join sees all of history
    implicit val sqlCtx = spark.sqlContext
    val history = Seq("seen one", "seen two").toDF("text")
      .select(md5(col("text")).as("content_hash"))
    val mem = MemoryStream[(Long, String)]
    val fresh = mem.toDS().toDF("doc_id", "text")
      .withColumn("content_hash", md5(col("text")))
      .join(history, Seq("content_hash"), "left_anti")
    val q = fresh.select("doc_id").writeStream
      .format("memory").queryName("sid_out").outputMode("append").start()
    try {
      mem.addData((10L, "seen one"), (11L, "fresh stuff"), (12L, "seen two"), (13L, "more new"))
      q.processAllAvailable()
      val got = spark.table("sid_out").as[Long].collect().toSet
      assert(got === Set(11L, 13L))
    } finally q.stop()
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def ev(id: Long, user: Long, sec: Long) =
    (id, user, new java.sql.Timestamp(sec * 1000L))

  test("gap splits sessions; boundary-equal gap still merges (session_window semantics)") {
    // user 1: events at 0s, 10s, 10+1800s (EXACTLY the gap -> MERGES,
    // like session_window's next <= last+gap rule), then +1801s -> new
    // session. user 2: one event.
    val df = Seq(
      ev(1, 1L, 0), ev(2, 1L, 10), ev(3, 1L, 1810), ev(4, 1L, 3611),
      ev(5, 2L, 50)
    ).toDF("event_id", "user_id", "ts")
    val got = graft.ops.Sessionize.sessionize(
      df, col("user_id"), col("ts"), col("event_id"), gapMicros = 1800000000L)
      .orderBy("key", "session_seq")
      .select("key", "session_seq", "n_events", "duration_secs")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1, 3L, 1810L), (1L, 2, 1L, 0L), (2L, 1, 1L, 0L)))
  }

  test("timestamp ties are totally ordered by the order column") {
    val df = Seq(ev(2, 1L, 100), ev(1, 1L, 100)).toDF("event_id", "user_id", "ts")
    val got = graft.ops.Sessionize.sessionize(
      df, col("user_id"), col("ts"), col("event_id"), gapMicros = 1L)
      .select("n_events").as[Long].collect().toSeq
    assert(got === Seq(2L)) // same instant -> gap 0 <= 1 -> one session
  }
}

class RateAnomalySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("z-scores match hand computation; constant-rate keys get z=0") {
    // user 1: hourly counts 2,2,2,6 -> mean 3, sample var (n*ss-s*s)/(n*(n-1))
    //   = (4*48 - 144)/12 = 4 -> std 2 -> z of the 6-bucket = 1.5
    // user 2: constant counts -> varNum = 0 -> z = 0
    def t(h: Int, m: Int) = new java.sql.Timestamp(
      java.time.Instant.parse(f"2024-01-01T$h%02d:$m%02d:00Z").toEpochMilli)
    val rows =
      (0 until 2).map(m => (1L, t(0, m))) ++
      (0 until 2).map(m => (1L, t(1, m))) ++
      (0 until 2).map(m => (1L, t(2, m))) ++
      (0 until 6).map(m => (1L, t(3, m))) ++
      (0 until 3).map(m => (2L, t(0, m))) ++
      (0 until 3).map(m => (2L, t(1, m)))
    val df = rows.toDF("user_id", "ts")
    val got = graft.ops.RateAnomaly.rateZscores(
      df, col("user_id"), col("ts"), "hour")
      .orderBy("key", "bucket")
      .select("key", "cnt", "z", "is_outlier")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val u1 = got.filter(_._1 == 1L)
    assert(u1.map(_._2) === Seq(2L, 2L, 2L, 6L))
    assert(u1.map(_._3) === Seq(-0.5, -0.5, -0.5, 1.5))
    assert(u1.map(_._4) === Seq(0, 0, 0, 0)) // 1.5 < 2.5
    val u2 = got.filter(_._1 == 2L)
    assert(u2.map(_._3) === Seq(0.0, 0.0))
  }
}

class SessionizeEquivalenceSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("batch Sessionize groups events exactly like the built-in session_window") {
    // random-ish fixture: 3 users, bursts split by >10-minute silences
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, 10L, t("2024-05-01 08:00:00")), (2L, 10L, t("2024-05-01 08:04:00")),
      (3L, 10L, t("2024-05-01 08:30:00")),                       // new session
      (4L, 20L, t("2024-05-01 09:00:00")),
      (5L, 20L, t("2024-05-01 09:09:59")),                       // inside gap
      (6L, 20L, t("2024-05-01 09:19:59")),                       // EXACTLY prev+gap -> MERGES in both
      (7L, 30L, t("2024-05-01 00:00:00"))
    ).toDF("event_id", "user_id", "ts")
    // built-in: session extends while the next event starts within the gap
    // of the previous one; window end = last ts + gap
    val builtin = rows
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("start"), max(col("ts")).as("end"))
      .select("user_id", "start", "end", "n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    val batch = graft.ops.Sessionize.sessionize(
      rows, col("user_id"), col("ts"), col("event_id"), gapMicros = 600000000L)
      .select(col("key"), col("session_start"), col("session_end"), col("n_events"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    assert(batch === builtin)
  }
}

class SessionizeRandomSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("random fixtures: event counts conserved, consecutive sessions separated by > gap") {
    val rnd = new scala.util.Random(7)
    val gapMicros = 600L * 1000000L // 10 min
    for (_ <- 1 to 3) {
      val rows = (1 to 300).map { i =>
        (i.toLong, (rnd.nextInt(5) + 1).toLong,
          new java.sql.Timestamp(rnd.nextInt(100000) * 1000L))
      }
      val df = rows.toDF("event_id", "user_id", "ts")
      val sess = graft.ops.Sessionize.sessionize(
        df, col("user_id"), col("ts"), col("event_id"), gapMicros)
        .select(col("key"), col("session_seq"),
          unix_micros(col("session_start")).as("st"),
          unix_micros(col("session_end")).as("en"),
          col("n_events"), col("duration_secs"))
        .as[(Long, Int, Long, Long, Long, Long)].collect()
      // conservation: every event lands in exactly one session
      assert(sess.map(_._5).sum === 300L)
      sess.foreach { case (_, _, st, en, _, dur) =>
        assert(en >= st && dur === (en - st) / 1000000L)
      }
      // separation: next session of the same key starts > gap after prev end
      sess.groupBy(_._1).foreach { case (_, ss) =>
        val ordered = ss.sortBy(_._2)
        assert(ordered.map(_._2).toSeq === (1 to ordered.length).toSeq)
        ordered.sliding(2).foreach {
          case Array(a, b) => assert(b._3 - a._4 > gapMicros)
          case _ =>
        }
      }
    }
  }
}

class RateAnomalyRandomSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("random fixtures: z-scores match a driver-side reference computation") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { i =>
      (i.toLong, (rnd.nextInt(4) + 1).toLong,
        new java.sql.Timestamp(
          java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime +
            rnd.nextInt(48) * 3600000L + rnd.nextInt(3600000)))
    }
    val df = rows.toDF("event_id", "user_id", "ts")
    val got = graft.ops.RateAnomaly.rateZscores(df, col("user_id"), col("ts"), "hour")
      .select(col("key"), col("bucket").cast("long"), col("cnt"), col("z"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // reference: group driver-side, same integer-exact formula
    val ref = rows.groupBy(r => (r._2, r._3.getTime / 3600000L * 3600L))
      .map { case (k, es) => k -> es.size.toLong }
    ref.groupBy(_._1._1).foreach { case (_, buckets) =>
      val cnts = buckets.values.toSeq
      val n = cnts.size.toLong
      val s = cnts.sum
      val ss = cnts.map(c => c * c).sum
      buckets.foreach { case ((user, sec), cnt) =>
        val (gc, gz) = got((user, sec))
        assert(gc === cnt)
        val varNum = n * ss - s * s
        val expected =
          if (n > 1 && varNum > 0)
            (cnt.toDouble - s.toDouble / n.toDouble) /
              math.sqrt(varNum.toDouble / (n * (n - 1)).toDouble)
          else 0.0
        assert(gz === expected)
      }
    }
  }
}

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def e(u: Long, sec: Long, t: String) =
    (u, new java.sql.Timestamp(sec * 1000L), t)

  test("funnel: steps must occur in order; out-of-order steps don't count") {
    val rows = Seq(
      // user 1: full ordered funnel
      e(1, 10, "signup"), e(1, 20, "click"), e(1, 30, "purchase"),
      // user 2: purchase BEFORE the click -> stage 2
      e(2, 10, "signup"), e(2, 30, "click"), e(2, 20, "purchase"),
      // user 3: click before signup doesn't count -> stage 1
      e(3, 5, "click"), e(3, 10, "signup"),
      // user 4: never signed up -> excluded
      e(4, 10, "click"), e(4, 20, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = graft.ops.EventAnalytics.funnel3(
      rows, col("user_id"), col("ts"), col("event_type"),
      "signup", "click", "purchase")
      .select("user_id", "stage").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 3, 2L -> 2, 3L -> 1))
  }

  test("retention: cohort day 0 always contains the user; offsets count distinct days") {
    val rows = Seq(
      e(1, 0, "view"), e(1, 86400 + 5, "view"), e(1, 86400 + 9, "view"),
      e(2, 86400, "view")
    ).toDF("user_id", "ts", "event_type")
    val got = graft.ops.EventAnalytics.retentionCohorts(
      rows, col("user_id"), col("ts"))
      .select(col("cohort").cast("long"), col("day_offset"), col("n_users"))
      .as[(Long, Int, Long)].collect().toSet
    // user 1: cohort day0 (offsets 0 and 1), user 2: cohort day1 (offset 0)
    assert(got === Set((0L, 0, 1L), (0L, 1, 1L), (86400L, 0, 1L)))
  }
}

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("all four statuses; keys from either side survive") {
    val a = Seq((1L, 2L, 10.0), (2L, 1L, 5.0), (3L, 3L, 7.5))
      .toDF("k", "n", "spend")
    val b = Seq((1L, 2L, 10.0), (2L, 1L, 6.0), (4L, 1L, 1.0))
      .toDF("k", "n", "spend")
    val got = SnapshotDiff.delta(a, b, "k", Seq("n", "spend"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "same", 2L -> "changed", 3L -> "dropped",
      4L -> "added"))
  }

  test("a NULL aggregate on a present key is 'same', not 'added'/'dropped'") {
    // presence is tracked by flags, so (k=1, NULL) on both sides means
    // the key exists in both snapshots with an equal (null) value
    val a = Seq((1L, Option.empty[Double]), (2L, Some(3.0))).toDF("k", "v")
    val b = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double])).toDF("k", "v")
    val got = SnapshotDiff.delta(a, b, "k", Seq("v"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "same", 2L -> "changed"))
  }

  test("plan: no nested loop; one row per key in the output") {
    val a = (0 until 100).map(i => (i.toLong, 1L)).toDF("k", "n")
    val b = (50 until 150).map(i => (i.toLong, 2L)).toDF("k", "n")
    val d = SnapshotDiff.delta(a, b, "k", Seq("n"))
    assert(!d.queryExecution.executedPlan.toString.contains("NestedLoop"))
    assert(d.count() === 150)
    assert(d.select("k").distinct().count() === 150)
  }
}

class SurvivalSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val GAP = 1800000000L // 30 min in micros

  private def ev(rows: (Long, Long, Long)*) =
    rows.toDF("user_id", "t", "event_id")
      .select(col("user_id"), timestamp_micros(col("t")).as("ts"), col("event_id"))

  test("survival drops at each mark; censored sessions leave the denominator") {
    val m = 60000000L // one minute in micros
    val e = ev(
      // user 1: one 10-minute session ending long before the edge
      (1L, 0L, 1L), (1L, 10L * m, 2L),
      // user 2: a zero-length session well before the edge
      (2L, 20L * m, 3L),
      // user 3: a 2-minute session touching the corpus max → censored
      (3L, 200L * m, 4L), (3L, 202L * m, 5L))
    val got = graft.ops.EventAnalytics.survivalCurve(e, col("user_id"),
        col("ts"), col("event_id"), GAP, Seq(0, 1, 5, 15))
      .orderBy("t_min").as[(Int, Long, Long, Long)].collect()
    // uncensored: sessions of user1 (10 min) and user2 (0 min)
    assert(got === Array(
      (0, 2L, 1L, 1000000L),   // everyone alive at 0
      (1, 1L, 1L, 500000L),    // user2's instant session is gone
      (5, 1L, 0L, 500000L),    // censored session only OBSERVED to 2 min
      (15, 0L, 0L, 0L)))       // the 10-min session ends before 15
  }

  test("all censored: denominator zero, surv_ppm reports 0, not a crash") {
    val got = graft.ops.EventAnalytics.survivalCurve(ev((1L, 0L, 1L)),
        col("user_id"), col("ts"), col("event_id"), GAP, Seq(0, 1))
      .orderBy("t_min").as[(Int, Long, Long, Long)].collect()
    assert(got === Array((0, 0L, 1L, 0L), (1, 0L, 0L, 0L)))
  }
}

class EntryExitSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("entry/exit/bounce accounting over two sessions") {
    val m = 60000000L
    val e = Seq(
      // user 1, session 1: view → click (entry view, exit click)
      (1L, 0L, 1L, "view"), (1L, m, 2L, "click"),
      // user 1, session 2 (gap > 30 min): lone "buy" → bounce
      (1L, 100L * m, 3L, "buy"),
      // user 2: lone "view" → bounce
      (2L, 0L, 4L, "view"))
      .toDF("user_id", "t", "event_id", "typ")
      .select(col("user_id"), timestamp_micros(col("t")).as("ts"),
        col("event_id"), col("typ"))
    val got = graft.ops.EventAnalytics.entryExitStats(e, col("user_id"),
        col("ts"), col("event_id"), col("typ"), 1800000000L)
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got === Array(
      ("buy", 1L, 1L, 1L, 333333L, 333333L),
      ("click", 0L, 1L, 0L, 0L, 333333L),
      ("view", 2L, 1L, 1L, 666666L, 333333L)))
  }

  test("simultaneous timestamps break entry/exit by the order column") {
    val e = Seq((1L, 5L, 1L, "a"), (1L, 5L, 2L, "b"))
      .toDF("user_id", "t", "event_id", "typ")
      .select(col("user_id"), timestamp_micros(col("t")).as("ts"),
        col("event_id"), col("typ"))
    val got = graft.ops.EventAnalytics.entryExitStats(e, col("user_id"),
        col("ts"), col("event_id"), col("typ"), 1800000000L)
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got === Array(
      ("a", 1L, 0L, 0L, 1000000L, 0L),
      ("b", 0L, 1L, 0L, 0L, 1000000L)))
  }
}

class LinearAttributionSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "t", "event_id", "typ")
      .select(col("user_id"), timestamp_micros(col("t")).as("ts"),
        col("event_id"), col("typ"))

  test("equal split with remainder to the first touch; credit conserves exactly") {
    // user 1: view, click, email, purchase → 3 touches share 1e6:
    // 333333 each, +1 remainder to the FIRST (view)
    val e = ev((1L, 1L, 1L, "view"), (1L, 2L, 2L, "click"),
      (1L, 3L, 3L, "email"), (1L, 4L, 4L, "purchase"))
    val got = graft.ops.EventAnalytics.linearAttribution(e, col("user_id"),
        col("ts"), col("event_id"), col("typ"), "purchase")
      .orderBy("channel").as[(String, Long, Long, Long)].collect()
    assert(got === Array(
      ("click", 1L, 1L, 333333L),
      ("email", 1L, 1L, 333333L),
      ("view", 1L, 1L, 333334L)))
    assert(got.map(_._4).sum === 1000000L) // conservation
  }

  test("journeys reset after each conversion; direct conversions credit (direct)") {
    val e = ev(
      // user 1: view → purchase | purchase (no touches → direct)
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "purchase"), (1L, 3L, 3L, "purchase"),
      // user 2: click after the data's last purchase → never credited
      (2L, 1L, 4L, "click"))
    val got = graft.ops.EventAnalytics.linearAttribution(e, col("user_id"),
        col("ts"), col("event_id"), col("typ"), "purchase")
      .orderBy("channel").as[(String, Long, Long, Long)].collect()
    assert(got === Array(
      ("(direct)", 0L, 0L, 1000000L),
      ("view", 1L, 1L, 1000000L)))
    assert(got.map(_._4).sum === 2L * 1000000L) // 2 conversions, both conserved
  }

  test("a channel touching twice in one journey counts one journey, two touches") {
    val e = ev((1L, 1L, 1L, "view"), (1L, 2L, 2L, "view"),
      (1L, 3L, 3L, "purchase"))
    val got = graft.ops.EventAnalytics.linearAttribution(e, col("user_id"),
        col("ts"), col("event_id"), col("typ"), "purchase")
      .as[(String, Long, Long, Long)].collect()
    assert(got === Array(("view", 2L, 1L, 1000000L)))
  }
}

class PseudonymizeSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("collision-free re-keying preserves the exact join cardinality") {
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val child = Seq(1L, 1L, 2L, 9L).toDF("k") // 9 has no parent
    val got = graft.ops.RecordLinkage.pseudonymizeAudit(
        parent, col("k"), child, col("k"), salt = "t")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((3L, 3L, 0L, 3L, 3L, 0L)))
  }

  test("a forced collision surfaces in n_collisions") {
    // two ids, same salt+id string cannot collide with md5 prefix in
    // practice — force it by passing a constant 'key expression'
    val parent = Seq(1L, 2L).toDF("k")
    val child = Seq(1L).toDF("k")
    val got = graft.ops.RecordLinkage.pseudonymizeAudit(
        parent, lit(7L), child, lit(7L), salt = "t")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // constant key: parent distinct collapses to ONE key → no collision
    // visible there, but join parity still holds — the audit is exact
    assert(got === ((1L, 1L, 0L, 1L, 1L, 0L)))
  }
}

class ExperimentationSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "sec", "event_id", "event_type")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("event_id"), col("event_type"))

  test("markovSteadyState: a symmetric 2-state chain stays uniform; an asymmetric one converges") {
    // A⇄B swap chain: uniform is the fixed point — every division is
    // exact, so pi stays 500000/500000 at any iteration count
    val sym = ev((1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "A"),
      (1L, 4L, 4L, "B"), (1L, 5L, 5L, "A"))
    val g1 = graft.ops.EventAnalytics.markovSteadyState(sym,
        col("user_id"), col("ts"), col("event_id"), col("event_type"),
        iters = 8)
      .orderBy("state").as[(String, Long, Long)].collect()
    assert(g1 === Array(("A", 500000L, 600000L), ("B", 500000L, 400000L)))
    // A,A,B,A: P(A→A)=P(A→B)=1/2, P(B→A)=1 → hand-iterated
    // a_{t+1} = 1e12 − a_t/2 (exact halvings of even numbers): after 8
    // iterations a = 666015625000 → 666015 ppm, b = 333984 ppm;
    // occupancy A = 3/4
    val asym = ev((1L, 1L, 1L, "A"), (1L, 2L, 2L, "A"), (1L, 3L, 3L, "B"),
      (1L, 4L, 4L, "A"))
    val g2 = graft.ops.EventAnalytics.markovSteadyState(asym,
        col("user_id"), col("ts"), col("event_id"), col("event_type"),
        iters = 8)
      .orderBy("state").as[(String, Long, Long)].collect()
    assert(g2 === Array(("A", 666015L, 750000L), ("B", 333984L, 250000L)))
    intercept[IllegalArgumentException] {
      graft.ops.EventAnalytics.markovSteadyState(sym, col("user_id"),
        col("ts"), col("event_id"), col("event_type"), iters = 0)
    }
  }

  test("cupedLift: perfect pre/post correlation equalizes the adjusted means; zero variance degrades to raw") {
    // users u0..u3, y = x exactly: θ = 1e6; both variants adjust to the
    // SAME 2.5e6 ppm — all between-variant difference was pre-period
    // imbalance
    def mk(u: Long, pre: Int, post: Int) =
      (1 to pre).map(i => (u, 100L + i, u * 1000 + i, "e")) ++
        (1 to post).map(i => (u, 2000000L + i, u * 1000 + 500 + i, "e"))
    val rows = mk(0L, 1, 1) ++ mk(1L, 2, 2) ++ mk(2L, 3, 3) ++ mk(3L, 4, 4)
    val df = ev(rows: _*)
    val split = timestamp_seconds(lit(1000000L))
    val got = graft.ops.EventAnalytics.cupedLift(df, col("user_id"),
        col("ts"), expr("user_id % 2"), split)
      .orderBy("variant")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got === Array(
      (0L, 2L, 2000000L, -500000L, 2500000L, 1000000L),
      (1L, 2L, 3000000L, 500000L, 2500000L, 1000000L)))
    // identical pre-period counts: Var(X)=0 → θ NULL → adj = ybar
    val flat = ev((mk(0L, 2, 1) ++ mk(1L, 2, 3)): _*)
    val g2 = graft.ops.EventAnalytics.cupedLift(flat, col("user_id"),
        col("ts"), expr("user_id % 2"), split)
      .orderBy("variant").collect()
    g2.foreach { r =>
      assert(r.isNullAt(5))
      assert(r.getLong(4) === r.getLong(2)) // adj degrades to ybar
    }
  }

  test("hits: one-iteration bipartite scores hand-checked; k truncates; rank follows (score, node)") {
    val e = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    // h0 = 1e6 each → a(10) = 2e6, a(11) = 1e6, total 3e6 →
    // normalized 666666666666 / 333333333333
    val got = graft.ext.Graph.hits(e, iters = 1, k = 10)
      .as[(Long, Long, Long)].collect()
    assert(got === Array((10L, 666666666666L, 1L), (11L, 333333333333L, 2L)))
    val top1 = graft.ext.Graph.hits(e, iters = 1, k = 1)
      .as[(Long, Long, Long)].collect()
    assert(top1 === Array((10L, 666666666666L, 1L)))
    intercept[IllegalArgumentException] { graft.ext.Graph.hits(e, 0, 5) }
    intercept[IllegalArgumentException] { graft.ext.Graph.hits(e, 2, 0) }
  }
}

class AttributionDidSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "sec", "event_id", "event_type")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("event_id"), col("event_type"))

  test("positionAttribution: U-shaped 40/20/40 with floor remainders; degenerations and direct") {
    // u1: A,B,C,D → purchase: 400000 / 100000 / 100000 / 400000
    // u2: A → purchase: 1000000; u3: A,B → purchase: 500000 each
    // u4: purchase only → (direct); u5: A,B,C,D,E → purchase:
    //   middles 200000/3 = 66666 r2 → first middle gets 66668
    val rows = Seq(
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "C"),
      (1L, 4L, 4L, "D"), (1L, 5L, 5L, "purchase"),
      (2L, 1L, 6L, "A"), (2L, 2L, 7L, "purchase"),
      (3L, 1L, 8L, "A"), (3L, 2L, 9L, "B"), (3L, 3L, 10L, "purchase"),
      (4L, 1L, 11L, "purchase"),
      (5L, 1L, 12L, "A"), (5L, 2L, 13L, "B"), (5L, 3L, 14L, "C"),
      (5L, 4L, 15L, "D"), (5L, 5L, 16L, "E"), (5L, 6L, 17L, "purchase"))
    val got = graft.ops.EventAnalytics.positionAttribution(ev(rows: _*),
        col("user_id"), col("ts"), col("event_id"), col("event_type"),
        convType = "purchase")
      .orderBy("channel")
      .as[(String, Long, Long, Long)].collect()
    assert(got === Array(
      ("(direct)", 0L, 0L, 1000000L),
      // A: u1 first 400000 + u2 solo 1000000 + u3 first-of-2 500000
      //    + u5 first 400000
      ("A", 4L, 4L, 2300000L),
      // B: u1 middle 100000 + u3 last-of-2 500000 + u5 first-middle
      //    66666+2
      ("B", 3L, 3L, 666668L),
      // C: u1 middle 100000 + u5 middle 66666
      ("C", 2L, 2L, 166666L),
      // D: u1 last 400000 + u5 middle 66666
      ("D", 2L, 2L, 466666L),
      ("E", 1L, 1L, 400000L)))
    // total credit = 1e6 × 5 converting journeys, exactly
    assert(got.map(_._4).sum === 5000000L)
  }

  test("diffInDiff: shared trend cancels; a lopsided arm shows; bad treated value refuses") {
    // treated (odd users): pre means 3, post 5; control: pre 2, post 2
    // → did = (5−3) − (2−2) = 2e6 ppm
    def burst(u: Long, sec: Long, n: Int, base: Long) =
      (1 to n).map(i => (u, sec + i, base + i, "e"))
    val rows =
      burst(1L, 100L, 2, 1000) ++ burst(1L, 2000000L, 5, 2000) ++
      burst(3L, 100L, 4, 3000) ++ burst(3L, 2000000L, 5, 4000) ++
      burst(0L, 100L, 1, 5000) ++ burst(0L, 2000000L, 2, 6000) ++
      burst(2L, 100L, 3, 7000) ++ burst(2L, 2000000L, 2, 8000)
    val split = timestamp_seconds(lit(1000000L))
    val got = graft.ops.EventAnalytics.diffInDiff(ev(rows: _*),
        col("user_id"), col("ts"), expr("user_id % 2"), split)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((2L, 2L, 3000000L, 5000000L, 2000000L, 2000000L,
      2000000L)))
    intercept[Exception] {
      graft.ops.EventAnalytics.diffInDiff(ev(rows: _*), col("user_id"),
        col("ts"), lit(7L), split).collect()
    }
  }

  test("pinballBacktest: hand-scored p75 trailing forecast; short history excluded") {
    // key 'k': daily counts 1..7 then 10 then 1. Day 8 forecast =
    // 6th smallest of [1..7] = 6 → loss 750000·4 = 3e6 (under-forecast
    // pays the q side); day 9 forecast = 6th of [2..7,10] = 7 → loss
    // 250000·6 = 1.5e6. Days 1–7 have no full history → excluded.
    val rows = ((1 to 7).flatMap(d =>
      (1 to d).map(i => (1L, d * 86400L + i, d * 100L + i, "k"))) ++
      (1 to 10).map(i => (1L, 8 * 86400L + i, 800L + i, "k")) ++
      Seq((1L, 9 * 86400L + 1, 901L, "k")))
    val df = ev(rows: _*)
    val got = graft.ext.TimeSeries.pinballBacktest(df,
        col("event_type"), col("ts"), qPct = 75)
      .as[(String, Long, Long, Long)].head()
    assert(got === (("k", 2L, 4500000L, 2250000L)))
    intercept[IllegalArgumentException] {
      graft.ext.TimeSeries.pinballBacktest(df, col("event_type"),
        col("ts"), qPct = 0)
    }
  }
}
