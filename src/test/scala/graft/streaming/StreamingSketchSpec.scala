package graft.streaming

import graft.SparkSpec
import graft.ext.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the sketch/streaming composition: HLL registers are a monotone
  * max-aggregate, so the BATCH sketch pipeline runs unchanged as a
  * structured stream — the state is the 64-row register table per key,
  * arriving batches fold into it, and nothing is ever reprocessed. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streamed HLL register state == batch sketch over the union; estimates identical") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = Sketches.hllRegisters(mem.toDS().toDF("key", "el"), col("key"), col("el"))
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    val batch1 = (0 until 300).map(i => ("a", s"e$i"))
    // overlapping re-delivery (200-299 again) + a second key: max-fold
    // must absorb duplicates exactly like the batch pipeline
    val batch2 = (200 until 500).map(i => ("a", s"e$i")) ++
      (0 until 100).map(i => ("b", s"e$i"))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hll_regs")
      .as[(String, Long, Int)].collect().toSet
    val batchRegs = Sketches.hllRegisters(
      (batch1 ++ batch2).toDF("key", "el"), col("key"), col("el"))
    assert(streamed === batchRegs.as[(String, Long, Int)].collect().toSet)
    val streamedEst = Sketches.hllEstimate(spark.table("hll_regs"))
      .as[(String, Double)].collect().toMap
    val batchEst = Sketches.hllEstimate(batchRegs)
      .as[(String, Double)].collect().toMap
    assert(streamedEst === batchEst)
  }

  test("streamed histogram buckets (a sum-aggregate) == batch; quantiles replay off the state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = Sketches.histogramBuckets(
        mem.toDS().toDF("key", "v"), col("key"), col("v"), width = 10L)
      .writeStream.format("memory").queryName("hist_buckets")
      .outputMode("complete").start()
    val batch1 = (0 until 200).map(i => ("a", i.toLong)) ++
      (0 until 50).map(i => ("b", (i * 3).toLong))
    val batch2 = (100 until 400).map(i => ("a", i.toLong)) // overlapping range
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hist_buckets")
      .as[(String, Long, Long)].collect().toSet
    val union = (batch1 ++ batch2).toDF("key", "v")
    val batch = Sketches.histogramBuckets(union, col("key"), col("v"), 10L)
      .as[(String, Long, Long)].collect().toSet
    assert(streamed === batch)
    // the finisher replays quantiles off the materialized sketch state,
    // identical to the batch pipeline over the union
    val streamedQ = Sketches.histogramQuantilesFromBuckets(
        spark.table("hist_buckets"), 10L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val batchQ = Sketches.histogramQuantiles(union, col("key"), col("v"), 10L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(streamedQ === batchQ)
  }

  test("streamed CMS counters (a sum-aggregate) == batch counters over the union") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = Sketches.cmsCounters(mem.toDS().toDF("el"), col("el"))
      .writeStream.format("memory").queryName("cms_counters")
      .outputMode("complete").start()
    val batch1 = (0 until 400).map(i => s"t${i % 50}")
    val batch2 = (0 until 250).map(i => s"t${i % 31}")
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_counters")
      .as[(Int, Long, Long)].collect().toSet
    val batch = Sketches.cmsCounters((batch1 ++ batch2).toDF("el"), col("el"))
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("rendezvous sharding is stateless scan-side — streams in APPEND mode, rows == batch") {
    // the placement decision is pure per-row arithmetic, so the same
    // expression routes a STREAM (e.g. a writeStream partitioned by
    // shard) with no state store and no output-mode restriction; the
    // streamed assignment must be row-identical to the batch one
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = mem.toDS().toDF("id")
      .select(col("id"), graft.ext.Sampling.rendezvousShard(col("id"), 8).as("shard"))
      .writeStream.format("memory").queryName("hrw_stream")
      .outputMode("append").start()
    mem.addData(1L to 300L: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hrw_stream").as[(Long, Long)].collect().toSet
    val batch = (1L to 300L).toDF("id")
      .select(col("id"), graft.ext.Sampling.rendezvousShard(col("id"), 8).as("shard"))
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch)
  }
  test("streamed drift counts (a sum-aggregate) == batch; TV finisher replays off state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val q = graft.ops.SnapshotDiff.categoryCounts(
        mem.toDS().toDF("cat", "ina"), col("cat"), col("ina") === 1)
      .writeStream.format("memory").queryName("drift_counts")
      .outputMode("complete").start()
    val batch1 = Seq(("click", 1), ("click", 1), ("view", 1), ("click", 0))
    val batch2 = Seq(("view", 0), ("view", 0), ("click", 1), ("scroll", 0))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val streamedState = spark.table("drift_counts")
    val batchState = graft.ops.SnapshotDiff.categoryCounts(
      (batch1 ++ batch2).toDF("cat", "ina"), col("cat"), col("ina") === 1)
    assert(streamedState.as[(String, Long, Long)].collect().toSet ===
      batchState.as[(String, Long, Long)].collect().toSet)
    val streamedDrift = graft.ops.SnapshotDiff.driftFromCounts(streamedState)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val batchDrift = graft.ops.SnapshotDiff.categoryDrift(
      (batch1 ++ batch2).toDF("cat", "ina"), col("cat"), col("ina") === 1)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(streamedDrift === batchDrift)
  }

  test("streamed bloom words (bit_or — monotone) == batch filter over the union") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = Sketches.bloomWords(mem.toDS().toDF("el"), col("el"), words = 4, d = 3)
      .writeStream.format("memory").queryName("bloom_words")
      .outputMode("complete").start()
    val b1 = (1 to 50).map(i => s"e$i")
    val b2 = (30 to 90).map(i => s"e$i") // replayed overlap must OR-absorb
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("bloom_words")
      .as[(Long, Long)].collect().toSet
    val batch = Sketches.bloomWords((b1 ++ b2).toDF("el"), col("el"),
        words = 4, d = 3)
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("streamed covariance accumulators (sum/count) == batch matrix over the union") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = graft.ext.Profile.covMatrix(mem.toDS().toDF("x", "y"),
        Seq("x" -> col("x"), "y" -> col("y")))
      .writeStream.format("memory").queryName("cov_state")
      .outputMode("complete").start()
    mem.addData((1L, 2L), (2L, 4L))
    q.processAllAvailable()
    mem.addData((3L, 6L), (4L, 9L))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cov_state")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    val batch = graft.ext.Profile.covMatrix(
        Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 9L)).toDF("x", "y"),
        Seq("x" -> col("x"), "y" -> col("y")))
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("streamed zone-map stats (count/min/max — all combinable) == batch blocks") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = graft.ext.Layout.zoneMapStats(mem.toDS().toDF("k", "m"),
        col("k"), col("m"), blockSize = 4L)
      .writeStream.format("memory").queryName("zone_state")
      .outputMode("complete").start()
    mem.addData((0L, 10L), (1L, 5L), (5L, 99L))
    q.processAllAvailable()
    mem.addData((2L, 1L), (6L, 42L), (9L, 7L))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("zone_state")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = graft.ext.Layout.zoneMapStats(
        Seq((0L, 10L), (1L, 5L), (5L, 99L), (2L, 1L), (6L, 42L), (9L, 7L))
          .toDF("k", "m"), col("k"), col("m"), blockSize = 4L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("streamed regression moments (trendSlope) == batch slope over the union") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = graft.ext.TimeSeries.trendSlope(mem.toDS().toDF("k", "x", "y"),
        col("k"), col("x"), col("y"))
      .writeStream.format("memory").queryName("slope_state")
      .outputMode("complete").start()
    mem.addData(("a", 1L, 10L), ("a", 2L, 13L))
    q.processAllAvailable()
    mem.addData(("a", 3L, 16L), ("a", 4L, 19L), ("b", 1L, 5L), ("b", 2L, 5L))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("slope_state")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    assert(streamed === Set(("a", 4L, 58L, Some(3000000L)), ("b", 2L, 10L, Some(0L))))
  }

  test("streamed KMV buffers == batch over the union — the k-min merge law under re-delivery") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = Sketches.kmvMins(mem.toDS().toDF("key", "el"),
        col("key"), col("el"), k = 16)
      .writeStream.format("memory").queryName("kmv_state")
      .outputMode("complete").start()
    val batch1 = (0 until 200).map(i => ("a", s"e$i"))
    // overlap 100-199 re-delivered + a small second key (below capacity)
    val batch2 = (100 until 400).map(i => ("a", s"e$i")) ++
      (0 until 9).map(i => ("b", s"e$i"))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("kmv_state")
      .as[(String, Seq[Long])].collect().toMap
    val batch = Sketches.kmvMins((batch1 ++ batch2).toDF("key", "el"),
        col("key"), col("el"), k = 16)
      .as[(String, Seq[Long])].collect().toMap
    assert(streamed === batch)
    assert(streamed("a").size === 16 && streamed("b").size === 9)
  }
}
