package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins [[WindowFunnelStream.verdicts]]: per-conversion verdicts are
  * final on arrival (no open tail), chains survive batch boundaries,
  * and the day-level aggregate of emissions matches the batch
  * [[graft.ops.EventAnalytics.windowFunnel]] on the same events. */
class WindowFunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // one hour in micros

  private def runBatches(batches: Seq[Seq[TypedEvent]]): Seq[FunnelHit] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TypedEvent]
    val q = WindowFunnelStream.verdicts(mem.toDS(), "view", "click", "purchase", H)
      .writeStream.format("memory").queryName("funnel_hits")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("funnel_hits").as[FunnelHit].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS funnel_hits")
    got
  }

  test("verdicts final on arrival; chain crosses the batch boundary; greedy-latest") {
    val t0 = 1704067200000000L // 2024-01-01 00:00:00 UTC
    val b1 = Seq(
      TypedEvent(1L, t0, 1L, "view"),
      TypedEvent(1L, t0 + 600000000L, 2L, "click"),       // 10 min
      TypedEvent(2L, t0, 3L, "purchase"))                  // nothing prior
    val b2 = Seq(
      TypedEvent(1L, t0 + 1200000000L, 4L, "purchase"),    // span 20 min, ok
      TypedEvent(1L, t0 + 2000000000L, 5L, "view"),        // newer view
      TypedEvent(1L, t0 + 2600000000L, 6L, "click"),
      TypedEvent(1L, t0 + 9000000000L, 7L, "purchase"))    // span 7000 s > 1 h
    val got = runBatches(Seq(b1, b2)).sortBy(h => (h.user_id, h.us))
    assert(got === Seq(
      FunnelHit(1L, t0 + 1200000000L, ok = true, 1200000000L),
      FunnelHit(1L, t0 + 9000000000L, ok = false, 7000000000L), // greedy-latest view
      FunnelHit(2L, t0, ok = false, -1L)))
  }

  test("day-level aggregate of emissions equals the batch windowFunnel") {
    val t0 = 1704067200000000L
    val evs = Seq(
      TypedEvent(1L, t0, 1L, "view"), TypedEvent(1L, t0 + 100000000L, 2L, "click"),
      TypedEvent(1L, t0 + 200000000L, 3L, "purchase"),
      TypedEvent(2L, t0 + 300000000L, 4L, "click"),
      TypedEvent(2L, t0 + 400000000L, 5L, "purchase"),
      TypedEvent(3L, t0 + 86400000000L, 6L, "view"),
      TypedEvent(3L, t0 + 86400000000L + H * 2, 7L, "click"),
      TypedEvent(3L, t0 + 86400000000L + H * 2 + 1L, 8L, "purchase"))
    val streamed = runBatches(Seq(evs.take(3), evs.drop(3)))
    val streamAgg = streamed.toDF()
      .select(date_format(timestamp_micros(col("us")), "yyyy-MM-dd").as("day"),
        col("ok"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_conv"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_completed"))
      .orderBy("day")
      .as[(String, Long, Long)].collect().toSeq
    val batchDf = evs.toDF()
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("et").as("event_type"))
    val batch = graft.ops.EventAnalytics.windowFunnel(batchDf, col("user_id"),
      col("ts"), col("event_id"), col("event_type"),
      "view", "click", "purchase", H)
      .orderBy("day")
      .select(col("day"), col("n_conv"), col("n_completed"))
      .as[(String, Long, Long)].collect().toSeq
    assert(streamAgg === batch)
  }
}
