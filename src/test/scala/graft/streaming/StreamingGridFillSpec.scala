package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins [[GridFill.streamingLocf]]'s contract against the batch twin:
  * the union of emissions across micro-batches equals
  * [[graft.ext.TimeSeries.locfGrid]] on the union of inputs MINUS each
  * user's still-open last hour, and the per-user state is one
  * fixed-size row regardless of how events split across batches.
  */
class StreamingGridFillSpec extends SparkSpec {
  import spark.implicits._

  private val H = GridFill.HourUs
  private val T0 = 1700000000000000L / H * H // an exact hour boundary

  private def runBatches(batches: Seq[Seq[ObsEvent]]): Seq[GridRow] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ObsEvent]
    val q = GridFill.streamingLocf(mem.toDS())
      .writeStream.format("memory").queryName("gridfill")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("gridfill").as[GridRow].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS gridfill")
    got
  }

  private def batchLocf(all: Seq[ObsEvent]): Seq[GridRow] = {
    val df = all.toDF()
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("value"))
    graft.ext.TimeSeries.locfGrid(df, col("user_id"), col("ts"),
      col("event_id"), col("value"))
      .select(col("user_id"), unix_micros(col("h")).as("h_us"),
        col("v_locf"), col("observed"))
      .as[GridRow].collect().toSeq
  }

  test("union of emissions == batch grid minus each user's open last hour") {
    val b1 = Seq(
      ObsEvent(1L, T0 + 600L * 1000000L, 1L, 10.0),        // hour 0, :10
      ObsEvent(1L, T0 + 3000L * 1000000L, 2L, 20.0),       // hour 0, :50 (wins)
      ObsEvent(2L, T0 + 100L, 3L, 7.0))
    val b2 = Seq(
      ObsEvent(1L, T0 + 4 * H + 1800L * 1000000L, 4L, 50.0), // hour 4 → closes 0..3
      ObsEvent(2L, T0 + H + 1L, 5L, 9.0))                    // hour 1 → closes 0
    val streamed = runBatches(Seq(b1, b2))
    val batch = batchLocf(b1 ++ b2)
    val openTail = batch.groupBy(_.user_id).values.map(_.maxBy(_.h_us)).toSet
    assert(streamed.toSet === batch.toSet -- openTail)
    assert(streamed.size === batch.size - 2)
    // the gap hours carried hour 0's FINAL value (20.0, not 10.0)
    val gaps = streamed.filter(r => r.user_id == 1L && r.observed == 0)
    assert(gaps.map(_.h_us).sorted === Seq(T0 + H, T0 + 2 * H, T0 + 3 * H))
    assert(gaps.forall(_.v_locf === 20.0))
  }

  test("same-hour override across BATCHES: later (us, eid) still wins the election") {
    val b1 = Seq(ObsEvent(1L, T0 + 100L, 1L, 1.0))
    val b2 = Seq(ObsEvent(1L, T0 + 200L, 2L, 2.0))           // same hour, later us
    val b3 = Seq(ObsEvent(1L, T0 + H + 1L, 3L, 3.0))         // closes hour 0
    val streamed = runBatches(Seq(b1, b2, b3))
    assert(streamed === Seq(GridRow(1L, T0, 2.0, 1)))
  }

  test("late event before the fill frontier is dropped; same-hour earlier event doesn't override") {
    val b1 = Seq(ObsEvent(1L, T0 + 2 * H + 100L, 1L, 5.0))
    val b2 = Seq(
      ObsEvent(1L, T0 + 100L, 2L, 99.0),                     // 2 hours late: dropped
      ObsEvent(1L, T0 + 2 * H + 50L, 3L, 88.0),              // same hour, EARLIER us: loses
      ObsEvent(1L, T0 + 3 * H, 4L, 6.0))                     // closes hour 2
    val streamed = runBatches(Seq(b1, b2))
    assert(streamed === Seq(GridRow(1L, T0 + 2 * H, 5.0, 1)))
  }
}
