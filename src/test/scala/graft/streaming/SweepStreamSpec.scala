package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins [[SweepStream.updates]]: the incremental sweep equals the batch
  * [[graft.ext.TimeSeries.maxConcurrency]] on in-order feeds — including
  * a tie group split across a micro-batch boundary — and the late
  * contract drops time-regressing deltas instead of corrupting the
  * open count. */
class SweepStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runBatches(batches: Seq[Seq[IntervalDelta]]): Seq[SweepUpdate] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[IntervalDelta]
    val q = SweepStream.updates(mem.toDS())
      .writeStream.format("memory").queryName("sweep_updates")
      .outputMode("update").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("sweep_updates").as[SweepUpdate].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS sweep_updates")
    got
  }

  /** The x202 fixture: [0,10) [5,15) [10,20) — max 2 at t=5; the −1@10
    * / +1@10 tie group is deliberately split across the batch cut. */
  private val deltas = Seq(
    IntervalDelta(7L, 0L, 1, 1L), IntervalDelta(7L, 5L, 1, 2L),
    IntervalDelta(7L, 10L, -1, 3L), IntervalDelta(7L, 10L, 1, 4L),
    IntervalDelta(7L, 15L, -1, 5L), IntervalDelta(7L, 20L, -1, 6L))

  test("final update equals the batch sweep; tie group survives the batch cut") {
    val got = runBatches(Seq(deltas.take(3), deltas.drop(3)))
    // per-batch updates: after b1 (events 0,5,10−) open=1 max=2@5
    assert(got === Seq(SweepUpdate(7L, 3L, 1L, 2L, 5L),
      SweepUpdate(7L, 6L, 0L, 2L, 5L)))
    // batch twin on the same intervals: n_iv = n_ev/2, same max + peak
    val iv = Seq((7L, 0L, 10L), (7L, 5L, 15L), (7L, 10L, 20L))
      .toDF("k", "st", "en")
      .select(col("k"), timestamp_micros(col("st")).as("st"),
        timestamp_micros(col("en")).as("en"))
    val batch = graft.ext.TimeSeries.maxConcurrency(iv, col("k"),
      col("st"), col("en")).as[(Long, Long, Long, Long)].head()
    val last = got.last
    assert((last.k, last.n_ev / 2, last.max_open, last.peak_us) === batch)
  }

  test("late contract: a time-regressing delta is dropped, not folded") {
    val stale = IntervalDelta(7L, 3L, 1, 99L) // t=3 after frontier t=10
    val got = runBatches(Seq(deltas.take(4), stale +: deltas.drop(4)))
    assert(got.last === SweepUpdate(7L, 6L, 0L, 2L, 5L))
  }

  test("same-(t,d) duplicates are distinct events, not dedup victims") {
    // two intervals STARTING the same microsecond: eids keep both
    val d = Seq(IntervalDelta(1L, 0L, 1, 1L), IntervalDelta(1L, 0L, 1, 2L),
      IntervalDelta(1L, 9L, -1, 3L), IntervalDelta(1L, 9L, -1, 4L))
    val got = runBatches(Seq(d.take(2), d.drop(2)))
    assert(got.last === SweepUpdate(1L, 4L, 0L, 2L, 0L))
  }
}
