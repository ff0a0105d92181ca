package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins [[DrawdownStream.drawdowns]] and [[StreakStream.streaks]]:
  * verdicts are final on arrival, state survives batch boundaries, and
  * aggregates of the emissions match the batch operators on the same
  * rows. */
class StateScanStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runDd(batches: Seq[Seq[DailyLevel]]): Seq[DrawdownRow] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DailyLevel]
    val q = DrawdownStream.drawdowns(mem.toDS())
      .writeStream.format("memory").queryName("dd_rows")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("dd_rows").as[DrawdownRow].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS dd_rows")
    got
  }

  private def runStreaks(batches: Seq[Seq[ActiveDay]]): Seq[StreakRow] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ActiveDay]
    val q = StreakStream.streaks(mem.toDS())
      .writeStream.format("memory").queryName("streak_rows")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("streak_rows").as[StreakRow].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS streak_rows")
    got
  }

  test("drawdowns: peak set in batch 1 still gates batch 2; late day dropped; 50% tie visible per day") {
    // levels 100, 50 | 120, 60 across two batches (days 1..4); a late
    // replay of day 2 in batch 2 must be dropped
    val b1 = Seq(DailyLevel("a", 1, 100L), DailyLevel("a", 2, 50L))
    val b2 = Seq(DailyLevel("a", 2, 999L), DailyLevel("a", 3, 120L),
      DailyLevel("a", 4, 60L))
    val got = runDd(Seq(b1, b2)).sortBy(_.day)
    assert(got === Seq(
      DrawdownRow("a", 1, 100L, 100L, 0L),
      DrawdownRow("a", 2, 50L, 100L, 500000L),
      DrawdownRow("a", 3, 120L, 120L, 0L),
      DrawdownRow("a", 4, 60L, 120L, 500000L)))
  }

  test("drawdowns: all-non-positive levels report the true running max, not a phantom 0") {
    // refund-dominated key: levels -40, -90, -10 — the running max is
    // -40, -40, -10 (batch window semantics), dd stays 0 because the
    // peak is never positive (the batch CASE guard)
    val b1 = Seq(DailyLevel("neg", 1, -40L), DailyLevel("neg", 2, -90L))
    val b2 = Seq(DailyLevel("neg", 3, -10L))
    val got = runDd(Seq(b1, b2)).sortBy(_.day)
    assert(got === Seq(
      DrawdownRow("neg", 1, -40L, -40L, 0L),
      DrawdownRow("neg", 2, -90L, -40L, 0L),
      DrawdownRow("neg", 3, -10L, -10L, 0L)))
  }

  test("drawdowns: aggregate of emissions equals the batch maxDrawdown") {
    val levels = Seq(("a", 1, 60L), ("a", 1, 40L), ("a", 2, 50L),
      ("a", 3, 120L), ("a", 4, 60L), ("b", 1, 10L), ("b", 2, 30L))
    // streaming side consumes COMPLETED daily levels (the upstream
    // rollup's output) — sum the two day-1 rows first
    val daily = levels.groupBy(l => (l._1, l._2))
      .map { case ((k, d), rs) => DailyLevel(k, d, rs.map(_._3).sum) }
      .toSeq.sortBy(l => (l.k, l.day))
    val streamed = runDd(Seq(daily.take(3), daily.drop(3)))
    val streamAgg = streamed.toDF()
      .groupBy("k")
      .agg(count(lit(1)).as("n_days"),
        max(col("runmax")).cast("string").as("peak_cents"),
        max(struct(col("dd_ppm"), (-col("day")).as("negday"),
          col("level").as("ty"))).as("mx"))
      .select(col("k"), col("n_days"), col("peak_cents"),
        col("mx.ty").cast("string").as("trough_cents"),
        col("mx.dd_ppm").as("max_dd_ppm"),
        date_from_unix_date(-col("mx.negday")).as("trough_day"))
      .orderBy("k")
      .as[(String, Long, String, String, Long, java.sql.Date)].collect()
    val batchDf = levels.toDF("k", "d", "cents")
      .select(col("k"),
        to_timestamp(date_from_unix_date(col("d"))).as("ts"), col("cents"))
    val batch = graft.ext.TimeSeries.maxDrawdown(batchDf, col("k"),
        col("ts"), col("cents"))
      .orderBy("k")
      .as[(String, Long, String, String, Long, java.sql.Date)].collect()
    assert(streamAgg.toSeq === batch.toSeq)
  }

  test("streaks: runs survive batch boundaries; duplicates collapse; histogram matches the batch") {
    // u1 days {1,2,3,5} split across batches (run 1-2-3 straddles);
    // u2 {1,3}; u3 {1,1,2} (dup day 1)
    val b1 = Seq(ActiveDay(1L, 1), ActiveDay(1L, 2), ActiveDay(2L, 1),
      ActiveDay(3L, 1), ActiveDay(3L, 1))
    val b2 = Seq(ActiveDay(1L, 3), ActiveDay(1L, 5), ActiveDay(2L, 3),
      ActiveDay(3L, 2))
    val got = runStreaks(Seq(b1, b2))
    // final verdict per key carries the longest
    val finals = got.groupBy(_.k)
      .map { case (k, rs) => k -> rs.maxBy(_.day).longest }
    assert(finals === Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
    // the run crossing the boundary increments, not restarts
    assert(got.find(r => r.k == 1L && r.day == 3).get.cur_streak === 3L)
    // histogram of finals equals the batch streakHistogram
    val streamHist = finals.toSeq.toDF("k", "longest")
      .groupBy("longest").agg(count(lit(1)).as("n_keys"))
      .orderBy(col("longest").desc)
      .as[(Long, Long)].collect().toSeq
    val batchDf = (b1 ++ b2).toDF("k", "d")
      .select(col("k"), to_timestamp(date_from_unix_date(col("d"))).as("ts"))
    val batch = graft.ext.TimeSeries.streakHistogram(batchDf, col("k"),
        col("ts"))
      .orderBy(col("longest_streak").desc)
      .select("longest_streak", "n_keys")
      .as[(Long, Long)].collect().toSeq
    assert(streamHist === batch)
  }
}
