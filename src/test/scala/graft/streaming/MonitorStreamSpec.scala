package graft.streaming

import graft.SparkSpec
import graft.ext.{Profile, TimeSeries}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the monitoring twins [[CusumStream]] and [[Chi2DriftStream]]:
  * O(1)/O(bins) state across micro-batch boundaries, the late-data
  * contracts, and EXACT parity with the batch operators —
  * [[graft.ext.TimeSeries.cusumPeak]] (refs = the batch totals make the
  * emitted cusums the batch window column) and
  * [[graft.ext.Profile.log2Chi2Drift]] (a two-stratum own ∪ ref corpus
  * makes "the rest" be the reference). */
class MonitorStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runCusum(batches: Seq[Seq[DailyLevel]],
      refs: Map[String, (Long, Long)]): Seq[CusumRow] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DailyLevel]
    val q = CusumStream.cusums(mem.toDS(), refs)
      .writeStream.format("memory").queryName("cusum_rows")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("cusum_rows").as[CusumRow].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS cusum_rows")
    got
  }

  private def runChi2(batches: Seq[Seq[BinDelta]],
      ref: Map[Int, Long]): Seq[Chi2DriftRow] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BinDelta]
    val q = Chi2DriftStream.drifts(mem.toDS(), ref)
      .writeStream.format("memory").queryName("chi2_rows")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("chi2_rows").as[Chi2DriftRow].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS chi2_rows")
    got
  }

  // ---- CUSUM ----

  test("cusums: with refs = batch totals, emissions ARE the batch window column; late day dropped") {
    // key a: levels 10, 30, 20, 100, 40 over days 1..5 → n=5, Σ=200
    // dev_i = 5·y_i − 200: -150, -50, -100, 300, 0
    // cusum: -150, -200, -300, 0, 0
    val lv = Seq((1, 10L), (2, 30L), (3, 20L), (4, 100L), (5, 40L))
      .map { case (d, c) => DailyLevel("a", d, c) }
    val got = runCusum(
      Seq(lv.take(2), Seq(DailyLevel("a", 2, 999L)) ++ lv.drop(2)),
      Map("a" -> (200L, 5L))).sortBy(_.day)
    assert(got === Seq(
      CusumRow("a", 1, 10L, -150L),
      CusumRow("a", 2, 30L, -200L),
      CusumRow("a", 3, 20L, -300L),
      CusumRow("a", 4, 100L, 0L),
      CusumRow("a", 5, 40L, 0L)))
  }

  test("cusums: argmax(|cusum|, earliest day) over emissions equals batch cusumPeak; uncalibrated key emits nothing") {
    val rows = Seq(
      ("a", 1, 10L), ("a", 2, 30L), ("a", 3, 20L), ("a", 4, 100L), ("a", 5, 40L),
      ("b", 1, 7L), ("b", 2, 7L), ("b", 3, 70L), ("b", 4, 7L),
      ("zz", 1, 5L)) // no ref for zz
    val df = rows.toDF("k", "day", "cents")
    val batch = TimeSeries.cusumPeak(df, col("k"), col("day"), col("cents"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val refs = rows.groupBy(_._1).map { case (k, rs) =>
      k -> ((rs.map(_._3).sum, rs.size.toLong))
    } - "zz"
    val levels = rows.map { case (k, d, c) => DailyLevel(k, d, c) }
    val got = runCusum(Seq(levels.take(4), levels.drop(4)), refs)
    assert(!got.exists(_.k == "zz"))
    // batch tie rule: |cusum| desc, earliest day
    val streamPeak = got.groupBy(_.k).map { case (k, es) =>
      val p = es.minBy(e => (-math.abs(e.cusum), e.day))
      k -> ((es.size.toLong, p.day.toLong, p.cusum))
    }
    assert(streamPeak === batch.view.filterKeys(_ != "zz").toMap)
  }

  test("cusums: state survives batch boundaries exactly (BigInt carry, split mid-series)") {
    val lv = (1 to 9).map(d => DailyLevel("a", d, d * 11L))
    val total = lv.map(_.cents).sum // 495
    val one = runCusum(Seq(lv), Map("a" -> (total, 9L)))
    val split = runCusum(Seq(lv.take(3), lv.slice(3, 4), lv.drop(4)),
      Map("a" -> (total, 9L)))
    assert(split.sortBy(_.day) === one.sortBy(_.day))
  }

  // ---- χ² drift ----

  /** Batch parity harness: own values under stratum `k`, ref values
    * under a second stratum — at two strata, own-vs-REST is own-vs-ref. */
  private def batchChi2(k: String, own: Seq[Long], ref: Seq[Long]) = {
    val df = (own.map((k, _)) ++ ref.map(("__ref", _))).toDF("s", "v")
    Profile.log2Chi2Drift(df, col("s"), col("v"))
      .where(col("s") === k)
      .select("n_own", "n_rest", "bins_occupied", "chi2_ppm",
        "chi2_per_dof_ppm", "drifted")
      .collect().head
  }

  private def binCounts(vs: Seq[Long]): Map[Int, Long] =
    vs.filter(_ >= 1).groupBy(v => 63 - java.lang.Long.numberOfLeadingZeros(v))
      .map { case (b, g) => b -> g.size.toLong }

  test("chi2 drift: latest emission equals batch log2Chi2Drift on the two-stratum corpus") {
    val own = Seq(1L, 2L, 3L, 5L, 9L, 17L, 33L, 900L, 901L, 902L)
    val ref = Seq(1L, 1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L)
    val deltas = binCounts(own).toSeq.map { case (b, n) => BinDelta("a", b, n) }
    val got = runChi2(Seq(deltas.take(2), deltas.drop(2)), binCounts(ref))
    val last = got.maxBy(_.n_own) // cumulative verdicts: newest = largest n_own
    val b = batchChi2("a", own, ref)
    assert(last.n_own === b.getLong(0))
    assert(last.n_ref === b.getLong(1))
    assert(last.bins_occupied === b.getLong(2))
    assert(last.chi2_ppm === Some(b.getLong(3)))
    assert(last.chi2_per_dof_ppm === Some(b.getLong(4)))
    assert(last.drifted === b.getInt(5))
  }

  test("chi2 drift: state folds across batches (split == one-shot), empty ref reads NULL loudly") {
    val own = Seq(1L, 3L, 9L, 100L, 1000L)
    val deltas = binCounts(own).toSeq.sortBy(_._1)
      .map { case (b, n) => BinDelta("a", b, n) }
    val ref = Map(0 -> 3L, 3 -> 2L)
    val oneShot = runChi2(Seq(deltas), ref).maxBy(_.n_own)
    val split = runChi2(Seq(deltas.take(1), deltas.drop(1)), ref).maxBy(_.n_own)
    assert(split === oneShot)
    // empty reference: verdict says NULL (batch's N2 = 0 contract)
    val noRef = runChi2(Seq(deltas), Map.empty[Int, Long]).maxBy(_.n_own)
    assert(noRef.chi2_ppm === None && noRef.chi2_per_dof_ppm === None
      && noRef.drifted === 0 && noRef.n_ref === 0L)
  }

  test("chi2 drift: a shifted distribution trips `drifted`, an identical one does not") {
    val ref = (1 to 200).map(i => (1L << (i % 4))) // bins 0..3 uniform-ish
    val same = runChi2(
      Seq(binCounts(ref).toSeq.map { case (b, n) => BinDelta("s", b, n) }),
      binCounts(ref)).maxBy(_.n_own)
    assert(same.drifted === 0)
    val shifted = (1 to 200).map(i => (1L << (4 + i % 4))) // bins 4..7
    val drift = runChi2(
      Seq(binCounts(shifted).toSeq.map { case (b, n) => BinDelta("d", b, n) }),
      binCounts(ref)).maxBy(_.n_own)
    assert(drift.drifted === 1)
  }
}
