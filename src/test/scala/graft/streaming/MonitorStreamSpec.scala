package graft.streaming

import graft.SparkSpec
import graft.ext.{Profile, TimeSeries}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the monitoring twins [[CusumStream]], [[Chi2DriftStream]],
  * [[KsDriftStream]] and [[ZscoreStream]]: O(1)/O(bins)/O(win) state
  * across micro-batch boundaries, the late-data contracts, the loud
  * guards (invalid deltas, int64 envelope breach), and EXACT parity
  * with the batch operators — [[graft.ext.TimeSeries.cusumPeak]]
  * (refs = the batch totals make the emitted cusums the batch window
  * column), [[graft.ext.Profile.log2Chi2Drift]] / [[graft.ext.Profile.log2Ks]]
  * (a two-stratum own ∪ ref corpus makes "the rest" be the reference)
  * and [[graft.ext.TimeSeries.rollingZscore]] (the trailing window is
  * computable online, so flags match row for row). */
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

  // ---- KS drift ----

  private def runKs(batches: Seq[Seq[BinDelta]], ref: Map[Int, Long],
      thresholdPpm: Long = 100000L): Seq[KsDriftRow] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BinDelta]
    val q = KsDriftStream.drifts(mem.toDS(), ref, thresholdPpm)
      .writeStream.format("memory").queryName("ks_rows")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("ks_rows").as[KsDriftRow].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS ks_rows")
    got
  }

  test("ks drift: latest emission equals batch log2Ks on the two-stratum corpus") {
    val own = Seq(1L, 2L, 3L, 5L, 9L, 17L, 33L, 900L, 901L, 902L)
    val ref = Seq(1L, 1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L)
    val deltas = binCounts(own).toSeq.map { case (b, n) => BinDelta("a", b, n) }
    val got = runKs(Seq(deltas.take(2), deltas.drop(2)), binCounts(ref))
    val last = got.maxBy(_.n_own)
    val b = (own.map(("a", _)) ++ ref.map(("__ref", _))).toDF("s", "v")
    val row = Profile.log2Ks(b, col("s"), col("v"))
      .where(col("s") === "a").collect().head
    assert(last.n_own === row.getLong(1))
    assert(last.n_ref === row.getLong(2))
    assert(last.ks_ppm === Some(row.getLong(3)))
    assert(last.ks_bin === Some(row.getLong(4)))
  }

  test("ks drift: state folds across batches (split == one-shot); empty ref reads NULL; threshold trips drifted") {
    val own = Seq(1L, 3L, 9L, 100L, 1000L)
    val deltas = binCounts(own).toSeq.sortBy(_._1)
      .map { case (b, n) => BinDelta("a", b, n) }
    val ref = Map(0 -> 3L, 3 -> 2L)
    val oneShot = runKs(Seq(deltas), ref).maxBy(_.n_own)
    val split = runKs(Seq(deltas.take(1), deltas.drop(1)), ref).maxBy(_.n_own)
    assert(split === oneShot)
    val noRef = runKs(Seq(deltas), Map.empty[Int, Long]).maxBy(_.n_own)
    assert(noRef.ks_ppm === None && noRef.ks_bin === None
      && noRef.drifted === 0 && noRef.n_ref === 0L)
    // identical distribution: KS = 0, never drifted; disjoint: ~1e6 ppm, drifted
    val same = runKs(Seq(deltas), binCounts(own)).maxBy(_.n_own)
    assert(same.ks_ppm === Some(0L) && same.drifted === 0)
    val far = runKs(Seq(deltas), Map(40 -> 100L)).maxBy(_.n_own)
    assert(far.ks_ppm === Some(1000000L) && far.drifted === 1)
  }

  test("ks drift: ties on the max CDF gap resolve to the SMALLEST bin (the batch max(struct(dx,-b)) rule)") {
    // own in bin 0, ref in bin 4: gap is maximal (=n1*n2) for every
    // bin in [0,4) -- both engines must report bin 0
    val got = runKs(Seq(Seq(BinDelta("a", 0, 5L))), Map(4 -> 7L)).head
    assert(got.ks_bin === Some(0L) && got.ks_ppm === Some(1000000L))
    val b = (Seq.fill(5)(1L).map(("a", _)) ++ Seq.fill(7)(16L).map(("__ref", _)))
      .toDF("s", "v")
    val row = Profile.log2Ks(b, col("s"), col("v"))
      .where(col("s") === "a").collect().head
    assert(row.getLong(4) === 0L && row.getLong(3) === 1000000L)
  }

  test("drift monitors: a malformed BinDelta poisons the query loudly (never a silent drop)") {
    implicit val sqlCtx = spark.sqlContext
    Seq[(String, org.apache.spark.sql.Dataset[BinDelta] => org.apache.spark.sql.Dataset[_])](
      ("chi2", ds => Chi2DriftStream.drifts(ds, Map(0 -> 1L))),
      ("ks", ds => KsDriftStream.drifts(ds, Map(0 -> 1L)))
    ).foreach { case (name, mk) =>
      val mem = MemoryStream[BinDelta]
      val q = mk(mem.toDS()).writeStream.format("memory")
        .queryName(s"bad_$name").outputMode("append").start()
      mem.addData(BinDelta("a", 63, 1L)) // bin out of range
      val e = intercept[Exception] { q.processAllAvailable() }
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS bad_$name")
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(_.getMessage != null)
        && causes(e).exists(c => Option(c.getMessage).exists(_.contains("invalid BinDelta"))),
        s"$name: expected the loud invalid-delta require, got $e")
    }
  }

  test("cusums: an int64 envelope breach poisons the query loudly, never a wrapped verdict") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DailyLevel]
    // den*y - num = (2^62)*4 - 1 > Long.MaxValue on day 1
    val q = CusumStream.cusums(mem.toDS(), Map("a" -> (1L, 1L << 62)))
      .writeStream.format("memory").queryName("cusum_breach")
      .outputMode("append").start()
    mem.addData(DailyLevel("a", 1, 4L))
    val e = intercept[Exception] { q.processAllAvailable() }
    q.stop()
    spark.sql("DROP TABLE IF EXISTS cusum_breach")
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage).exists(_.contains("exceeds int64"))),
      s"expected the loud envelope require, got $e")
  }

  // ---- rolling z-score ----

  private def runZ(batches: Seq[Seq[DailyLevel]], win: Int, c: Int,
      minN: Int): Seq[ZscoreFlag] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DailyLevel]
    val q = ZscoreStream.flags(mem.toDS(), win, c, minN)
      .writeStream.format("memory").queryName("z_rows")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("z_rows").as[ZscoreFlag].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS z_rows")
    got
  }

  test("zscore: emitted flags ARE the batch rollingZscore rows (multi-key, split mid-series)") {
    // quiet series with planted spikes; key b shorter than minN gate
    // second spike at day 28: day 17's spike has left its trailing
    // window (18..27), so both judge against quiet windows
    val rows = (1 to 30).map { d =>
      ("a", d, if (d == 17 || d == 28) 900L else 100L + (d % 3))
    } ++ (1 to 5).map(d => ("b", d, 50L))
    val win = 10; val c = 3; val minN = 4
    val batch = TimeSeries.rollingZscore(rows.toDF("k", "day", "cents"),
        col("k"), col("day"), col("cents"), win, c, minN)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSet
    val levels = rows.map { case (k, d, v) => DailyLevel(k, d, v) }
    val got = runZ(Seq(levels.take(11), levels.slice(11, 12), levels.drop(12)),
      win, c, minN)
      .map(f => (f.k, f.day, f.v, f.n_win, f.z2_num, f.z2_den)).toSet
    assert(got === batch)
    assert(got.exists(_._2 == 17) && got.exists(_._2 == 28),
      s"planted spikes must flag: $got")
    assert(!got.exists(_._1 == "b"), "5-day series is under the minN gate")
  }

  test("zscore: late day behind the frontier is dropped; window truly trails (a spike never judges itself)") {
    val lv = (1 to 12).map(d => DailyLevel("a", d, if (d == 10) 999L else 7L))
    val withLate = lv.take(11) ++ Seq(DailyLevel("a", 3, 888L)) ++ lv.drop(11)
    val got = runZ(Seq(withLate), 8, 2, 3)
    // day 10 flags (spike vs quiet tail); the late day-3 re-send is dropped,
    // so day 11/12 judge against windows containing the ORIGINAL day 3
    assert(got.map(_.day).contains(10))
    assert(!got.exists(f => f.day == 3))
    // day 10's window is days 2..9 (all 7s): den = 0, num > 0
    val f10 = got.find(_.day == 10).get
    assert(f10.z2_den === "0" && f10.n_win === 8L)
  }

  // ---- EWMA feature monitor ----

  private def runEwma(batches: Seq[Seq[OrderLevel]], taps: Int): Seq[EwmaRow] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[OrderLevel]
    val q = EwmaStream.ewmas(mem.toDS(), taps)
      .writeStream.format("memory").queryName("ewma_rows")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("ewma_rows").as[EwmaRow].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS ewma_rows")
    got
  }

  test("ewma: latest emission equals batch ewmaLast EXACTLY, under shuffled out-of-order arrival") {
    val taps = 8
    val rows = (for {
      (k, n) <- Seq(("a", 13), ("b", 5), ("c", 1))
      i <- 1 to n
    } yield OrderLevel(k, 1000L + i * 7, i * 100L + k.hashCode % 50,
      (i * 37 % 90) - 20L))
    // deterministic shuffle: interleave by index parity, reversed halves
    val (ev, od) = rows.zipWithIndex.partition(_._2 % 2 == 0)
    val shuffled = ev.map(_._1).reverse ++ od.map(_._1)
    val got = runEwma(Seq(shuffled.take(7), shuffled.slice(7, 8), shuffled.drop(8)), taps)
    // latest verdict per key: max n_emit (the monotone sequence number)
    val latest = got.groupBy(_.k).map { case (k, es) => k -> es.maxBy(_.n_emit) }
    // batch twin over the same rows
    val df = rows.toDF("k", "tus", "ord", "m")
      .select(col("k"), timestamp_micros(col("tus")).as("ts"), col("ord"), col("m"))
    val batch = TimeSeries.ewmaLast(df, col("k"), col("ts"), col("ord"),
        col("m"), taps)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(latest.keySet === batch.keySet)
    latest.foreach { case (k, e) =>
      assert((e.k_used, e.ewma_m, e.last_m) === batch(k), s"key $k: $e vs ${batch(k)}")
    }
  }

  test("ewma: O(taps) state — a stale arrival below the full window emits NOTHING; window stays bounded") {
    val taps = 4
    val fresh = (1 to 10).map(i => OrderLevel("a", 100L + i, i.toLong, i * 10L))
    val got1 = runEwma(Seq(fresh), taps)
    assert(got1.last.k_used === taps.toLong)
    // an event OLDER than everything in the full window: absorbed silently
    val got2 = runEwma(Seq(fresh, Seq(OrderLevel("a", 1L, 0L, 999999L))), taps)
    assert(got2.size === got1.size,
      s"stale arrival re-emitted: ${got2.size} vs ${got1.size}")
    // but a newer event displaces the tail and re-emits
    val got3 = runEwma(Seq(fresh, Seq(OrderLevel("a", 999L, 99L, 70L))), taps)
    assert(got3.size === got1.size + 1)
    assert(got3.last.last_m === 70L)
  }

  test("chi2 + ks are ORDER-INDEPENDENT: fully reversed one-delta-per-batch arrival converges to the in-order final verdict") {
    // the round-14 lateness-contract audit: additive O(bins) state
    // commutes, so χ²/KS join Ewma in the order-independent column;
    // Cusum (running-sum) and Zscore (trailing frontier) are frontier
    // twins BY CONTRACT — their late-drop pins live in their own tests
    val own = Seq(1L, 2L, 3L, 5L, 9L, 17L, 33L, 900L, 901L, 902L, 64L, 70L)
    val ref = Seq(1L, 1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L)
    val deltas = binCounts(own).toSeq.map { case (b, n) => BinDelta("a", b, n) }
    val refM = binCounts(ref)
    val inOrder = runChi2(Seq(deltas), refM).maxBy(_.n_own)
    val reversed = runChi2(deltas.reverse.map(Seq(_)), refM).maxBy(_.n_own)
    assert(reversed === inOrder)
    val ksIn = runKs(Seq(deltas), refM).maxBy(_.n_own)
    val ksRev = runKs(deltas.reverse.map(Seq(_)), refM).maxBy(_.n_own)
    assert(ksRev === ksIn)
  }

  test("ewma: at-least-once replay absorbed — a re-delivered observation never double-occupies taps") {
    val taps = 4
    val rows = (1 to 6).map(i => OrderLevel("a", 100L + i, i.toLong, i * 10L))
    val once = runEwma(Seq(rows), taps)
    // replay the newest two observations in a later batch: the window
    // merges by (tus, ord) identity, so the set is unchanged — no
    // re-emission and the standing verdict is identical
    val replay = runEwma(Seq(rows, rows.takeRight(2)), taps)
    assert(replay.size === once.size,
      s"replay re-emitted: ${replay.size} vs ${once.size}")
    assert(replay.maxBy(_.n_emit) === once.maxBy(_.n_emit))
    // duplicates inside ONE batch collapse the same way
    val dup = runEwma(Seq(rows ++ rows.takeRight(3)), taps)
    assert(dup.maxBy(_.n_emit).ewma_m === once.maxBy(_.n_emit).ewma_m)
    assert(dup.maxBy(_.n_emit).k_used === taps.toLong)
  }
}

/** Pins [[DedupStream]] — the x1/x30 streaming twin: batch-keeper
  * parity, order independence (min commutes), replay idempotence of
  * the keeper, O(1)-state flood behavior, and the keeper_changed
  * signal. */
class DedupStreamSpec extends graft.SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[DocDigest]]): Seq[DedupRow] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocDigest]
    val q = DedupStream.keepers(mem.toDS())
      .writeStream.format("memory").queryName("dedup_rows")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("dedup_rows").as[DedupRow].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS dedup_rows")
    got
  }

  private def finalKeepers(rows: Seq[DedupRow]): Map[String, Long] =
    rows.groupBy(_.digest).map { case (d, rs) => d -> rs.last.keeper }

  test("keepers: final keeper is min(doc_id) — the batch x1 election — under any arrival order") {
    val docs = Seq(DocDigest(5, "a"), DocDigest(3, "a"), DocDigest(9, "a"),
      DocDigest(7, "b"), DocDigest(2, "b"), DocDigest(4, "c"))
    val fwd = run(Seq(docs.take(3), docs.drop(3)))
    val rev = run(Seq(docs.reverse.take(3), docs.reverse.drop(3)))
    val expect = Map("a" -> 3L, "b" -> 2L, "c" -> 4L)
    assert(finalKeepers(fwd) === expect)
    assert(finalKeepers(rev) === expect)
  }

  test("keepers: keeper_changed fires on first sight and demotion, not on a larger id") {
    val got = run(Seq(Seq(DocDigest(5, "a")), Seq(DocDigest(9, "a")),
      Seq(DocDigest(3, "a"))))
    assert(got.map(r => (r.keeper, r.keeper_changed)) ===
      Seq((5L, 1), (5L, 0), (3L, 1)))
  }

  test("keepers: at-least-once replay never changes the keeper (min is idempotent)") {
    val b1 = Seq(DocDigest(4, "a"), DocDigest(8, "a"))
    val got = run(Seq(b1, b1)) // the whole batch redelivered
    assert(got.map(_.keeper) === Seq(4L, 4L))
    // n_seen double-counts — the documented trade
    assert(got.map(_.n_seen) === Seq(2L, 4L))
  }

  test("keepers: a 10k identical-doc flood costs ONE state entry, keeper exact") {
    val flood = (1L to 10000L).map(i => DocDigest(10001L - i, "hot"))
    val got = run(Seq(flood))
    assert(got === Seq(DedupRow("hot", 1L, 10000L, 1)))
  }

  test("keepers: negative ids refuse loudly (sentinel protection)") {
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(Seq(Seq(DocDigest(-1, "a"))))
    }
    assert(ex.getMessage.contains("keepers") ||
      ex.getCause.getMessage.contains("doc_id"))
  }
}

/** Pins [[KmvStream]] — the x180 streaming twin with the family's
  * strongest contract: set-insert-trim state is commutative AND
  * idempotent, so arrival order cannot move the sketch and a replayed
  * batch emits NOTHING. Batch parity against
  * [[graft.ext.Sketches.kmvDistinct]]'s estimate columns. */
class KmvStreamSpec extends graft.SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[ElemHash]], k: Int): Seq[KmvRow] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ElemHash]
    val q = KmvStream.sketches(mem.toDS(), k)
      .writeStream.format("memory").queryName("kmv_rows")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("kmv_rows").as[KmvRow].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS kmv_rows")
    got
  }

  test("sketches: final row equals the batch kmvDistinct estimate (parity pin)") {
    import org.apache.spark.sql.functions._
    val elems = (1L to 500L).map(i => ("a", s"elem-$i"))
    val batch = graft.ext.Sketches.kmvDistinct(
        elems.toDF("key", "e"), col("key"), col("e"), k = 64)
      .select("n_sketch", "kth_min", "est_distinct")
      .as[(Long, Long, Long)].head()
    val hashed = elems.toDF("key", "e")
      .select(col("key"),
        graft.ext.Dedup.md5Hash60(col("e")).as("h"))
      .as[(String, Long)].collect().map { case (k2, h) => ElemHash(k2, h) }
    val got = run(Seq(hashed.take(200).toSeq, hashed.drop(200).toSeq), k = 64)
    val last = got.last
    assert((last.n_sketch, last.kth_min, last.est_distinct) === batch)
  }

  test("sketches: arrival order cannot move the sketch; replay emits NOTHING") {
    val hs = (1L to 100L).map(i => ElemHash("a", i * 7919L))
    val fwd = run(Seq(hs.take(50), hs.drop(50)), k = 16)
    val rev = run(Seq(hs.reverse.take(50), hs.reverse.drop(50)), k = 16)
    assert(fwd.last === rev.last)
    // replay the ENTIRE stream again: state identical -> zero new rows
    val replayed = run(Seq(hs, hs), k = 16)
    assert(replayed.size === 1, replayed.toString)
    assert(replayed.last === fwd.last)
  }

  test("sketches: an identical-element flood costs one slot and one row") {
    val flood = (1 to 5000).map(_ => ElemHash("hot", 42L))
    val got = run(Seq(flood), k = 8)
    assert(got === Seq(KmvRow("hot", 1L, 42L, 1L)))
  }

  test("sketches: out-of-range hashes refuse loudly") {
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(Seq(Seq(ElemHash("a", -5L))), k = 8)
    }
    assert(ex.getMessage.contains("sketches") ||
      ex.getCause.getMessage.contains("2^60"))
  }
}

/** Pins [[CurationStream]] — the curationFlags streaming twin
  * (round 15): TOTAL batch parity (the latest verdict per doc equals
  * the batch `curationFlags` row, all seven columns) over shuffled
  * arrival, replay idempotence of every verdict value (min election —
  * the DedupStream contract), the demotion re-issue signal, and O(1)
  * state under an identical-content flood. */
class CurationStreamSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  // en/de/junk corpus with byte-near-identical duplicate families:
  // ids 11/7/23 share normalized content (7 must win the election),
  // 30/31 share content (30 wins), the rest are singletons; 40 fails
  // the quality gate (lorem ipsum), 41 fails the word-count floor.
  private val enText = "the quick brown fox and the lazy dog were " +
    "walking of a morning in the park with all of their many friends"
  private val deText = "der hund und die katze sind mit dem kleinen " +
    "kind in das haus gegangen und nicht auf der strasse geblieben"
  private def docs = Seq(
    (11L, enText), (7L, enText + " "), (23L, enText),  // normalize folds ws
    (30L, deText), (31L, deText),
    (2L, enText + " another unique sentence entirely of its own"),
    (40L, "lorem ipsum dolor sit amet the and of with this text here today"),
    (41L, "too short")
  ).toDF("doc_id", "text")

  private def run(batches: Seq[Seq[CurationArrival]]): Seq[CurationVerdict] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CurationArrival]
    val q = CurationStream.verdicts(mem.toDS())
      .writeStream.format("memory").queryName("cur_rows")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("cur_rows").as[CurationVerdict].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS cur_rows")
    got
  }

  private def latestPerDoc(rows: Seq[CurationVerdict]): Map[Long, (String, Int, Int, Int, Int, Int)] =
    rows.zipWithIndex.groupBy(_._1.doc_id).map { case (id, rs) =>
      val v = rs.maxBy(_._2)._1
      id -> ((v.predicted, v.is_canonical, v.keep_lang, v.keep_quality,
        v.keep_sample, v.keep_flag))
    }

  private val rates = Map("en" -> 0.5)

  private def batchTruth: Map[Long, (String, Int, Int, Int, Int, Int)] =
    graft.ext.Curation.curationFlags(docs, col("doc_id"), col("text"),
        rates = rates)
      .as[(Long, String, Int, Int, Int, Int, Int)].collect()
      .map { case (id, p, c, l, q2, s, f) => id -> ((p, c, l, q2, s, f)) }
      .toMap

  private def arrivals: Seq[CurationArrival] =
    CurationStream.arrivalsFrom(docs, col("doc_id"), col("text"),
      rates = rates).collect().toSeq

  test("verdicts: latest row per doc equals the batch curationFlags row — any arrival order") {
    val truth = batchTruth
    val arr = arrivals
    val shuffled = new scala.util.Random(42).shuffle(arr)
    for (order <- Seq(arr, arr.reverse, shuffled)) {
      val got = latestPerDoc(run(Seq(order.take(3), order.slice(3, 6), order.drop(6))))
      assert(got === truth, s"order ${order.map(_.doc_id)}")
    }
  }

  test("verdicts: demotion re-issues the OLD keeper's corrected row with keeper_changed=1") {
    val byId = arrivals.map(a => a.doc_id -> a).toMap
    // 11 arrives first (wins its fingerprint), then 7 displaces it
    val got = run(Seq(Seq(byId(11L)), Seq(byId(7L))))
    assert(got.map(v => (v.doc_id, v.is_canonical, v.keeper_changed)) ===
      Seq((11L, 1, 1), (7L, 1, 1), (11L, 0, 1)))
    // the demoted row carries 11's own stateless flags, zeroed keep_flag
    val demo = got.last
    assert(demo.keep_flag === 0)
    assert((demo.keep_lang, demo.keep_quality) ===
      (byId(11L).keep_lang, byId(11L).keep_quality))
  }

  test("verdicts: at-least-once replay re-emits byte-identical rows; the keeper never moves") {
    val arr = arrivals
    val once = run(Seq(arr))
    val replayed = run(Seq(arr, arr))
    assert(replayed.size === 2 * once.size)
    // group-emission order within a batch is not pinned — compare as
    // multisets; the replayed half is value-identical except
    // keeper_changed (first-sight fired already): upsert-idempotent
    def canon(rs: Seq[CurationVerdict]) =
      rs.map(_.copy(keeper_changed = 0)).sortBy(v => (v.doc_id, v.is_canonical))
    assert(canon(replayed.take(once.size)) === canon(once))
    assert(canon(replayed.drop(once.size)) === canon(once))
    assert(latestPerDoc(replayed) === latestPerDoc(once))
  }

  test("verdicts: a 10k identical-content flood folds into ONE keeper state entry") {
    val a = arrivals.find(_.doc_id == 2L).get
    val flood = (1L to 10000L).map(i => a.copy(doc_id = 10000L + i))
      .sortBy(i => -i.doc_id)
    val got = run(Seq(flood))
    assert(got.size === 10000)
    assert(got.count(_.is_canonical == 1) === 1)
    assert(got.find(_.is_canonical == 1).get.doc_id === 10001L)
  }
}

/** Pins [[ChunkDedupStream]] — the x259 streaming twin (14th): bounded
  * min-set state per chunk hash, monotone dup flip with correction
  * re-issue, and TOTAL batch parity: latest row per (h, doc) summed per
  * doc reproduces [[graft.ext.Dedup.chunkDedup]] exactly. */
class ChunkDedupStreamSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  // window=8 grid: hash 'aaaaaaaa' is cross-doc (d1, d2), 'bbbbbbbb'
  // is cross-doc (d1, d4 — twice in d4), 'cccccccc'/'dddddddd' single
  private def docs = Seq(
    (1L, "aaaaaaaabbbbbbbb"),
    (2L, "aaaaaaaacccccccc"),
    (3L, "dddddddd"),
    (4L, "bbbbbbbbbbbbbbbb")
  ).toDF("doc_id", "text")

  private def run(batches: Seq[Seq[ChunkCell]]): Seq[ChunkDupRow] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ChunkCell]
    val q = ChunkDedupStream.verdicts(mem.toDS())
      .writeStream.format("memory").queryName("chunk_rows")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("chunk_rows").as[ChunkDupRow].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS chunk_rows")
    got
  }

  /** Latest row per (h, doc) — the documented upsert — rolled per doc
    * exactly as the batch op accounts. */
  private def rollup(rows: Seq[ChunkDupRow]): Map[Long, (Long, Long, Long)] =
    rows.zipWithIndex.groupBy(r => (r._1.h, r._1.doc_id))
      .map { case (_, rs) => rs.maxBy(_._2)._1 }
      .groupBy(_.doc_id).map { case (d, rs) =>
        val n = rs.map(_.c).sum
        val dup = rs.filter(_.is_dup == 1).map(_.c).sum
        d -> ((n, dup, dup * 1000000L / n))
      }

  private def cells: Seq[ChunkCell] =
    ChunkDedupStream.cellsFrom(docs, col("doc_id"), col("text"), window = 8)
      .collect().toSeq.sortBy(c => (c.h, c.doc_id))

  private def batchTruth: Map[Long, (Long, Long, Long)] =
    graft.ext.Dedup.chunkDedup(docs, col("doc_id"), col("text"), window = 8)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (d, n, dup, ppm) => d -> ((n, dup, ppm)) }.toMap

  test("verdicts: latest-per-(h,doc) rollup equals batch chunkDedup — any arrival order, any batch split") {
    val truth = batchTruth
    val cs = cells
    val shuffled = new scala.util.Random(7).shuffle(cs)
    for (order <- Seq(cs, cs.reverse, shuffled)) {
      val got = rollup(run(Seq(order.take(2), order.slice(2, 4), order.drop(4))))
      assert(got === truth, s"order ${order.map(c => (c.h.take(6), c.doc_id))}")
    }
  }

  test("verdicts: the flip re-issues CORRECTION rows for docs that arrived before the hash went dup") {
    val a = cells.filter(_.c == 1L).groupBy(_.h).values
      .find(_.map(_.doc_id).toSet == Set(1L, 2L)).get // the 'aaaaaaaa' cells
    val first = a.find(_.doc_id == 1L).get
    val second = a.find(_.doc_id == 2L).get
    val got = run(Seq(Seq(first), Seq(second)))
    assert(got.map(r => (r.doc_id, r.is_dup, r.dup_changed)) ===
      Seq((1L, 0, 0), (2L, 1, 1), (1L, 1, 1)))
  }

  test("verdicts: at-least-once replay is VALUE-identical (c carried, never accumulated); latest rollup unchanged") {
    val cs = cells
    val got = run(Seq(cs, cs)) // full redelivery
    val (orig, replay) = got.splitAt(cs.size)
    assert(replay.map(r => (r.h, r.doc_id, r.c, r.is_dup)).toSet ===
      orig.map(r => (r.h, r.doc_id, r.c, r.is_dup)).toSet)
    assert(replay.forall(_.dup_changed == 0)) // flip fires once, ever
    assert(rollup(got) === batchTruth)
  }

  test("verdicts: a 10k-doc viral block stays linear in output and all rows read dup after the flip") {
    val flood = (1L to 10000L).map(i => ChunkCell("hot", i, 1L))
    val got = run(Seq(flood.take(1), flood.drop(1)))
    assert(got.size === 10001) // 1 pre-flip + 9999 batch + 1 correction
    assert(got.head.is_dup === 0)
    assert(got.drop(1).forall(_.is_dup == 1))
    assert(got.count(_.doc_id == 1L) === 2) // original + correction
  }

  test("verdicts: a partial re-count of a stored (hash, doc) cell refuses loudly (wire-contract violation)") {
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(Seq(Seq(ChunkCell("a", 1L, 1L)), Seq(ChunkCell("a", 1L, 2L))))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("DIFFERENT")), msgs(ex).mkString("|"))
  }
}
