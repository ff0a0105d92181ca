package graft.ext

import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Pins the round-10 fifth batch: grid fill (LOCF + lerp), blocked edit
  * distance, window co-occurrence, median/MAD outliers, journey
  * trigrams, and reciprocal-rank fusion — hand-computed fixtures only.
  */
class TimeSeriesSpec extends graft.SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("burstiness: uniform series is 0, gap-day burst overdisperses, single day is NULL") {
    val rows =
      // "burst": 3 events day 1, zero day 2, 3 events day 3:
      //   span 3, S=6, Q=18 → vmr = (3·18 − 36)·1e6 / (2·6) = 1500000
      (1 to 3).map(_ => ("burst", ts("2024-01-01 10:00:00"))) ++
      (1 to 3).map(_ => ("burst", ts("2024-01-03 10:00:00"))) ++
      // "flat": 2 events on each of 3 consecutive days → vmr 0
      (1 to 2).flatMap(d => Seq(
        ("flat", ts(s"2024-01-0$d 09:00:00")), ("flat", ts(s"2024-01-0$d 09:30:00")))) ++
      Seq(("flat", ts("2024-01-03 09:00:00")), ("flat", ts("2024-01-03 09:30:00"))) ++
      // "solo": one day only → span 1 → NULL vmr, flag 0
      Seq(("solo", ts("2024-01-05 12:00:00")))
    val got = TimeSeries.burstiness(rows.toDF("k", "t"), col("k"), col("t"))
      .orderBy("k")
      .as[(String, Long, Long, Long, Option[Long], Int)].collect()
    assert(got(0) === (("burst", 3L, 2L, 6L, Some(1500000L), 1)))
    assert(got(1) === (("flat", 3L, 3L, 6L, Some(0L), 0)))
    assert(got(2) === (("solo", 1L, 1L, 1L, None, 0)))
  }

  // user 1: two events in hour 01 (the later one must win), a 2-hour
  // gap, then one event in hour 04
  private val events = Seq(
    (1L, ts("2024-01-01 01:10:00"), 1L, 10.0),
    (1L, ts("2024-01-01 01:50:00"), 2L, 20.0),
    (1L, ts("2024-01-01 04:30:00"), 3L, 50.0)
  ).toDF("user_id", "ts", "event_id", "value")

  test("locfGrid: dense hourly grid, last-in-hour election, carry-forward") {
    val got = TimeSeries.locfGrid(events, col("user_id"), col("ts"),
      col("event_id"), col("value"))
      .orderBy("h")
      .as[(Long, Timestamp, Double, Int)].collect()
    assert(got === Array(
      (1L, ts("2024-01-01 01:00:00"), 20.0, 1), // last event in hour wins
      (1L, ts("2024-01-01 02:00:00"), 20.0, 0),
      (1L, ts("2024-01-01 03:00:00"), 20.0, 0),
      (1L, ts("2024-01-01 04:00:00"), 50.0, 1)))
  }

  test("locfGrid: equal-ts events in one hour break ties by event id") {
    val tie = Seq(
      (7L, ts("2024-01-01 00:30:00"), 1L, 1.0),
      (7L, ts("2024-01-01 00:30:00"), 2L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.locfGrid(tie, col("user_id"), col("ts"),
      col("event_id"), col("value")).select("v_locf").as[Double].head()
    assert(got === 2.0)
  }

  test("lerpGrid: gap hours interpolate between microsecond anchors") {
    val got = TimeSeries.lerpGrid(events, col("user_id"), col("ts"),
      col("event_id"), col("value"))
      .orderBy("h")
      .as[(Long, Timestamp, Double, Int)].collect()
    // anchors: 01:50 (v=20) and 04:30 (v=50), span 160 min;
    // 02:00 is 10/160 = 1/16 in → 21.875; 03:00 is 70/160 = 7/16 → 33.125
    // (both exact binary fractions — the lerp must reproduce them bit-for-bit)
    assert(got === Array(
      (1L, ts("2024-01-01 01:00:00"), 20.0, 1),
      (1L, ts("2024-01-01 02:00:00"), 21.875, 0),
      (1L, ts("2024-01-01 03:00:00"), 33.125, 0),
      (1L, ts("2024-01-01 04:00:00"), 50.0, 1)))
  }

  test("editDistancePairs: near-dups meet, boundary straddle meets, distance exact") {
    val docs = Seq(
      (1L, "a" * 64),                  // band 2 (and probe 3)
      (2L, "a" * 63 + "b"),            // band 1 boundary? 64 chars → band 2; one substitution
      (3L, "a" * 31),                  // band 0, probes band 1
      (4L, "a" * 33),                  // band 1 — straddle pair with 3 (dist 2)
      (5L, "z" * 200 + "q" * 200)      // far away, alone in its band
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, col("doc_id"), col("text"))
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect()
    // (1,2): one substitution; (3,4): two inserts across the 31/33 band
    // boundary (meets via the band+1 probe); (1,4)/(2,4): 33 vs 64 chars
    // = 31 inserts, inside maxDist=48 via doc 4's probe into band 2
    assert(got === Array((1L, 2L, 1), (1L, 4L, 31), (2L, 4L, 31), (3L, 4L, 2)))
  }

  test("editDistancePairs: a band fatter than maxBand is dropped whole") {
    val flood = (1L to 300L).map(i => (i, "x" * 50)).toDF("doc_id", "text")
    assert(Dedup.editDistancePairs(flood, col("doc_id"), col("text")).count() === 0L)
  }

  test("cooccurTopK: window semantics, unordered normalization, count order") {
    val docs = Seq(
      Tuple1("d c b a"),  // reversed — pairs must still normalize to sorted order
      Tuple1("a b c d"),
      Tuple1("")          // empty doc contributes nothing
    ).toDF("text")
    val got = Vocab.cooccurTopK(docs, col("text"), window = 2, k = 10,
      minCount = 2L).as[(String, Long)].collect()
    // per doc (window 2): positions 0-1,0-2,1-2,1-3,2-3 → both docs yield
    // the same unordered pair set {ab, ac, bc, bd, cd} → every count = 2
    assert(got === Array(("a b", 2L), ("a c", 2L), ("b c", 2L),
      ("b d", 2L), ("c d", 2L)))
  }

  test("cooccurTopK: minCount floors and k cuts deterministically") {
    val docs = Seq(Tuple1("a b"), Tuple1("a b"), Tuple1("x y")).toDF("text")
    val got = Vocab.cooccurTopK(docs, col("text"), window = 3, k = 1,
      minCount = 2L).as[(String, Long)].collect()
    assert(got === Array(("a b", 2L))) // "x y" count 1 floored out
  }

  test("medianMadOutliers: hand-computed median, MAD, outlier count") {
    val d = (1 to 7).map(v => (1L, v.toDouble)) :+ ((1L, 100.0))
    val got = Profile.medianMadOutliers(d.toDF("user_id", "value"),
      col("user_id"), col("value"))
      .as[(Long, Long, Double, Double, Long)].head()
    // sorted 1..7,100: lower median = 4th = 4; adev sorted
    // 0,1,1,2,2,3,3,96 → MAD = 4th = 2; only 96 > 4·2
    assert(got === ((1L, 8L, 4.0, 2.0, 1L)))
  }

  test("journeyTrigrams: ordered paths with id tiebreak, corpus counts") {
    val e = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1L, "A"),
      (1L, ts("2024-01-01 00:00:02"), 2L, "B"),
      (1L, ts("2024-01-01 00:00:03"), 3L, "C"),
      (1L, ts("2024-01-01 00:00:03"), 4L, "D"), // equal ts → id orders it AFTER C
      (2L, ts("2024-01-01 00:00:01"), 5L, "A"),
      (2L, ts("2024-01-01 00:00:02"), 6L, "B"),
      (2L, ts("2024-01-01 00:00:03"), 7L, "C")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.EventAnalytics.journeyTrigrams(e, col("user_id"),
      col("ts"), col("event_id"), col("event_type"))
      .orderBy(col("cnt").desc, col("pattern"))
      .as[(String, Long)].collect()
    assert(got === Array(("A>B>C", 2L), ("B>C>D", 1L)))
  }

  test("rrfFuse: floor-division scores, missing list contributes zero") {
    val a = Seq((0L, 1L, 1), (0L, 2L, 2)).toDF("qid", "neighbor_id", "rank")
    val b = Seq((0L, 2L, 1), (0L, 3L, 2)).toDF("qid", "neighbor_id", "rank")
    val got = Relevance.rrfFuse(a, b, kRrf = 60)
      .orderBy("rank")
      .select("neighbor_id", "rrf_e6", "rank")
      .as[(Long, Long, Int)].collect()
    // n2: 1e6/61 + 1e6/62 = 16393 + 16129 = 32522; n1: 16393; n3: 16129
    assert(got === Array((2L, 32522L, 1), (1L, 16393L, 2), (3L, 16129L, 3)))
  }

  test("knnBruteL2: euclidean rank differs from cosine on unnormalized vectors") {
    val embs = Similarity.withNorm(
      Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(30.0f, 40.0f)), (2L, Seq(0.0f, 2.0f)))
        .toDF("vec_id", "embedding"), col("vec_id"), col("embedding"))
    val l2 = Similarity.knnBruteL2(embs, embs.where(col("vec_id") === 0), k = 2)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    // L2: dist to 2 = sqrt(1+4) ≈ 2.236 < dist to 1 = sqrt(29²+40²)
    assert(l2.map(_._2).toSeq === Seq(2L, 1L))
    val cos = Similarity.knnBrute(embs, embs.where(col("vec_id") === 0), k = 2)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    // cosine: 1 scores 0.6, 2 scores 0 → opposite order
    assert(cos.map(_._2).toSeq === Seq(1L, 2L))
  }
}

class EwmaSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def df(rows: (Long, Long, Long, Long)*) =
    rows.toDF("k", "t", "o", "m")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("o"), col("m"))

  test("full history: newest weight 2^(taps-1), exact integer quotient") {
    // key 1: values 10 (old), 20 (new) with taps=2 → (20·2 + 10·1) div 3 = 16
    val got = TimeSeries.ewmaLast(df((1L, 1L, 1L, 10L), (1L, 2L, 2L, 20L)),
        col("k"), col("ts"), col("o"), col("m"), taps = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(got === Array((1L, 2L, 16L, 20L)))
  }

  test("short history renormalizes the denominator; only last taps used") {
    val rows = (1L to 5L).map(i => (7L, i, i, i * 100L)) // 100..500
    // taps=4 keeps 500,400,300,200 with weights 8,4,2,1 → 6400/15 = 426
    val got = TimeSeries.ewmaLast(df(rows: _*),
        col("k"), col("ts"), col("o"), col("m"), taps = 4)
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((7L, 4L, 426L, 500L)))
    // single observation: ewma IS the observation (den = 2^t − 2^(t−1))
    val one = TimeSeries.ewmaLast(df((9L, 1L, 1L, 123L)),
        col("k"), col("ts"), col("o"), col("m"), taps = 4)
      .as[(Long, Long, Long, Long)].head()
    assert(one === ((9L, 1L, 123L, 123L)))
  }

  test("ties on timestamp break by the order column, newest first") {
    val got = TimeSeries.ewmaLast(
        df((1L, 5L, 1L, 100L), (1L, 5L, 2L, 900L)),
        col("k"), col("ts"), col("o"), col("m"), taps = 2)
      .as[(Long, Long, Long, Long)].head()
    // o=2 is newest → last_m = 900; (900·2 + 100) div 3 = 633
    assert(got === ((1L, 2L, 633L, 900L)))
  }

  test("taps at the 62 cap: m·2^61 rides DECIMAL, no int64 wrap") {
    // constant series m=1000 with k=3 observations at taps=62: the top
    // weight alone (1000·2^61) is ~2.3e21, far past 2^63 — the old long
    // accumulator wrapped negative; EWMA of a constant must be exact
    val rows = (1L to 3L).map(i => (1L, i, i, 1000L))
    val got = TimeSeries.ewmaLast(df(rows: _*),
        col("k"), col("ts"), col("o"), col("m"), taps = 62)
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((1L, 3L, 1000L, 1000L)))
  }
}

class TrendCusumSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("trend slope: exact rational ppm on hand series; flat is zero") {
    // y = 3x + 7 over x = 1..4 → slope exactly 3 → 3_000_000 ppm
    val rising = Seq((1L, 10L), (2L, 13L), (3L, 16L), (4L, 19L))
      .map { case (x, y) => ("a", x, y) }
    val flat = Seq(("b", 1L, 5L), ("b", 2L, 5L), ("b", 9L, 5L))
    val got = TimeSeries.trendSlope((rising ++ flat).toDF("k", "x", "y"),
        col("k"), col("x"), col("y"))
      .orderBy("key").as[(String, Long, Long, Option[Long])].collect()
    assert(got === Array(("a", 4L, 58L, Some(3000000L)), ("b", 3L, 15L, Some(0L))))
  }

  test("degenerate x-spread (single point) yields NULL, not a crash") {
    val got = TimeSeries.trendSlope(Seq(("a", 5L, 9L)).toDF("k", "x", "y"),
        col("k"), col("x"), col("y"))
      .as[(String, Long, Long, Option[Long])].head()
    assert(got === (("a", 1L, 9L, None)))
  }

  test("cusum peak finds a level shift at the shift point") {
    // key a: 10,10,10,20,20,20 — mean 15; dev·n = 6y−90:
    // cusums: -30,-60,-90,-60,-30,0 → peak |.| at x=3 (-90)
    val d = Seq(10L, 10L, 10L, 20L, 20L, 20L).zipWithIndex
      .map { case (y, i) => ("a", (i + 1).toLong, y) }
    val got = TimeSeries.cusumPeak(d.toDF("k", "x", "y"),
        col("k"), col("x"), col("y"))
      .as[(String, Long, Long, Long)].head()
    assert(got === (("a", 6L, 3L, -90L)))
  }

  test("cusum tie takes the earliest x; stable series peaks near zero") {
    // 5,5,5: all cusums are exactly 0 → earliest x wins
    val d = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L))
    val got = TimeSeries.cusumPeak(d.toDF("k", "x", "y"),
        col("k"), col("x"), col("y"))
      .as[(String, Long, Long, Long)].head()
    assert(got === (("a", 3L, 1L, 0L)))
  }
}

class Scd2Spec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def scd(rows: (Long, Long, Long, String)*) =
    TimeSeries.scd2Intervals(
      rows.toDF("u", "t", "o", "v")
        .select(col("u"), timestamp_micros(col("t")).as("ts"), col("o"), col("v")),
      col("u"), col("ts"), col("o"), col("v"))

  test("runs collapse; intervals chain; the open version has NULL valid_to") {
    // user 1: A A B A → versions A[1,3) B[3,4) A[4,∞)
    val got = scd((1L, 1L, 1L, "A"), (1L, 2L, 2L, "A"), (1L, 3L, 3L, "B"),
        (1L, 4L, 4L, "A"))
      .orderBy("version")
      .select(col("version"), col("value"),
        unix_micros(col("valid_from")).as("f"), unix_micros(col("valid_to")).as("t"))
      .as[(Long, String, Long, Option[Long])].collect()
    assert(got === Array((1L, "A", 1L, Some(3L)), (2L, "B", 3L, Some(4L)),
      (3L, "A", 4L, None)))
  }

  test("interval chaining invariant: valid_to == next version's valid_from, per key") {
    val rows = for (u <- 1L to 3L; i <- 1L to 20L)
      yield (u, i * 10L + u, i, if ((i / 3) % 2 == 0) "X" else "Y")
    val got = scd(rows: _*)
      .select(col("key"), col("version"),
        unix_micros(col("valid_from")).as("f"), unix_micros(col("valid_to")).as("t"))
      .as[(Long, Long, Long, Option[Long])].collect()
      .groupBy(_._1).values
    got.foreach { vs =>
      val s = vs.sortBy(_._2)
      s.sliding(2).foreach {
        case Array(a, b) => assert(a._4 === Some(b._3))
        case _ =>
      }
      assert(s.last._4.isEmpty) // exactly one open version per key
      assert(s.map(_._2).toSeq === (1L to s.length).toSeq)
    }
  }

  test("timestamp ties break by the order column") {
    // same ts: order 1=A, 2=B → B is the later state
    val got = scd((1L, 5L, 1L, "A"), (1L, 5L, 2L, "B"))
      .orderBy("version").select("value").as[String].collect()
    assert(got === Array("A", "B"))
  }
}

class PartitionGapsSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def gaps(rows: (Long, String)*) =
    graft.ext.Layout.partitionGaps(
      rows.toDF("k", "d").select(col("k"), to_timestamp(col("d")).as("ts")),
      col("k"), col("ts"))

  test("holes found, first gap named, dense keys report zero missing") {
    val got = gaps(
        (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 11:00:00"),
        (1L, "2024-01-05 09:00:00"), // missing Jan 3, 4
        (2L, "2024-02-01 00:00:00"), (2L, "2024-02-02 23:59:59"))
      .orderBy("key")
      .select(col("key"), col("span_days"), col("present_days"),
        col("missing_days"), col("first_missing").cast("string"))
      .as[(Long, Long, Long, Long, Option[String])].collect()
    assert(got(0) === ((1L, 5L, 3L, 2L, Some("2024-01-03"))))
    assert(got(1) === ((2L, 2L, 2L, 0L, None)))
  }

  test("multiple events per day collapse before the calendar explode") {
    val rows = (1L to 500L).map(i => (9L, s"2024-03-01 ${i % 24}:00:30"))
    val got = gaps(rows: _*).as[(Long, Long, Long, Long, Option[java.sql.Date])].head()
    assert(got === ((9L, 1L, 1L, 0L, None)))
  }

  // ---- TimeSeries.rankAutocorr ----

  private def acf(lags: Seq[Int], rows: (String, String, Long)*) =
    TimeSeries.rankAutocorr(
      rows.toDF("k", "d", "m").withColumn("d", to_date(col("d"))),
      col("k"), col("d"), col("m"), lags)
      .orderBy("key", "lag")

  test("rankAutocorr: monotone series is +1e6 at every lag; reversed is -1e6") {
    val up = (1 to 12).map(i => ("u", f"2024-01-$i%02d", i * 10L))
    val down = (1 to 12).map(i => ("d", f"2024-01-$i%02d", 1000L - i * 10L))
    val got = acf(Seq(1, 3), up ++ down: _*)
      .as[(String, Long, Long, Long, Long)].collect()
    // increasing series: ranks align, sum_d2 = 0, spearman = +1e6
    assert(got.filter(_._1 == "u").map(r => (r._2, r._4, r._5)).toSeq ===
      Seq((1L, 0L, 1000000L), (3L, 0L, 1000000L)))
    // decreasing series: x still increases with t inside each pair set?
    // no — pairs (x_t, x_{t+l}) are BOTH decreasing, so ranks align too
    assert(got.filter(_._1 == "d").forall(_._5 === 1000000L))
  }

  test("rankAutocorr: alternating series is negative at lag 1, +1e6 at lag 2") {
    val alt = (1 to 10).map(i =>
      ("a", f"2024-02-$i%02d", if (i % 2 == 0) 100L else 10L + i))
    val got = acf(Seq(1, 2), alt: _*)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r._5).toMap
    assert(got(1L) < 0L, s"lag1=${got(1L)}")
    assert(got(2L) === 1000000L)
  }

  test("rankAutocorr: position lag skips calendar gaps; hand-checked sum_d2") {
    // days 1,2,3,10,11 — position lag 1 pairs across the gap too
    val rows = Seq(("g", "2024-03-01", 1L), ("g", "2024-03-02", 2L),
      ("g", "2024-03-03", 3L), ("g", "2024-03-10", 4L), ("g", "2024-03-11", 5L))
    val got = acf(Seq(1), rows: _*).as[(String, Long, Long, Long, Long)].head()
    assert(got._3 === 4L)        // 4 pairs from 5 observations
    assert(got._4 === 0L)        // monotone: d = 0
    assert(got._5 === 1000000L)
  }

  test("rankAutocorr: multiple rows per day roll up before ranking; <2 pairs drops out") {
    val rows = Seq(("m", "2024-04-01", 5L), ("m", "2024-04-01", 7L),
      ("m", "2024-04-02", 20L)) // one pair only at lag 1
    assert(acf(Seq(1), rows: _*).count() === 0L)
    val rows3 = rows ++ Seq(("m", "2024-04-03", 30L))
    val got = acf(Seq(1), rows3: _*).as[(String, Long, Long, Long, Long)].head()
    assert(got._3 === 2L) // daily rollup: (12, 20, 30) -> 2 pairs
    assert(got._5 === 1000000L)
  }

  // ---- TimeSeries.rollingZscore ----

  private def zs(win: Int, c: Int, minN: Int, rows: (String, String, Long)*) =
    TimeSeries.rollingZscore(
      rows.toDF("k", "d", "m").withColumn("d", to_date(col("d"))),
      col("k"), col("d"), col("m"), win, c, minN)

  test("rollingZscore: a spike over a flat-with-jitter baseline flags; hand-checked num/den") {
    // alternating 100/102 for 10 days, then a 200 spike
    val base = (1 to 10).map(i =>
      ("a", f"2024-01-$i%02d", if (i % 2 == 0) 102L else 100L))
    val rows = base :+ (("a", "2024-01-11", 200L))
    val got = zs(28, 3, 8, rows: _*)
      .as[(String, java.sql.Date, Long, Long, String, String)].collect()
    assert(got.length === 1)
    val r = got.head
    assert(r._3 === 200L && r._4 === 10L)
    // n=10, s=1010, ss=10×100²+jitter: Σv² = 5·100² + 5·102² = 102020
    val num = BigInt(10L * 200 - 1010).pow(2)
    val den = BigInt(10) * 102020 - BigInt(1010) * 1010
    assert(BigInt(r._5) === num && BigInt(r._6) === den)
    assert(num > 9 * den)
  }

  test("rollingZscore: constant series never flags (zero variance, zero deviation)") {
    val rows = (1 to 15).map(i => ("c", f"2024-02-$i%02d", 50L))
    assert(zs(28, 3, 8, rows: _*).count() === 0L)
  }

  test("rollingZscore: warm-up days below minN are never judged") {
    // a wild value on day 3 can't flag: only 2 trailing rows exist
    val rows = Seq(("w", "2024-03-01", 10L), ("w", "2024-03-02", 11L),
      ("w", "2024-03-03", 99999L))
    assert(zs(28, 3, 3, rows: _*).count() === 0L)
  }

  test("maxConcurrency: overlap counts, half-open boundary does not") {
    // key s: [0,10) [5,15) [10,20) — at t=5 two open; at t=10 the first
    // closes BEFORE the third opens (tie order d=-1 first) → max 2 @ 5.
    // key t: [0,5) [5,10) — back-to-back, never concurrent → max 1 @ 0.
    // key z: the degenerate [7,7) is dropped → n_iv 1, not 2.
    val df = Seq(("s", 0L, 10L), ("s", 5L, 15L), ("s", 10L, 20L),
      ("t", 0L, 5L), ("t", 5L, 10L), ("z", 7L, 7L), ("z", 1L, 3L))
      .toDF("k", "st", "en")
      .select(col("k"), timestamp_micros(col("st")).as("st"),
        timestamp_micros(col("en")).as("en"))
    val got = TimeSeries.maxConcurrency(df, col("k"), col("st"), col("en"))
      .orderBy("k").as[(String, Long, Long, Long)].collect()
    assert(got === Array(("s", 3L, 2L, 5L), ("t", 2L, 1L, 0L),
      ("z", 1L, 1L, 1L)))
    // the sweep is deterministic under repartitioning (tie discipline,
    // not partition luck)
    val again = TimeSeries.maxConcurrency(df.repartition(7), col("k"),
      col("st"), col("en")).orderBy("k")
      .as[(String, Long, Long, Long)].collect()
    assert(again === got)
  }

  test("changepoint: level shift found at the true boundary; flat series gains zero") {
    // s: daily counts [1, 1, 5, 5] — the split after day 2 is exact:
    //   gain(2) = (4·2 + 100·2)e6/4 − 144e6/4 = 52e6 − 36e6 = 16e6
    //   (candidates 1 and 3 both read 41,333,333 − 36e6 = 5,333,333)
    // t: flat [2, 2] — gain 0, split at the only candidate (day 1)
    val rows =
      Seq(("s", "2024-01-01")) ++ Seq(("s", "2024-01-02")) ++
      (1 to 5).map(_ => ("s", "2024-01-03")) ++
      (1 to 5).map(_ => ("s", "2024-01-04")) ++
      (1 to 2).map(_ => ("t", "2024-01-01")) ++
      (1 to 2).map(_ => ("t", "2024-01-02"))
    val df = rows.toDF("k", "d")
      .select(col("k"), to_timestamp(col("d")).as("ts"))
    val got = TimeSeries.changepoint(df, col("k"), col("ts"))
      .orderBy("k")
      .select(col("k"), col("n_days"), col("split_day").cast("string"),
        col("gain_e6"), col("mean_left"), col("mean_right"))
      .as[(String, Long, String, Long, Long, Long)].collect()
    assert(got === Array(("s", 4L, "2024-01-02", 16000000L, 1L, 5L),
      ("t", 2L, "2024-01-01", 0L, 2L, 2L)))
  }

  test("changepoint: a single-day key has no candidate and drops out") {
    val df = Seq(("solo", "2024-01-01")).toDF("k", "d")
      .select(col("k"), to_timestamp(col("d")).as("ts"))
    assert(TimeSeries.changepoint(df, col("k"), col("ts")).count() === 0L)
  }

  test("runsTest: alternating series hand-checked; monotone trend and tie-heavy keys read NULL") {
    // r: [1,2,1,2,1,2] → signs +−+−+ (n=5, up 3, down 2, runs 5):
    //   z² = (25−5−12)²·4·1e6 // (12·7) = 256e6 // 84 = 3,047,619
    // u: strictly increasing → all +, a=0 ≤ n → NULL
    // v: [3,3,4] → tie dropped, one sign → n=1 → NULL
    def day(i: Int) = f"2024-02-$i%02d"
    val rows =
      Seq(1, 2, 1, 2, 1, 2).zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)(("r", day(i + 1))) } ++
      (1 to 8).flatMap(i => Seq.fill(i)(("u", day(i)))) ++
      (Seq.fill(3)(("v", day(1))) ++ Seq.fill(3)(("v", day(2))) ++
        Seq.fill(4)(("v", day(3))))
    val df = rows.toDF("k", "d")
      .select(col("k"), to_timestamp(col("d")).as("ts"))
    val got = TimeSeries.runsTest(df, col("k"), col("ts"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5), r.getInt(6)))
    assert(got === Array(("r", 5L, 3L, 2L, 5L, 3047619L, 0),
      ("u", 7L, 7L, 0L, 1L, -1L, 0), ("v", 1L, 1L, 0L, 1L, -1L, 0)))
  }

  test("wapeBacktest: both baselines scored on the same eval rows; seasonal-naive wins a spiky series") {
    // counts over 9 days: [5,5,5,5,5,5,5,9,5] — eval rows are days 8,9:
    //   naive1 errors |9−5| + |5−9| = 8 → 8e6/14 = 571428 ppm
    //   naive7 errors |9−5| + |5−5| = 4 → 4e6/14 = 285714 ppm → wins
    val counts = Seq(5, 5, 5, 5, 5, 5, 5, 9, 5)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(("e", f"2024-03-${i + 1}%02d")) }
    val df = rows.toDF("k", "d")
      .select(col("k"), to_timestamp(col("d")).as("ts"))
    val got = TimeSeries.wapeBacktest(df, col("k"), col("ts"))
      .as[(String, Long, Long, Long, String)].head()
    assert(got === (("e", 2L, 571428L, 285714L, "naive7")))
  }

  test("wapeBacktest: keys without 8 active days drop out") {
    val rows = (1 to 7).map(i => ("short", f"2024-03-0$i"))
    val df = rows.toDF("k", "d")
      .select(col("k"), to_timestamp(col("d")).as("ts"))
    assert(TimeSeries.wapeBacktest(df, col("k"), col("ts")).count() === 0L)
  }

  test("mannKendall: monotone series trends, flat series is NULL, alternating hand-checked") {
    // up: [1,2,3,4,5] → S=10, varx18=300, z²=81·18e6/300=4.86e6 → trend 1,
    //     every pair slope is exactly 1e6 → Sen 1e6
    // fl: [2,2,2] → S=0 and varx18=0 (all one tie group) → NULL, trend 0
    // al: [1,2,1,2] → S=2, tieterm=36, varx18=120 → z²=150000, trend 0,
    //     slopes sorted [−1e6,0,0,333333,1e6,1e6] → lower median 0
    def day(i: Int) = f"2024-04-$i%02d"
    val rows =
      (1 to 5).flatMap(i => Seq.fill(i)(("up", day(i)))) ++
      (1 to 3).flatMap(i => Seq.fill(2)(("fl", day(i)))) ++
      Seq(1, 2, 1, 2).zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)(("al", day(i + 1))) }
    val df = rows.toDF("k", "d")
      .select(col("k"), to_timestamp(col("d")).as("ts"))
    val got = TimeSeries.mannKendall(df, col("k"), col("ts"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4), r.getLong(5)))
    assert(got === Array(("al", 4L, 2L, 150000L, 0, 0L),
      ("fl", 3L, 0L, -1L, 0, 0L),
      ("up", 5L, 10L, 4860000L, 1, 1000000L)))
  }

  test("mannKendall: refuses a key wider than maxDays at plan build") {
    val rows = (1 to 3).map(i => ("w", f"2024-04-0$i"))
    val df = rows.toDF("k", "d")
      .select(col("k"), to_timestamp(col("d")).as("ts"))
    intercept[IllegalArgumentException] {
      TimeSeries.mannKendall(df, col("k"), col("ts"), maxDays = 2)
    }
  }

  test("leadLag: a 2-day-shifted spike is found at lag +2; short overlaps degrade to NULL") {
    // a = [1,1,5,1,1] (spike day 3), b = [5,1,1] (spike day 1 = a shifted
    // by 2). lag 2 aligns the spikes: cov = (3·27−49)e6/6 = 5333333;
    // lag 0/1 read −16e6/6 = −2666666 (truncated toward zero); lag −1
    // overlaps 2 flat days → 0; lag −2 has n=1 → NULL
    def day(i: Int) = f"2024-05-$i%02d"
    val a = Seq(1, 1, 5, 1, 1).zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(day(i + 1)) }.toDF("d")
      .select(to_timestamp(col("d")).as("ts"))
    val b = Seq(5, 1, 1).zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(day(i + 1)) }.toDF("d")
      .select(to_timestamp(col("d")).as("ts"))
    val got = TimeSeries.leadLag(a, col("ts"), b, col("ts"), maxLag = 2)
      .orderBy("lag").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2), r.getInt(3)))
    assert(got === Array(
      (-2L, 1L, Long.MinValue, 0), (-1L, 2L, 0L, 0),
      (0L, 3L, -2666666L, 0), (1L, 3L, -2666666L, 0),
      (2L, 3L, 5333333L, 1)))
  }

  test("maxConcurrency: peak_us is the EARLIEST time the peak is hit") {
    // two disjoint double-overlaps: [0,4)+[1,4) and [10,14)+[11,14) —
    // both reach 2; the report must say 1 (first time 2 is reached),
    // never 11
    val df = Seq(("k", 0L, 4L), ("k", 1L, 4L), ("k", 10L, 14L),
      ("k", 11L, 14L)).toDF("k", "st", "en")
      .select(col("k"), timestamp_micros(col("st")).as("st"),
        timestamp_micros(col("en")).as("en"))
    val got = TimeSeries.maxConcurrency(df, col("k"), col("st"), col("en"))
      .as[(String, Long, Long, Long)].collect()
    assert(got === Array(("k", 4L, 2L, 1L)))
  }

  test("maxDrawdown: running-peak drawdown with trough ties resolved to the earliest day") {
    // daily levels 100, 50, 120, 60 (day 1 is two rows summed 60+40):
    // runmax 100,100,120,120 → dd 0, 500000, 0, 500000 — the 50% tie
    // must report the EARLIER trough (day 2, level 50)
    def day(i: Int) = f"2024-03-0$i%01d"
    val rows = Seq(("a", day(1), 60L), ("a", day(1), 40L),
      ("a", day(2), 50L), ("a", day(3), 120L), ("a", day(4), 60L))
    val df = rows.toDF("k", "d", "cents")
      .select(col("k"), to_timestamp(col("d")).as("ts"), col("cents"))
    val got = TimeSeries.maxDrawdown(df, col("k"), col("ts"), col("cents"))
      .as[(String, Long, String, String, Long, java.sql.Date)].collect()
    assert(got === Array(("a", 4L, "120", "50", 500000L,
      java.sql.Date.valueOf("2024-03-02"))))
  }

  test("streakHistogram: islands-and-gaps lengths and the survival cumsum") {
    // u1 active days {1,2,3,5} → longest 3; u2 {1,3} → 1; u3 {1,2} → 2
    val rows = Seq((1L, 1), (1L, 2), (1L, 3), (1L, 5),
      (2L, 1), (2L, 3), (3L, 1), (3L, 2))
    val df = rows.toDF("u", "d")
      .select(col("u"), to_timestamp(
        concat(lit("2024-06-0"), col("d"))).as("ts"))
    val got = TimeSeries.streakHistogram(df, col("u"), col("ts"))
      .orderBy(col("longest_streak").desc)
      .as[(Long, Long, Long)].collect()
    assert(got === Array((3L, 1L, 1L), (2L, 1L, 2L), (1L, 1L, 3L)))
  }
}

class KendallTauSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("kendallTau: hand-checked signed square with a count tie; constant measure is NULL") {
    // days (count, cents): (1,10) (2,20) (3,15) (3,30) → S = 3,
    // count ties n1 = 1, cents ties n2 = 0, n0 = 6 →
    // tau² = +9e6 / (5·6) = 300000  (τ-b = 0.548, squared 0.3)
    def day(i: Int) = f"2024-07-0$i%01d"
    val rows = Seq((1, 1, 10L), (2, 1, 10L), // day1: c=2? no —
      (0, 0, 0L)).filter(_ => false)
    // build per-day rows directly: c events of 1 cent... simpler: one
    // row per (day, cents) with the count achieved via duplicates
    val data =
      Seq.fill(1)(("k", day(1), 10L)) ++
      Seq.fill(2)(("k", day(2), 10L)) ++
      Seq.fill(3)(("k", day(3), 5L)) ++
      Seq.fill(3)(("k", day(4), 10L))
    // daily sums: d1 (c=1, m=10), d2 (c=2, m=20), d3 (c=3, m=15),
    // d4 (c=3, m=30)
    val df = data.toDF("k", "d", "cents")
      .select(col("k"), to_timestamp(col("d")).as("ts"), col("cents"))
    val got = graft.ext.TimeSeries.kendallTau(df, col("k"), col("ts"),
        col("cents"))
      .as[(String, Long, Long, Long)].head()
    assert(got === (("k", 4L, 3L, 300000L)))
    // constant cents: every day the same m → n2 = n0 → NULL
    val const = (1 to 3).map(i => ("c", day(i), 7L)).toDF("k", "d", "cents")
      .select(col("k"), to_timestamp(col("d")).as("ts"), col("cents"))
    val g2 = graft.ext.TimeSeries.kendallTau(const, col("k"), col("ts"),
      col("cents")).collect().head
    assert(g2.isNullAt(3))
    // r12: the Knight-aggregator replan has no days² pair join, so the
    // maxDays data probe (and its refusal) is gone — only the parameter
    // range check remains
    intercept[IllegalArgumentException] {
      graft.ext.TimeSeries.kendallTau(df, col("k"), col("ts"),
        col("cents"), maxDays = 1)
    }
  }
}
