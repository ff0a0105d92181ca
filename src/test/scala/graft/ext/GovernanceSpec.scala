package graft.ext

import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Pins the governance/profile batch: normalization-aware dedup,
  * transition rates, k-anonymity, Gini concentration, and the
  * window-free group top-k aggregator — hand-computed fixtures.
  */
class GovernanceSpec extends graft.SparkSpec {
  import spark.implicits._

  test("normalizedGroups: case/punct/whitespace variants collapse; raw variants counted") {
    val docs = Seq(
      (3L, "Hello, World!"),
      (1L, "hello  world"),
      (2L, "HELLO WORLD."),
      (4L, "something else")
    ).toDF("doc_id", "text")
    val got = Dedup.normalizedGroups(docs, col("doc_id"), col("text"))
      .orderBy(col("n_copies").desc)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length === 2)
    val (_, keepId, nCopies, nRaw) = got(0)
    assert((keepId, nCopies, nRaw) === ((1L, 3L, 3L))) // three raw forms, one canon
    assert((got(1)._3, got(1)._4) === ((1L, 1L)))
  }

  test("normalizedGroups: identical raw bytes count as ONE raw variant") {
    val docs = Seq((1L, "same text"), (2L, "same text")).toDF("doc_id", "text")
    val got = Dedup.normalizedGroups(docs, col("doc_id"), col("text"))
      .as[(String, Long, Long, Long)].head()
    assert((got._2, got._3, got._4) === ((1L, 2L, 1L)))
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("transitionRates: counts and floor rates per from-state") {
    val e = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1L, "A"),
      (1L, ts("2024-01-01 00:00:02"), 2L, "A"),
      (1L, ts("2024-01-01 00:00:03"), 3L, "B"),
      (2L, ts("2024-01-01 00:00:01"), 4L, "A"),
      (2L, ts("2024-01-01 00:00:02"), 5L, "C")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.EventAnalytics.transitionRates(e, col("user_id"),
      col("ts"), col("event_id"), col("event_type"))
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long)].collect()
    // from A: A→A 1, A→B 1, A→C 1 (tot 3, floor rate 333333 each)
    assert(got === Array(
      ("A", "A", 1L, 333333L), ("A", "B", 1L, 333333L), ("A", "C", 1L, 333333L)))
  }

  test("funnelTiming: cohort counts and exact median stage lags") {
    val e = Seq(
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 00:10:00"), "click"),     // d12 = 600 s
      (1L, ts("2024-01-01 00:20:00"), "purchase"),  // d23 = 600 s
      (2L, ts("2024-01-01 01:00:00"), "signup"),
      (2L, ts("2024-01-01 01:30:00"), "click"),     // d12 = 1800 s, no purchase
      (3L, ts("2024-01-01 02:00:00"), "view")       // never signs up: excluded
    ).toDF("user_id", "ts", "event_type")
    val got = graft.ops.EventAnalytics.funnelTiming(e, col("user_id"),
      col("ts"), col("event_type"), "signup", "click", "purchase")
      .select("n_s1", "n_s2", "n_s3", "p50_t12_us", "p50_t23_us")
      .as[(Long, Long, Long, Long, Long)].collect()
    // lower median of (600 s, 1800 s) at rn = (50·2+99)/100 = 1 → 600 s
    assert(got === Array((2L, 2L, 1L, 600L * 1000000L, 600L * 1000000L)))
  }

  test("kAnonymity: classes under k flag at_risk, others don't") {
    val df = Seq(
      ("en", "s1"), ("en", "s1"), ("en", "s1"),
      ("de", "s2")
    ).toDF("lang", "source")
    val got = Profile.kAnonymity(df, Seq(col("lang"), col("source")), k = 2)
      .orderBy("lang")
      .as[(String, String, Long, Int)].collect()
    assert(got === Array(("de", "s2", 1L, 1), ("en", "s1", 3L, 0)))
  }

  test("lDiversity: large homogeneous class flags where k-anonymity would pass; modal share exact") {
    val df = Seq(
      // en: 4 rows, ONE sensitive value — k-anonymous at k=4 yet leaks
      ("en", "s1"), ("en", "s1"), ("en", "s1"), ("en", "s1"),
      // de: 3 rows, 3 distinct — diverse
      ("de", "s1"), ("de", "s2"), ("de", "s3"),
      // fr: 5 rows, 2 distinct (3+2) — modal share 600000, under l=3
      ("fr", "s1"), ("fr", "s1"), ("fr", "s1"), ("fr", "s2"), ("fr", "s2")
    ).toDF("lang", "source")
    val got = Profile.lDiversity(df, Seq(("lang", col("lang"))),
        col("source"), l = 3)
      .orderBy("lang")
      .as[(String, Long, Long, Long, Int)].collect()
    assert(got === Array(
      ("de", 3L, 3L, 333333L, 0),
      ("en", 4L, 1L, 1000000L, 1),
      ("fr", 5L, 2L, 600000L, 1)))
  }

  test("giniConcentration: all-to-one is (n-1)/n, even split is 0, ties rank deterministically") {
    // (0, 10): G = 1/2 exactly → 500000
    val skew = Seq(("a", 0L), ("b", 10L)).toDF("s", "x")
    assert(Profile.giniConcentration(skew, col("s"), col("x"))
      .as[(Long, Long, Long)].head() === ((2L, 10L, 500000L)))
    // four equal strata → 0
    val even = Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L)).toDF("s", "x")
    assert(Profile.giniConcentration(even, col("s"), col("x"))
      .as[(Long, Long, Long)].head()._3 === 0L)
    // rows pre-aggregate per stratum: b = 4+6, a = 10 → equal → 0
    val multi = Seq(("a", 10L), ("b", 4L), ("b", 6L)).toDF("s", "x")
    assert(Profile.giniConcentration(multi, col("s"), col("x"))
      .as[(Long, Long, Long)].head() === ((2L, 20L, 0L)))
  }

  test("groupTopK: (m DESC, id ASC) order, ties by id, k cap — across partitions") {
    val df = Seq(
      ("g", 1L, 10L), ("g", 2L, 30L), ("g", 3L, 30L), ("g", 4L, 20L),
      ("g", 5L, 5L), ("h", 6L, 1L)
    ).toDF("grp", "id", "m").repartition(5) // force the merge path
    val got = Profile.groupTopK(df, col("grp"), col("id"), col("m"), k = 3)
      .orderBy("grp", "rank")
      .as[(String, Int, Long, Long)].collect()
    assert(got === Array(
      ("g", 1, 2L, 30L), ("g", 2, 3L, 30L), ("g", 3, 4L, 20L),
      ("h", 1, 6L, 1L)))
  }

  test("noveltyCurve: per-slice occurrence/new counts, floor rate, cumulative") {
    // short docs fall back to whole-text shingles: contents a,a,a,b
    val docs = Seq((0L, "a"), (1L, "a"), (2L, "a"), (3L, "b"))
      .toDF("doc_id", "text")
    val got = Dedup.noveltyCurve(docs, col("doc_id"), col("text"), buckets = 2)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long)].collect()
    // bucket 0 = docs 0-1 (2 occ, "a" first seen), bucket 1 = docs 2-3
    // (2 occ, only "b" new — doc 2's "a" repeats)
    assert(got === Array(
      (0L, 2L, 1L, 500000L, 1L),
      (1L, 2L, 1L, 500000L, 2L)))
  }

  test("rollingActives: trailing-window distinct, not a rolling sum of DAU") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "ts")
    val got = graft.ops.EventAnalytics.rollingActives(e, col("user_id"),
      col("ts"), windowDays = 2)
      .orderBy("day")
      .as[(Timestamp, Long, Long, Long)].collect()
    // day 2's WAU counts user 1 ONCE despite two active days (a rolling
    // DAU sum would say 3); trailing cover day 3 has no DAU row → dropped
    assert(got === Array(
      (ts("2024-01-01 00:00:00"), 2L, 2L, 1000000L),
      (ts("2024-01-02 00:00:00"), 1L, 2L, 500000L)))
  }

  test("decileLift: two-phase global rank buckets, shares, cumulative") {
    val df = Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L))
      .toDF("id", "m").repartition(3) // rank must survive multiple partitions
    val got = Profile.decileLift(df, col("id"), col("m"), buckets = 2)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got === Array(
      (0L, 2L, 70L, 700000L, 700000L),
      (1L, 2L, 30L, 300000L, 1000000L)))
  }

  test("decileLift: equal measures rank by id — deterministic under any partitioning") {
    val df = Seq((9L, 5L), (1L, 5L), (5L, 5L), (3L, 5L)).toDF("id", "m")
      .repartition(4)
    val got = Profile.decileLift(df, col("id"), col("m"), buckets = 4)
      .orderBy("bucket").as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._2).toSeq === Seq(1L, 1L, 1L, 1L)) // one per bucket
    assert(got.map(_._4).toSeq === Seq(250000L, 250000L, 250000L, 250000L))
  }

  test("basketPairs: session item sets, pair supports, lift vs independence") {
    val e = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 00:05:00"), 2L, "B"),
      (1L, ts("2024-01-01 00:10:00"), 3L, "C"),
      (1L, ts("2024-01-01 00:12:00"), 4L, "A"), // dup item: counted once
      (2L, ts("2024-01-01 00:00:00"), 5L, "B"),
      (2L, ts("2024-01-01 00:01:00"), 6L, "A"),
      (2L, ts("2024-01-01 09:00:00"), 7L, "A")  // past the gap: own session
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.EventAnalytics.basketPairs(e, col("user_id"),
      col("ts"), col("event_id"), col("event_type"), gapMicros = 1800000000L)
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Long, Long, Long)].collect()
    // 3 sessions; sup A=3, B=2, C=1; AB in two sessions → lift exactly 1e6
    assert(got === Array(
      ("A", "B", 2L, 3L, 2L, 1000000L),
      ("A", "C", 1L, 3L, 1L, 1000000L),
      ("B", "C", 1L, 2L, 1L, 1500000L)))
  }

  test("lastTouchAttribution: credits the last PRIOR non-conversion, never itself") {
    val e = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 00:10:00"), 2L, "purchase"), // view, gap 600 s
      (1L, ts("2024-01-01 00:20:00"), 3L, "click"),
      (1L, ts("2024-01-01 00:30:00"), 4L, "purchase"), // click, gap 600 s
      (1L, ts("2024-01-01 00:50:00"), 5L, "purchase"), // STILL click (1800 s),
      (2L, ts("2024-01-01 00:00:00"), 6L, "purchase")  // nothing prior: dropped
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.EventAnalytics.lastTouchAttribution(e, col("user_id"),
      col("ts"), col("event_id"), col("event_type"), "purchase")
      .orderBy("channel")
      .as[(String, Long, Long)].collect()
    // click gaps sorted (600, 1800): lower median position 1 → 600 s
    assert(got === Array(
      ("click", 2L, 600L * 1000000L),
      ("view", 1L, 600L * 1000000L)))
  }

  test("pitFeatures: strictly-prior frame — a row never sees itself or later") {
    val e = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 00:10:00"), 2L, "purchase"),
      (1L, ts("2024-01-01 00:30:00"), 3L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.EventAnalytics.pitFeatures(e, col("user_id"),
      col("ts"), col("event_id"), col("event_type"), "purchase")
      .orderBy("event_id")
      .as[(Long, Long, Long, Option[Long])].collect()
    assert(got === Array(
      (1L, 0L, 0L, None),                       // first event sees nothing
      (2L, 1L, 0L, Some(600L * 1000000L)),      // its own purchase NOT counted
      (3L, 2L, 1L, Some(1200L * 1000000L))))
  }

  test("fdStrength: mode share per determinant, count-desc value-asc tie-break") {
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "z"), ("b", "z"),
      ("c", "p"), ("c", "q")  // tie: mode must be 'p' (value asc)
    ).toDF("s", "l")
    val got = Profile.fdStrength(df, col("s"), col("l"))
      .orderBy("lhs")
      .as[(String, Long, Long, String, Long, Long)].collect()
    assert(got === Array(
      ("a", 4L, 2L, "x", 3L, 750000L),
      ("b", 2L, 1L, "z", 2L, 1000000L),
      ("c", 2L, 2L, "p", 1L, 500000L)))
  }

  test("riEdge: orphans at key granularity, NULL keys counted apart, ppm floor") {
    val child = Seq(
      (Some(1L), "r1"), (Some(1L), "r2"), (Some(2L), "r3"),
      (Some(9L), "r4"), (Some(9L), "r5"), (Some(9L), "r6"), // orphan key, 3 rows
      (None: Option[Long], "r7")                            // NULL: not an orphan
    ).toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Profile.riEdge(child, col("fk"), parent, col("pk"), "c->p")
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    // n_rows=7, n_keys=3 (non-null distinct), n_null_rows=1,
    // orphan_keys=1 (9), orphan_rows=3, ppm = 3*1e6 div 7 = 428571
    assert(got === (("c->p", 7L, 3L, 1L, 1L, 3L, 428571L)))
  }

  test("riEdge: clean edge reports zero orphans; empty child reports zero ppm") {
    val child = Seq(1L, 2L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val clean = Profile.riEdge(child, col("fk"), parent, col("pk"), "e")
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(clean === (("e", 2L, 2L, 0L, 0L, 0L, 0L)))
    val empty = Profile.riEdge(child.where(lit(false)), col("fk"),
        parent, col("pk"), "e")
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(empty === (("e", 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("benfordAudit: string-head digits, absent digits emit n=0, constants sum to 1e6") {
    assert(Profile.benfordPpm.map(_._2).sum === 1000000L)
    // values: 123, 19, 2000, 250, 777, 0 and -5 excluded
    val df = Seq(123L, 19L, 2000L, 250L, 777L, 0L, -5L).toDF("v")
    val got = Profile.benfordAudit(df, col("v"))
      .orderBy("digit")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(got.length === 9) // all nine digits present in the report
    val byDigit = got.map(g => g._1 -> g).toMap
    assert(byDigit(1)._2 === 2L) // 123, 19
    assert(byDigit(2)._2 === 2L) // 2000, 250
    assert(byDigit(7)._2 === 1L) // 777
    assert(byDigit(3)._2 === 0L) // absent digit still reported
    // obs_ppm floors: 2*1e6 div 5 = 400000; dev vs 301030 = 98970
    assert(byDigit(1)._3 === 400000L)
    assert(byDigit(1)._5 === math.abs(400000L - 301030L))
    // digits absent from data: obs 0, dev = exp
    assert(byDigit(3)._3 === 0L && byDigit(3)._5 === 124939L)
  }

  test("seasonalBaseline: ISO dow, observed-slot mean floor, peak tie-breaks to later date") {
    val e = Seq(
      // Mondays 2024-01-01 and 2024-01-08, hour 10: counts 3 and 1
      (1L, ts("2024-01-01 10:00:01")), (2L, ts("2024-01-01 10:30:00")),
      (3L, ts("2024-01-01 10:59:59")), (4L, ts("2024-01-08 10:15:00")),
      // Sunday 2024-01-07 hour 0: single slot
      (5L, ts("2024-01-07 00:00:00"))
    ).toDF("event_id", "ts")
    val got = graft.ops.EventAnalytics.seasonalBaseline(e, col("ts"))
      .orderBy("dow", "hr")
      .as[(Int, Int, Long, Long, Long, Long, String, Long)].collect()
    // Monday = ISO 1; mean over 2 observed slots = 4/2 → 200 e2;
    // peak (3, 2024-01-01); ratio 3*2*1e6 div 4 = 1500000
    assert(got(0) === ((1, 10, 2L, 4L, 200L, 3L, "2024-01-01", 1500000L)))
    // Sunday = ISO 7, singleton slot: mean=100 e2, ratio 1e6
    assert(got(1) === ((7, 0, 1L, 1L, 100L, 1L, "2024-01-07", 1000000L)))
  }

  test("seasonalBaseline: equal peak counts resolve to the LATER date (struct max)") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-08 10:00:00"))
    ).toDF("event_id", "ts")
    val got = graft.ops.EventAnalytics.seasonalBaseline(e, col("ts"))
      .as[(Int, Int, Long, Long, Long, Long, String, Long)].head()
    assert(got._7 === "2024-01-08") // tie on c=1: lexicographic max takes later d
  }

  test("tokenizerFertility: hand-counted chars/bytes/tokens, exact ppm ratios, NULL on empty") {
    val docs = Seq(
      ("en", "ab cd"),   // chars 5, bytes 5, ws 2, bpe 2
      ("en", "héllo"),   // chars 5, bytes 6 (é is 2 bytes), ws 1, bpe 3 (h|é|llo)
      ("zz", "")         // all-zero doc → NULL ratios
    ).toDF("lang", "text")
    val got = TextAnalysis.tokenizerFertility(docs, col("lang"), col("text"))
      .orderBy("lang")
      .as[(String, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect()
    assert(got(0) ===
      (("en", 2L, 10L, 11L, 3L, 5L, Some(2000000L), Some(1100000L))))
    assert(got(1) === (("zz", 1L, 0L, 0L, 0L, 0L, None, None)))
  }

  test("latenessAudit: first arrival, in-order, and log2-bucketed late rows split exactly") {
    val events = Seq(
      // user 1: arrival order 1,2,3 — id2 is 500000 µs LATE vs id1
      (1L, 1L, 1000000L, "a"),
      (2L, 1L, 500000L, "a"),   // late 500000 µs → bucket 18 (2^18 ≤ 500000 < 2^19)
      (3L, 1L, 2000000L, "a"),  // in order → bucket −1
      // user 2: single event → first-arrival bucket −2
      (4L, 2L, 700000L, "b")
    ).toDF("event_id", "user_id", "tus", "event_type")
      .withColumn("ts", expr("timestamp_micros(tus)"))
    val got = graft.ops.EventAnalytics.latenessAudit(events,
        col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .orderBy("event_type", "bucket")
      .as[(String, Long, Long, Option[Long])].collect()
    assert(got === Array(
      // greatest() ignores the NULL prior_max in BOTH engines, so a
      // first arrival reports lateness 0 (classification still −2)
      ("a", -2L, 1L, Some(0L)),        // id1: no prior
      ("a", -1L, 1L, Some(0L)),        // id3: in order
      ("a", 18L, 1L, Some(500000L)),   // id2: half a second late
      ("b", -2L, 1L, Some(0L))))
  }

  test("vocabStats: lowercased [a-z0-9]+ tokens, hapax and TTR floors per stratum") {
    val docs = Seq(
      ("a", "The the DOG! dog2 ran."),   // tokens: the, the, dog, dog2, ran
      ("a", "dog2 jumped"),              // dog2 again → not hapax
      ("b", ""),                         // contributes nothing
      ("b", "x x x")                     // one type, zero hapax
    ).toDF("source", "text")
    val got = TextAnalysis.vocabStats(docs, col("source"), col("text"))
      .orderBy("stratum")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // a: 7 tokens {the:2, dog:1, dog2:2, ran:1, jumped:1} → 5 types, 3 hapax
    assert(got(0) === (("a", 7L, 5L, 3L,
      5L * 1000000L / 7L, 3L * 1000000L / 5L)))
    // b: 3 tokens, 1 type, 0 hapax → ttr 333333, hapax share 0
    assert(got(1) === (("b", 3L, 1L, 0L, 333333L, 0L)))
  }

  test("windowFunnel: greedy-latest chain, strictly-prior frames, window cutoff") {
    val e = Seq(
      // user 1: view 00:00, click 00:10, purchase 00:20 → span 1200 s, ok
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 00:10:00"), 2L, "click"),
      (1L, ts("2024-01-01 00:20:00"), 3L, "purchase"),
      // user 2: view, then a LATER view narrows the chain; purchase ok
      (2L, ts("2024-01-01 01:00:00"), 4L, "view"),
      (2L, ts("2024-01-01 05:00:00"), 5L, "view"),
      (2L, ts("2024-01-01 05:30:00"), 6L, "click"),
      (2L, ts("2024-01-01 05:40:00"), 7L, "purchase"), // span 40 min from the LATE view
      // user 3: click before any view → chain incomplete
      (3L, ts("2024-01-02 00:00:00"), 8L, "click"),
      (3L, ts("2024-01-02 00:01:00"), 9L, "purchase"),
      // user 4: full chain but wider than the 1 h window
      (4L, ts("2024-01-03 00:00:00"), 10L, "view"),
      (4L, ts("2024-01-03 02:00:00"), 11L, "click"),
      (4L, ts("2024-01-03 02:10:00"), 12L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.EventAnalytics.windowFunnel(e, col("user_id"),
      col("ts"), col("event_id"), col("event_type"),
      "view", "click", "purchase", windowUs = 3600000000L)
      .orderBy("day")
      .as[(String, Long, Long, Long, Option[Long])].collect()
    assert(got === Array(
      // day 1: users 1+2 both complete; spans 1200 s and 2400 s → p50 = 1200 s
      ("2024-01-01", 2L, 2L, 1000000L, Some(1200L * 1000000L)),
      ("2024-01-02", 1L, 0L, 0L, None),
      ("2024-01-03", 1L, 0L, 0L, None)))
  }

  test("windowFunnel: a purchase never chains through itself or later events") {
    val e = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "purchase"), // nothing prior
      (1L, ts("2024-01-01 00:01:00"), 2L, "view"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.EventAnalytics.windowFunnel(e, col("user_id"),
      col("ts"), col("event_id"), col("event_type"),
      "view", "click", "purchase", windowUs = 3600000000L)
      .as[(String, Long, Long, Long, Option[Long])].head()
    assert(got === (("2024-01-01", 1L, 0L, 0L, None)))
  }

  test("linkPairs: score ladder, band-straddle pairs meet, negative balances band safely") {
    // nation 1: ids 1,2 same seg, 500 cents apart (tight) → 90 match;
    // ids 1,3 seg differs, 9_500 apart (loose, straddles a band edge) → 20 weak;
    // nation 2: id 4 negative cents — must not collide with nation 1
    val df = Seq(
      (1L, 1, "AUTO", 5000L), (2L, 1, "AUTO", 5500L), (3L, 1, "BIKE", 14500L),
      (4L, 2, "AUTO", -95000L)
    ).toDF("k", "nat", "seg", "cents")
    val got = graft.ops.RecordLinkage.linkPairs(df, col("k"), col("nat"),
      col("cents"), col("seg"))
      .as[(Long, Long, Int, String)].collect()
    // (1,2): band 10=10, d=500, seg eq → 90; (1,3): bands 10/11 straddle,
    // d=9500, seg differs → 20; (2,3): bands 10/11, d=9000 → 20
    assert(got === Array(
      (1L, 2L, 90, "match"),
      (1L, 3L, 20, "weak"),
      (2L, 3L, 20, "weak")))
  }

  test("linkPairs: hot blocks drop WHOLE; distinct claims each pair once") {
    // 300 records in one (nation, band) bucket exceed maxBlock=256 via
    // probes → the block drops entirely, no pairs from it; a clean
    // two-record block elsewhere still pairs exactly once
    val hot = (1L to 300L).map(i => (i, 1, "AUTO", 1000L))
    val ok = Seq((1001L, 2, "AUTO", 1000L), (1002L, 2, "AUTO", 1200L))
    val df = (hot ++ ok).toDF("k", "nat", "seg", "cents")
    val got = graft.ops.RecordLinkage.linkPairs(df, col("k"), col("nat"),
      col("cents"), col("seg"), k = 10000)
      .as[(Long, Long, Int, String)].collect()
    assert(got === Array((1001L, 1002L, 90, "match")))
  }

  test("TopKByMeasureAgg: reduce/merge laws on raw buffers") {
    import graft.functions.{IdMeasure, TopKByMeasureAgg}
    val a = new TopKByMeasureAgg(2)
    val b1 = Seq(IdMeasure(1, 9), IdMeasure(2, 5))
    val b2 = Seq(IdMeasure(3, 7), IdMeasure(4, 6))
    assert(a.merge(b1, b2) === Seq(IdMeasure(1, 9), IdMeasure(3, 7)))
    assert(a.merge(b2, b1) === a.merge(b1, b2)) // commutative
    assert(a.reduce(b1, IdMeasure(9, 9)) === Seq(IdMeasure(1, 9), IdMeasure(9, 9)))
    assert(a.reduce(b1, IdMeasure(9, 1)) === b1) // below the floor: no-op
  }
}

class ClusterKeepersSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("keeper is the highest-quality member, id breaks ties; savings add up") {
    // clusters {1,2,3} (via pairs 1-2, 2-3) and {7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val docs = Seq((1L, 50L), (2L, 90L), (3L, 90L), (7L, 10L), (8L, 10L))
      .toDF("doc_id", "n_chars")
    val got = Dedup.clusterKeepers(pairs, docs, col("doc_id"), col("n_chars"))
      .orderBy("cluster").as[(Long, Long, Long, Long, Long)].collect()
    // cluster 1: quality tie 90 between 2 and 3 → keeper 2 (lower id)
    // cluster 7: tie 10 → keeper 7
    assert(got === Array(
      (1L, 2L, 3L, 230L, 140L),
      (7L, 7L, 2L, 20L, 10L)))
  }
}

class RfmSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("globalBuckets: equal-population quartiles by (m DESC, id) across partitions") {
    // 8 entities, m = 80..10 → quartiles of 2; ties broken by id
    val d = (1L to 8L).map(i => (i, 90L - i * 10L)).toDF("id", "m")
      .repartition(3) // force the multi-partition two-phase path
    val got = Profile.globalBuckets(d, col("id"), col("m"), 4)
      .orderBy("id").as[(Long, Long, Long)].collect()
    assert(got.map(_._3) === Array(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L))
  }

  test("rfm: segment counts cover all entities; best cell holds the best customer") {
    val cust = Seq(
      // id, recency(day), frequency, monetary
      (1L, 100L, 10L, 1000L),  // best on every axis
      (2L, 90L, 8L, 800L),
      (3L, 50L, 5L, 500L),
      (4L, 40L, 4L, 400L),
      (5L, 30L, 3L, 300L),
      (6L, 20L, 2L, 200L),
      (7L, 10L, 1L, 100L),
      (8L, 5L, 1L, 50L)
    ).toDF("id", "r", "f", "mv")
    val got = Profile.rfmSegments(cust, col("id"), col("r"), col("f"),
        col("mv"), buckets = 4)
      .orderBy("r_bucket", "f_bucket", "m_bucket")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._4).sum === 8L)
    // perfectly correlated dims → everyone sits on the diagonal
    assert(got === Array(
      (0L, 0L, 0L, 2L, 1800L), (1L, 1L, 1L, 2L, 900L),
      (2L, 2L, 2L, 2L, 500L), (3L, 3L, 3L, 2L, 150L)))
  }
}

class ProportionalSampleSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("largest-remainder allocation: total is exactly the budget, error < 1 row") {
    // sizes 5, 3, 2 with budget 7 → exact shares 3.5, 2.1, 1.4 →
    // quotas 3,2,1 (sum 6), leftover 1 goes to the largest remainder (a: .5)
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .zipWithIndex.map { case (s, i) => (s, i.toLong) }.toDF("s", "id")
    val got = Sampling.proportionalSample(df, col("s"), col("id"), budget = 7L)
      .groupBy("stratum").agg(count(lit(1)).as("n"))
      .orderBy("stratum").as[(String, Long)].collect()
    assert(got === Array(("a", 4L), ("b", 2L), ("c", 1L)))
    assert(got.map(_._2).sum === 7L)
  }

  test("deterministic: same input, same sample; ranks contiguous from 1") {
    val df = (1L to 50L).map(i => (if (i % 2 == 0) "x" else "y", i)).toDF("s", "id")
    val a = Sampling.proportionalSample(df, col("s"), col("id"), 10L)
      .orderBy("stratum", "rk").as[(String, Long, Long)].collect()
    val b = Sampling.proportionalSample(df, col("s"), col("id"), 10L)
      .orderBy("stratum", "rk").as[(String, Long, Long)].collect()
    assert(a === b)
    assert(a.filter(_._1 == "x").map(_._3) === (1L to 5L).toArray)
  }

  test("budget beyond the population refuses loudly — never a silent short sample") {
    val df = (1L to 5L).map(i => ("s", i)).toDF("s", "id")
    val e = intercept[IllegalArgumentException] {
      Sampling.proportionalSample(df, col("s"), col("id"), budget = 6L)
    }
    assert(e.getMessage.contains("exceeds population"))
    // budget == population is the boundary: every row selected
    val all = Sampling.proportionalSample(df, col("s"), col("id"), budget = 5L)
    assert(all.count() === 5L)
  }
}

class IncrementalMergeSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("state ⊕ delta == full — merge_diff is zero everywhere, keys union correctly") {
    val state = Seq(("a", 10L), ("a", 5L), ("b", 7L)).toDF("k", "m")
    val delta = Seq(("a", 1L), ("c", 9L)).toDF("k", "m") // c is delta-only
    val full = state.unionAll(delta)
    val got = graft.ops.SnapshotDiff.incrementalMerge(state, delta, full,
        col("k"), col("m"))
      .orderBy("k").as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got === Array(
      ("a", 15L, 1L, 16L, 16L, 0L),
      ("b", 7L, 0L, 7L, 7L, 0L),
      ("c", 0L, 9L, 9L, 9L, 0L)))
  }
}

class WeightedMedianChurnSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("weighted median: heavy rows dominate; plain median would differ") {
    // values 10×(w1 each) and one 100 with w=20: W=30, threshold 15
    // → cumw crosses 15 inside the ten w1 rows? cum at v=10 rows: each
    // row v=10.. wait values: ten rows v=10 w=1 (cum 10), one row v=100
    // w=20 (cum 30) → threshold (30+1)/2=15 crossed at v=100
    val rows = (1L to 10L).map(i => ("a", 10L, 1L, i)) :+ (("a", 100L, 20L, 11L))
    val got = Profile.weightedMedian(rows.toDF("s", "v", "w", "id"),
        col("s"), col("v"), col("w"), col("id"))
      .as[(String, Long, Long, Long)].head()
    assert(got === (("a", 11L, 30L, 100L)))
    // by-count median of the same data is 10 — the weight moved it
  }

  test("uniform weights reduce to the plain lower median") {
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L))
      .zipWithIndex.map { case ((s, v), i) => (s, v, 1L, i.toLong) }
    val got = Profile.weightedMedian(rows.toDF("s", "v", "w", "id"),
        col("s"), col("v"), col("w"), col("id"))
      .as[(String, Long, Long, Long)].head()
    assert(got._4 === 2L) // (4+1) div 2 = 2nd position
  }

  test("churn: silent users labeled per cohort; the edge user never churns") {
    val D = 86400000000L // one day in micros
    val e = Seq(
      (1L, 0L), (1L, 100L * D),          // active at the edge
      (2L, 0L),                          // silent since day 0 → churned
      (3L, 65L * D), (3L, 68L * D))      // last seen day 68 → churned (edge 100)
      .toDF("user_id", "t")
      .select(col("user_id"), timestamp_micros(col("t")).as("ts"))
    val got = graft.ops.EventAnalytics.churnLabels(e, col("user_id"),
        col("ts"), horizonMicros = 30L * D)
      .orderBy("cohort")
      .select("n_users", "n_churned", "churn_ppm")
      .as[(Long, Long, Long)].collect()
    // cohorts: month 0 (users 1, 2) and month of day 65 (user 3)
    assert(got === Array((2L, 1L, 500000L), (1L, 1L, 1000000L)))
  }
}

class Chao1EmdSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("log2Emd: identical distributions score 0; a one-bin shift scores n_a·n_b·gap") {
    // strata a and b identical (all values 8..15 → bin 3); c shifted to
    // bin 5 → |CDF diff| = 1 at bins 3 and 4 → emd = 2 · (2·2)
    val df = (Seq.fill(2)(("a", 10L)) ++ Seq.fill(2)(("b", 12L)) ++
      Seq.fill(2)(("c", 40L))).toDF("s", "v")
    val got = Profile.log2Emd(df, col("s"), col("v"))
      .orderBy("sa", "sb").as[(String, String, Long, Long, Long)].collect()
    assert(got === Array(
      ("a", "b", 2L, 2L, 0L),
      ("a", "c", 2L, 2L, 8L),
      ("b", "c", 2L, 2L, 8L)))
  }

  test("EMD sees distance where TV is blind: near vs far moves differ") {
    // base mass at bin 3; 'near' moves it to bin 4, 'far' to bin 10 —
    // TV between base and either is identical (all mass displaced),
    // EMD grows with the distance
    val df = (Seq.fill(4)(("base", 8L)) ++ Seq.fill(4)(("near", 16L)) ++
      Seq.fill(4)(("far", 1024L))).toDF("s", "v")
    val got = Profile.log2Emd(df, col("s"), col("v"))
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    assert(got(("base", "near")) < got(("base", "far")))
  }
}

class NegativeSamplesSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("ring negatives are deterministic, never self, near/exact dups excluded") {
    // 6 distinct docs; 2 and 5 byte-identical → same content rep
    val d = docs((1L, "alpha beta gamma delta"), (2L, "same same text here"),
      (3L, "totally different words now"), (4L, "yet another document body"),
      (5L, "same same text here"), (6L, "final unique content piece"))
    val got = Sampling.negativeSamples(d, col("doc_id"), col("text"),
        k = 2, step = 1L)
      .orderBy("doc_id", "j").as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r._1 !== r._3)) // never self
    // 2 and 5 are exact dups: neither may be the other's negative
    assert(!got.contains((2L, 1L, 5L)) && !got.contains((2L, 2L, 5L)))
    assert(!got.exists(r => Set(r._1, r._3) === Set(2L, 5L)))
    // determinism
    val again = Sampling.negativeSamples(d, col("doc_id"), col("text"),
        k = 2, step = 1L)
      .orderBy("doc_id", "j").as[(Long, Long, Long)].collect()
    assert(got === again)
  }

  test("step spreads negatives: k=3, step over a 7-doc ring hits distinct positions") {
    val d = docs((1L to 7L).map(i => (i, s"unique words number $i plus filler $i")): _*)
    val got = Sampling.negativeSamples(d, col("doc_id"), col("text"),
        k = 3, step = 2L)
      .as[(Long, Long, Long)].collect()
    val mine = got.filter(_._1 === 1L).map(_._3).toSet
    assert(mine === Set(3L, 5L, 7L)) // positions 0+2,0+4,0+6
  }
}

class HashRingSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("every key lands on exactly one shard; loads sum to the key count") {
    val keys = (1L to 500L).toDF("k")
    val got = Sampling.hashRingLoad(keys, col("k"), shards = 4, vnodes = 8)
      .orderBy("shard").as[(Long, Long, Long)].collect()
    assert(got.map(_._2).sum === 500L)
    assert(got.map(_._1).toSet.subsetOf((0L until 4L).toSet))
    // with 8 vnodes the worst shard should not own everything
    assert(got.map(_._2).max < 500L)
  }

  test("minimal movement: adding a shard moves only a fraction of keys") {
    val keys = (1L to 400L).toDF("k")
    def assign(shards: Int) = {
      val ring = (0 until shards).flatMap(sh => (0 until 8).map(r => (sh, r)))
        .toDF("shard", "replica")
        .select(col("shard"), Dedup.md5Hash60(
          concat(col("shard").cast("string"), lit(":"), col("replica").cast("string"))).as("vh"))
      keys.select(col("k"), Dedup.md5Hash60(col("k").cast("string")).as("hk"))
        .crossJoin(broadcast(ring))
        .groupBy("k", "hk")
        .agg(min(when(col("vh") >= col("hk"), struct(col("vh"), col("shard")))).as("succ"),
          min(struct(col("vh"), col("shard"))).as("wrap"))
        .select(col("k"), coalesce(col("succ.shard"), col("wrap.shard")).as("shard"))
        .as[(Long, Int)].collect().toMap
    }
    val before = assign(4)
    val after = assign(5) // shard 4's vnodes added; 0..3's unchanged
    val moved = before.keys.count(k => before(k) != after(k))
    // only keys captured by the new shard's vnodes move — far under half
    assert(moved > 0 && moved < 200, s"moved=$moved")
    assert(after.values.toSet.contains(4))
    // and everything that moved, moved TO the new shard
    assert(before.keys.filter(k => before(k) != after(k)).forall(after(_) == 4))
  }

  test("native ring_successor matches the declarative crossJoin reference per shard") {
    // the oracle keeps the keys × ring cross-join min(struct) form; the
    // engine ships the binary-search expression — loads must be identical
    val keys = (1L to 1000L).toDF("k")
    val ring = (0 until 6).flatMap(sh => (0 until 16).map(r => (sh, r)))
      .toDF("shard", "replica")
      .select(col("shard"), Dedup.md5Hash60(
        concat(col("shard").cast("string"), lit(":"), col("replica").cast("string"))).as("vh"))
    val ref = keys.select(col("k"), Dedup.md5Hash60(col("k").cast("string")).as("hk"))
      .crossJoin(broadcast(ring))
      .groupBy("k", "hk")
      .agg(min(when(col("vh") >= col("hk"), struct(col("vh"), col("shard")))).as("succ"),
        min(struct(col("vh"), col("shard"))).as("wrap"))
      .select(coalesce(col("succ.shard"), col("wrap.shard")).as("shard"))
      .groupBy("shard").count()
      .as[(Int, Long)].collect().toMap.map { case (s, n) => (s.toLong, n) }
    val got = Sampling.hashRingLoad(keys, col("k"), shards = 6, vnodes = 16)
      .select(col("shard"), col("n_keys")).as[(Long, Long)].collect().toMap
    assert(got === ref)
  }

  test("ring_successor lookup: successor, exact hit, wrap, tie-break") {
    import graft.functions.RingSuccessor.lookup
    val vhs = Array(10L, 20L, 20L, 30L)
    val shards = Array(3, 1, 2, 0) // sorted by (vh, shard): ties 20→shards 1 then 2
    assert(lookup(5L, vhs, shards) === 3) // below all → first vnode
    assert(lookup(10L, vhs, shards) === 3) // exact hit owns the key
    assert(lookup(11L, vhs, shards) === 1) // tie at 20 → smaller shard
    assert(lookup(21L, vhs, shards) === 0)
    assert(lookup(30L, vhs, shards) === 0)
    assert(lookup(31L, vhs, shards) === 3) // past the last vnode → wrap to 0th
    assert(lookup(Long.MaxValue, vhs, shards) === 3)
  }

  test("hashRingLoad reports DISTINCT-key load: duplicate key values collapse") {
    val dup = ((1L to 100L) ++ (1L to 100L) ++ Seq.fill(50)(7L)).toDF("k")
    val uniq = (1L to 100L).toDF("k")
    val a = Sampling.hashRingLoad(dup, col("k"), shards = 4, vnodes = 8)
      .select(col("shard"), col("n_keys")).as[(Long, Long)].collect().toMap
    val b = Sampling.hashRingLoad(uniq, col("k"), shards = 4, vnodes = 8)
      .select(col("shard"), col("n_keys")).as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a.values.sum === 100L)
  }
}

/** Apriori triples (x185): prune-before-expand and three-way lift. */
class BasketTriplesSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("basketTriples: infrequent items are pruned BEFORE expansion; lift hand-checked") {
    // sessions: {A,B,C} x3, {A,B,C,Z} x1 (Z infrequent), {A} x1
    val rows = (0 until 3).flatMap { u =>
      Seq((u.toLong, ts(s"2024-01-01 0$u:00:00"), u * 10L + 1, "A"),
        (u.toLong, ts(s"2024-01-01 0$u:01:00"), u * 10L + 2, "B"),
        (u.toLong, ts(s"2024-01-01 0$u:02:00"), u * 10L + 3, "C"))
    } ++ Seq(
      (7L, ts("2024-01-01 05:00:00"), 71L, "A"),
      (7L, ts("2024-01-01 05:01:00"), 72L, "B"),
      (7L, ts("2024-01-01 05:02:00"), 73L, "C"),
      (7L, ts("2024-01-01 05:03:00"), 74L, "Z"), // sup(Z)=1 < minSup
      (9L, ts("2024-01-01 06:00:00"), 91L, "A"))
    val e = rows.toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.EventAnalytics.basketTriples(e, col("user_id"),
        col("ts"), col("event_id"), col("event_type"),
        gapMicros = 1800000000L, minSup = 2L)
      .as[(String, String, String, Long, Long, Long, Long, Long)].collect()
    // only (A,B,C) survives: Z-containing triples never materialize
    assert(got.length === 1)
    val r = got.head
    assert((r._1, r._2, r._3) === (("A", "B", "C")))
    assert(r._4 === 4L) // sup_abc: all four 3-item sessions
    assert((r._5, r._6, r._7) === ((5L, 4L, 4L))) // sup A, B, C
    // lift = 4·5²·1e6 / (5·4·4) with n_sess = 5
    assert(r._8 === 4L * 5 * 5 * 1000000L / (5 * 4 * 4))
  }

  test("basketTriples: sessions with < 3 frequent items contribute nothing") {
    val e = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "B"),
      (2L, ts("2024-01-01 00:00:00"), 3L, "A"),
      (2L, ts("2024-01-01 00:01:00"), 4L, "B"))
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(graft.ops.EventAnalytics.basketTriples(e, col("user_id"),
      col("ts"), col("event_id"), col("event_type"),
      gapMicros = 1800000000L, minSup = 1L).count() === 0L)
  }
}

/** Candidate-key discovery (x184): exact counts, NULL and dup handling. */
class KeyCandidatesSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("keyCandidates: key, duplicate, and nullable columns classified exactly") {
    val df = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 10L, 100L), (2L, 10L, null), (3L, 20L, 300L), (4L, 20L, 300L))
      .toDF("id", "grp", "opt")
    val got = graft.ext.Profile.keyCandidates(df, Seq("id", "grp", "opt"))
      .orderBy("column_name")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got === Array(
      ("grp", 4L, 4L, 2L, 500000L, 0L),
      ("id", 4L, 4L, 4L, 1000000L, 1L),
      // 3 non-null, 2 distinct: nulls also disqualify via n_distinct < n_rows
      ("opt", 4L, 3L, 2L, 500000L, 0L)))
  }
}

/** Epoch shuffle (x186): determinism, per-epoch independence, checksum. */
class EpochShuffleSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("epochShuffle: deterministic, partition-invariant, checksum matches hand math") {
    val ids = (1L to 200L).toDF("doc_id")
    def run(parts: Int) =
      Sampling.epochShuffle(ids.repartition(parts), col("doc_id"),
          epochs = 2, shards = 4)
        .orderBy("epoch", "shard")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val a = run(1)
    assert(a === run(16)) // assignment is a pure function of (epoch, id)
    // recompute one (epoch, shard) cell's checksum from first principles
    val hs = ids.select(graft.ext.Dedup.md5Hash60(
        concat(lit(0L), lit(":"), col("doc_id"))).as("h"))
      .as[Long].collect()
    val cell = hs.filter(h => h % 4 == 1)
    val row = a.find(r => r._1 == 0L && r._2 == 1L).get
    assert(row._3 === cell.length.toLong)
    assert(row._4 === cell.min)
    assert(row._5 === (cell.map(BigInt(_)).sum % BigInt(2).pow(60)).toLong)
    // counts per epoch cover the corpus exactly once
    assert(a.filter(_._1 == 0L).map(_._3).sum === 200L)
  }

  test("epochShuffle: different epochs are different permutations") {
    val ids = (1L to 500L).toDF("doc_id")
    val byEpoch = Sampling.epochShuffle(ids, col("doc_id"), epochs = 2, shards = 4)
      .select("epoch", "shard", "checksum")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    // the shard checksums differ between epochs (re-shard really happened)
    val e0 = byEpoch(0L).map(r => (r._2, r._3)).toSet
    val e1 = byEpoch(1L).map(r => (r._2, r._3)).toSet
    assert(e0 !== e1)
  }
}

/** Bucketed KS drift (x187): hand-separable strata and the zero case. */
class Log2KsSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("log2Ks: disjoint bins give KS = 1e6 at the separating bin") {
    // A: 40 values in bin 0 (v=1); B: 60 values in bin 1 (v=2..3)
    val rows = (1 to 40).map(i => ("A", 1L)) ++ (1 to 60).map(i => ("B", 2L))
    val got = Profile.log2Ks(rows.toDF("s", "v"), col("s"), col("v"))
      .orderBy("s").as[(String, Long, Long, Long, Long)].collect()
    // at bin 0: cum_A = 40, rest cum = 0 -> |40·60 − 0·40| / (40·60) = 1
    assert(got === Array(("A", 40L, 60L, 1000000L, 0L),
      ("B", 60L, 40L, 1000000L, 0L)))
  }

  test("log2Ks: identical distributions drift zero; argmax tie picks smallest bin") {
    val rows = (1 to 30).flatMap(i => Seq(("A", (i % 7 + 1).toLong),
      ("B", (i % 7 + 1).toLong)))
    val got = Profile.log2Ks(rows.toDF("s", "v"), col("s"), col("v"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.forall(r => r._4 === 0L))
    assert(got.forall(r => r._5 === 0L)) // all-tied max -> smallest bin
  }

  test("log2Ks: a lone stratum (rest empty) drops out") {
    val rows = (1 to 10).map(i => ("only", i.toLong))
    assert(Profile.log2Ks(rows.toDF("s", "v"), col("s"), col("v")).count() === 0L)
  }
}

/** Group-aware k-fold (x189): exact dups and near dups co-fold; proof column. */
class GroupedKFoldSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("groupedKFold on the sf0.001 corpus: full coverage, zero cross-fold pairs") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Sampling.groupedKFold(docs, col("doc_id"), col("text"), kf = 5)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).sorted.toSeq === (0L until 5L))
    assert(got.map(_._2).sum === docs.count())      // every doc in a fold
    assert(got.forall(_._5 === 0L))                 // the leakage proof
    assert(got.forall(r => r._3 <= r._2))           // clusters <= docs
  }

  test("groupedKFold: byte-identical copies land in the SAME fold (the crep fix)") {
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text), (3L, text),
      (10L, "completely different content here about other things entirely " +
        (1 to 50).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    // recompute per-doc folds through the same machinery: run with kf=5
    // and assert the three copies contribute to ONE fold's n_docs >= 3
    val got = Sampling.groupedKFold(docs, col("doc_id"), col("text"), kf = 5)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._2).sum === 4L)
    assert(got.exists(_._2 >= 3L)) // the 3 copies share min-id rep 1 -> one fold
    assert(got.forall(_._5 === 0L))
  }
}

/** Half-life-decayed leaderboard (x191): exact power-of-two weights. */
class DecayedTopKSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("decayedTopK: recency beats raw count; weights hand-computed") {
    // 'old' fires 4x at 2 half-lives back (w=2^28 each);
    // 'fresh' fires 2x today (w=2^30 each) -> fresh outscores old
    val e = Seq(
      ("old", ts("2024-01-01 10:00:00")), ("old", ts("2024-01-01 11:00:00")),
      ("old", ts("2024-01-02 10:00:00")), ("old", ts("2024-01-02 11:00:00")),
      ("fresh", ts("2024-01-15 10:00:00")), ("fresh", ts("2024-01-15 11:00:00")))
      .toDF("event_type", "ts")
    val got = graft.ops.EventAnalytics.decayedTopK(e, col("event_type"),
        col("ts"), halfLifeDays = 7, k = 10)
      .as[(String, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq("fresh", "old"))
    assert(got(0)._2 === 2L * (1L << 30))
    // old: ages 14 and 13 days -> epochs 2 and 1 -> 2·2^28 + 2·2^29
    assert(got(1)._2 === 2L * (1L << 28) + 2L * (1L << 29))
    assert(got(1)._3 === 4L && got(1)._4 === 4L)
  }

  test("decayedTopK: events beyond the 30-epoch horizon score zero but count") {
    val e = Seq(
      ("t", ts("2020-01-01 00:00:00")),  // ancient: > 30 epochs back
      ("t", ts("2024-06-01 00:00:00")))
      .toDF("event_type", "ts")
    val got = graft.ops.EventAnalytics.decayedTopK(e, col("event_type"),
        col("ts"), halfLifeDays = 7, k = 10)
      .as[(String, Long, Long, Long)].head()
    assert(got._2 === (1L << 30)) // only the fresh event scores
    assert(got._3 === 2L && got._4 === 1L)
  }

  test("targetEncodeLoo: own label excluded, singleton key falls back to the prior") {
    // a: v=[10,20,30] (sum 60), b: [100] → global sum 160, n 4, μ=40
    // alpha=2: enc(a,10) = (60−10+80)·1e6/4 = 32.5e6; enc(a,20)=30e6;
    // enc(a,30)=27.5e6; enc(b,100) = (0+80)·1e6/2 = 40e6 — exactly the
    // smoothed prior, NOT 100e6 (the label never encodes itself)
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 100L)).toDF("k", "id", "v")
    val got = Sampling.targetEncodeLoo(df, col("k"), col("id"), col("v"),
        alpha = 2)
      .orderBy("id").as[(String, Long, Long)].collect()
    assert(got === Array(("a", 1L, 32500000L), ("a", 2L, 30000000L),
      ("a", 3L, 27500000L), ("b", 4L, 40000000L)))
    val dig = Sampling.targetEncodeDigest(
      Sampling.targetEncodeLoo(df.repartition(5), col("k"), col("id"),
        col("v"), alpha = 2))
      .orderBy("k").as[(String, Long, Long, Long, String)].collect()
    assert(dig === Array(("a", 3L, 27500000L, 32500000L, "90000000"),
      ("b", 1L, 40000000L, 40000000L, "40000000")))
  }

  test("systematicSample: exact stride size, checksum vs independent recompute, arg refusal") {
    val df = (1L to 100L).toDF("id")
    // independent recompute: hash, sort, stride in plain Scala
    val hs = df.select(Dedup.md5Hash60(col("id").cast("string")).as("h"))
      .as[Long].collect().sorted
    val picked = hs.zipWithIndex.filter(_._2 % 10 == 3).map(_._1)
    assert(picked.length === 10) // exact by construction, not binomial
    val expectedSum =
      picked.map(BigInt(_)).sum.mod(BigInt("1152921504606846976")).toLong
    val got = Sampling.systematicSample(df, col("id"), k = 10, offset = 3)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((100L, 10L, picked.min, picked.max, expectedSum, 100000L)))
    val again = Sampling.systematicSample(df.repartition(7), col("id"),
      k = 10, offset = 3).as[(Long, Long, Long, Long, Long, Long)].head()
    assert(again === got)
    intercept[IllegalArgumentException] {
      Sampling.systematicSample(df, col("id"), k = 1, offset = 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.systematicSample(df, col("id"), k = 10, offset = 10)
    }
  }

  test("shardUniformity: constant key collapses to the closed form (k−1)·N·1e6; healthy hash is not skewed") {
    // all rows on ONE shard: χ² = ((kN−N)² + (k−1)N²)/(kN) = (k−1)·N
    // exactly — the absent-shard closed form carries k−1 empty cells
    val const = (1L to 100L).map(_ => 5L).toDF("id")
    val got = Sampling.shardUniformity(const, col("id"), shards = 32)
      .as[(Long, Long, Long, Long, Long, Long, Long, Int)].head()
    assert(got === ((32L, 100L, 1L, 100L, 100L, 3100000000L, 100000000L, 1)))
    // distinct keys spread by md5: sane digest, not skewed
    val spread = (1L to 2000L).toDF("id")
    val g2 = Sampling.shardUniformity(spread, col("id"), shards = 32)
      .as[(Long, Long, Long, Long, Long, Long, Long, Int)].head()
    assert(g2._1 === 32L && g2._2 === 2000L && g2._3 === 32L)
    assert(g2._4 <= g2._5 && g2._6 >= 0L && g2._8 === 0)
    intercept[IllegalArgumentException] {
      Sampling.shardUniformity(spread, col("id"), shards = 1)
    }
  }

  test("targetEncodeLoo: constant target encodes to the constant for every row") {
    val df = Seq(("a", 1L, 7L), ("a", 2L, 7L), ("b", 3L, 7L))
      .toDF("k", "id", "v")
    val encs = Sampling.targetEncodeLoo(df, col("k"), col("id"), col("v"),
        alpha = 5)
      .select("enc_ppm").as[Long].collect().toSet
    assert(encs === Set(7000000L))
  }
}
