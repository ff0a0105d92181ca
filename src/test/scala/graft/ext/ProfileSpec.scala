package graft.ext

import org.apache.spark.sql.functions._

class ProfileSpec extends graft.SparkSpec {
  import spark.implicits._

  test("winsorizedStats: exact cut values, tail clamp counts, partition-invariant") {
    val df = (
      (1 to 10).map(i => ("a", i.toLong, i.toLong * 10)) ++       // a: 10..100
      Seq(("b", 1L, 1L), ("b", 2L, 2L), ("b", 3L, 3L), ("b", 4L, 1000000L))
    ).toDF("k", "id", "v")
    // a @ tailPct=30: n=10, lo_rank=(300+99)/100=3 → lo=30; hi_rank=8 → hi=80
    //   clamps: 10,20 → 30 (n_lo=2); 90,100 → 80 (n_hi=2)
    //   wsum = 30+30+30+40+50+60+70+80+80+80 = 550
    // b @ tailPct=30: n=4, lo_rank=(120+99)/100=2 → lo=2; hi_rank=3 → hi=3
    //   wsum = 2+2+3+3 = 10; the 1e6 outlier is clamped, not deleted
    val got = Profile.winsorizedStats(df, col("k"), col("id"), col("v"),
        tailPct = 30)
      .orderBy("k")
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
    assert(got(0) === (("a", 10L, 30L, 80L, 2L, 2L, "550")))
    assert(got(1) === (("b", 4L, 2L, 3L, 1L, 1L, "10")))
    // two-phase boundary discovery is deterministic under repartitioning
    val again = Profile.winsorizedStats(df.repartition(7), col("k"),
        col("id"), col("v"), tailPct = 30)
      .orderBy("k")
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
    assert(again === got)
  }

  test("winsorizedStats: single-row key degenerates to identity; bad tailPct refused") {
    val df = Seq(("solo", 1L, 42L)).toDF("k", "id", "v")
    val got = Profile.winsorizedStats(df, col("k"), col("id"), col("v"))
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
    assert(got === Array(("solo", 1L, 42L, 42L, 0L, 0L, "42")))
    intercept[IllegalArgumentException] {
      Profile.winsorizedStats(df, col("k"), col("id"), col("v"), tailPct = 50)
    }
  }

  private val df = Seq(
    (Some(1L), Some("a"), Some("x")),
    (Some(2L), Some("a"), None),
    (Some(3L), None, Some("x")),
    (Some(3L), Some("b"), Some("z"))
  ).toDF("id", "grp", "txt")

  test("null / distinct / min / max per column, one row per column") {
    val got = Profile.profile(df, Seq("id", "grp", "txt"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(got === Array(
      ("grp", 4L, 1L, 2L, "a", "b"),
      ("id", 4L, 0L, 3L, "1", "3"),
      ("txt", 4L, 1L, 2L, "x", "z")))
  }

  test("numeric min/max is numeric BEFORE the string render") {
    // 9 < 10 numerically but "9" > "10" lexicographically — the cast
    // must happen after the min/max, not before
    val d = Seq(9L, 10L, 2L).toDF("v")
    val got = Profile.profile(d, Seq("v"))
      .select("min_val", "max_val").as[(String, String)].head()
    assert(got === ("2", "10"))
  }

  test("hostile column names: quotes, spaces, dots profile safely; backticks refuse") {
    // names that would break — or inject expressions into — the stack()
    // SQL string if identifiers weren't backtick-quoted and labels
    // weren't escaped
    val hostile = df.select(
      col("id").as("id value"),          // space
      col("grp").as("grp.sub"),          // dot (must NOT parse as struct access)
      col("txt").as("it's"))             // quote (must not break the label literal)
    val got = Profile.profile(hostile, Seq("id value", "grp.sub", "it's"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(got === Array(
      ("grp.sub", 4L, 1L, 2L, "a", "b"),
      ("id value", 4L, 0L, 3L, "1", "3"),
      ("it's", 4L, 1L, 2L, "x", "z")))
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df.select(col("id").as("bad`tick")), Seq("bad`tick"))
    }
    assert(e.getMessage.contains("backtick"))
  }

  test("plan: ONE file scan — profiling never rescans per column") {
    val doc = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val p = Profile.profile(doc, Seq("doc_id", "source", "text"))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).length === 1, p)
  }
}

class KeySkewSpec extends graft.SparkSpec {
  import spark.implicits._

  test("hand-checked skew: hot key 6 of 10 rows over 5 keys -> skew 3e6") {
    // counts: hot=6, a..d=1 each -> n_keys=5, n_rows=10, max=6
    // skew_e6 = 6*5*1e6/10 = 3,000,000 (3x the uniform mean)
    val df = (Seq.fill(6)("hot") ++ Seq("a", "b", "c", "d")).toDF("k")
    val got = Profile.keySkew(df, col("k"), k = 3).collect()
    assert(got.length === 3)
    val top = got.head
    assert(top.getString(0) === "hot" && top.getLong(1) === 6L)
    assert(top.getLong(2) === 5L && top.getLong(3) === 10L)
    assert(got.forall(_.getLong(4) === 3000000L)) // table-wide factor on every row
    // uniform table -> skew exactly 1e6
    val uni = Seq("a", "b", "c", "d").toDF("k")
    assert(Profile.keySkew(uni, col("k"), k = 2).collect()
      .forall(_.getLong(4) === 1000000L))
  }
}

class RegionalRevenueSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("Q5 shape: local-supplier constraint prunes cross-nation pairs") {
    val dir = "/root/testdata/sf0.001"
    val full = graft.SparkEntry.queries("x106_regional_revenue")(spark, dir)
      .collect()
    // every output nation must be a EUROPE nation
    val euroNations = graft.Tables.nation(spark, dir)
      .join(graft.Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "EUROPE")
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(full.nonEmpty)
    assert(full.map(_.getString(0)).toSet.subsetOf(euroNations))
    // revenue positive and items counted
    assert(full.forall(r => r.getLong(1) > 0 && r.getDouble(2) > 0))
  }
}

class CovMatrixSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // hand-checkable: x = (1,2,3), y = (2,4,6) → cov(x,y) = 2·var(x)
  private val d = Seq((1L, 2L, 7L), (2L, 4L, 7L), (3L, 6L, 7L))
    .toDF("x", "y", "c")

  test("diagonal is the variance, constant column covaries with nothing") {
    val got = Profile.covMatrix(d, Seq(
        "x" -> col("x"), "y" -> col("y"), "c" -> col("c")))
      .orderBy("col_x", "col_y")
      .as[(String, String, Long, Long, Long, Long)].collect()
    val m = got.map(r => (r._1, r._2) -> r._6).toMap
    assert(m(("x", "x")) === 1L)   // sample var of 1,2,3
    assert(m(("x", "y")) === 2L)   // y = 2x → cov = 2·var(x)
    assert(m(("y", "y")) === 4L)   // var(2,4,6)
    assert(m(("x", "c")) === 0L)
    assert(m(("c", "c")) === 0L)
    assert(got.forall(_._3 === 3L)) // n_rows everywhere
    assert(got.length === 6)        // 3 cols → 6 unordered pairs
  }

  test("negative covariance truncates toward zero like the oracle's //") {
    // x = (1,2,3), z = (3,2,1) → cov = -var(x) = -1; and a pair whose
    // exact quotient is -1.5 must truncate to -1 (not floor to -2)
    val dz = Seq((1L, 3L, 6L), (2L, 2L, 3L), (3L, 1L, 0L)).toDF("x", "z", "w")
    val got = Profile.covMatrix(dz, Seq(
        "x" -> col("x"), "z" -> col("z"), "w" -> col("w")))
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._6).toMap
    assert(got(("x", "z")) === -1L)
    assert(got(("x", "w")) === -3L)  // cov = -3 exactly
    assert(got(("z", "w")) === 3L)
  }

  test("label hygiene: non-identifier labels refuse loudly") {
    val e = intercept[IllegalArgumentException] {
      Profile.covMatrix(d, Seq("a b" -> col("x"), "y" -> col("y")))
    }
    assert(e.getMessage.contains("identifier-safe"))
  }
}

class JoinCardSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("histogram product equals the materialized equi-join count") {
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")       // counts 3,1,1
    val r = Seq(1L, 1L, 2L, 4L).toDF("k")           // counts 2,1,1
    val got = Profile.joinCardStats(l, col("k"), r, col("k"), "e")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    val actual = l.join(r, Seq("k")).count()
    assert(got === (("e", 5L, 4L, 3L, 3L, 2L, actual, 6L)))
    assert(actual === 7L) // 3·2 + 1·1
  }

  test("disjoint keys: zero matched, zero join rows, not null") {
    val l = Seq(1L, 2L).toDF("k")
    val r = Seq(3L).toDF("k")
    val got = Profile.joinCardStats(l, col("k"), r, col("k"), "e")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got === (("e", 2L, 1L, 2L, 1L, 0L, 0L, 0L)))
  }
}

class ZoneMapSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // keys 0..9 in blocks of 4 → blocks {0,1,2}; measure clustered so
  // block 0 holds 0..3, block 1 holds 40..43, block 2 holds 80..81
  private val d = (0L to 9L).map(k => (k, if (k < 4) k else if (k < 8) k + 36 else k + 72))
    .toDF("k", "m")

  test("block stats: count and min/max per block") {
    val got = Layout.zoneMapStats(d, col("k"), col("m"), 4L)
      .orderBy("blk").as[(Long, Long, Long, Long)].collect()
    assert(got === Array((0L, 4L, 0L, 3L), (1L, 4L, 40L, 43L), (2L, 2L, 80L, 81L)))
  }

  test("prune audit: clustered layout prunes non-overlapping blocks exactly") {
    val got = Layout.zonePruneAudit(d, col("k"), col("m"), 4L, lo = 40L, hi = 50L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    // blocks 0 (max 3 < 40) and 2 (min 80 > 50) prune; block 1 matches fully
    assert(got === ((3L, 10L, 2L, 6L, 4L, 600000L, 400000L)))
  }

  test("scrambled layout prunes nothing — the audit exposes read amplification") {
    val bad = Seq((0L, 0L), (1L, 100L), (4L, 1L), (5L, 99L)).toDF("k", "m")
    val got = Layout.zonePruneAudit(bad, col("k"), col("m"), 4L, lo = 40L, hi = 60L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    // every block spans the predicate → zero pruned, zero matches
    assert(got === ((2L, 4L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("chi2Assoc: hand-checked 2x2 — dependent pair scores 2.0, independent scores 0") {
    // counts (x,p)=3 (x,q)=1 (y,p)=1 (y,q)=3: N=8, all margins 4,
    // e=2 per cell → chi2 = 4·(1²/2) = 2.0 exactly
    def rows(c: (Int, Int, Int, Int)) =
      (Seq.fill(c._1)(("x", "p")) ++ Seq.fill(c._2)(("x", "q")) ++
        Seq.fill(c._3)(("y", "p")) ++ Seq.fill(c._4)(("y", "q")))
        .toDF("a", "b")
    val dep = Profile.chi2Assoc(rows((3, 1, 1, 3)), col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(dep === ((8L, 2L, 2L, 4L, 1L, 2000000L, 250000L)))
    val ind = Profile.chi2Assoc(rows((2, 2, 2, 2)), col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(ind === ((8L, 2L, 2L, 4L, 1L, 0L, 0L)))
  }

  test("chi2Assoc: unoccupied cells fold into the -N term (diagonal-only table)") {
    // (x,p)=2, (y,q)=2 and nothing off-diagonal: N=4, margins all 2,
    // per-cell t = 4·4·1e6/4 = 4e6, tsum 8e6 → chi2 = 4.0 (= N·dof for
    // a perfect diagonal); occupied cells reported as 2, levels 2×2
    val df = (Seq.fill(2)(("x", "p")) ++ Seq.fill(2)(("y", "q"))).toDF("a", "b")
    val got = Profile.chi2Assoc(df, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((4L, 2L, 2L, 2L, 1L, 4000000L, 1000000L)))
  }

  test("tCloseness: skewed class flags, matching class passes; absent-value term exact") {
    // corpus: class A = 6×s2, class B = 2×s1 → global s1=2 s2=6 N=8
    //   A: p=(0,1) vs (.25,.75) → tvd .25 → 250000 ppm, not > t
    //   B: p=(1,0) vs (.25,.75) → tvd .75 → 750000 ppm, at risk
    // B's occupied cells never mention s2 — its |0−p| mass must come
    // from the closed-form n·(N−gsum) term
    val df = (Seq.fill(6)(("A", "s2")) ++ Seq.fill(2)(("B", "s1")))
      .toDF("cls", "sv")
    val got = Profile.tCloseness(df, Seq(("cls", col("cls"))), col("sv"),
        tPpm = 250000L)
      .orderBy("cls").as[(String, Long, Long, Int)].collect()
    assert(got === Array(("A", 6L, 250000L, 0), ("B", 2L, 750000L, 1)))
  }

  test("marketConcentration: hand HHI/CR4; monopoly reads 1e6/1e6") {
    // market 1: firms 1..5 with revenue 50,30,10,5,5 → R=100,
    //   HHI = 3550·1e6/10000 = 355000; CR4 = 95·1e6/100 = 950000
    // market 2: one firm → both read 1e6 exactly
    val df = Seq((1L, 1L, 50L), (1L, 2L, 30L), (1L, 3L, 10L),
      (1L, 4L, 5L), (1L, 5L, 5L), (2L, 9L, 7L)).toDF("m", "f", "r")
    val got = Profile.marketConcentration(df, col("m"), col("f"), col("r"))
      .orderBy("m").as[(Long, Long, String, Long, Long)].collect()
    assert(got === Array((1L, 5L, "100", 355000L, 950000L),
      (2L, 1L, "7", 1000000L, 1000000L)))
    val again = Profile.marketConcentration(df.repartition(7), col("m"),
      col("f"), col("r")).orderBy("m")
      .as[(Long, Long, String, Long, Long)].collect()
    assert(again === got)
  }

  test("giniSplit: pure branch scores 0, mixed branch hand-checked, parent row carries gain") {
    // A: {p:2, q:2} → imp (16−8)e6/16 = 500000, wimp 500000·4/8 = 250000
    // B: {p:4}      → imp 0, wimp 0
    // <all>: {p:6, q:2} → imp (64−40)e6/64 = 375000 = its own wimp
    // gain = 375000 − 250000 − 0 = 125000 read straight off the rows
    val df = (Seq.fill(2)(("A", "p")) ++ Seq.fill(2)(("A", "q")) ++
      Seq.fill(4)(("B", "p"))).toDF("feat", "y")
    val got = Profile.giniSplit(df, col("feat"), col("y"))
      .orderBy("f").as[(String, Long, Long, Long, Long)].collect()
    assert(got === Array(("<all>", 8L, 2L, 375000L, 375000L),
      ("A", 4L, 2L, 500000L, 250000L), ("B", 4L, 1L, 0L, 0L)))
  }

  test("rankAuc: perfect separation reads 1e6; midrank tie hand-checked to 0.625") {
    val perfect = Seq((1, 3L, 1L), (1, 4L, 2L), (0, 1L, 3L), (0, 2L, 4L))
      .toDF("y", "v", "id")
    val p = Profile.rankAuc(perfect, col("y"), col("v"), col("id"))
      .as[(Long, Long, String, Long)].head()
    assert(p === ((2L, 2L, "8", 1000000L)))
    // pos = {1, 3}, neg = {1, 2}: U = 1(tie ½) + 0 + 1 + 1 = 2.5 → 0.625
    val tied = Seq((1, 1L, 1L), (1, 3L, 2L), (0, 1L, 3L), (0, 2L, 4L))
      .toDF("y", "v", "id")
    val t = Profile.rankAuc(tied, col("y"), col("v"), col("id"))
      .as[(Long, Long, String, Long)].head()
    assert(t === ((2L, 2L, "5", 625000L)))
    // two-phase rank is repartition-invariant
    val again = Profile.rankAuc(tied.repartition(7), col("y"), col("v"),
      col("id")).as[(Long, Long, String, Long)].head()
    assert(again === t)
  }

  test("twoProportionZ2: textbook 3.81 misses the 3.84 bar, a wide gap clears it, empty pool is NULL") {
    val df = (Seq.fill(5)(("A", 1)) ++ Seq.fill(5)(("A", 0)) ++
      Seq.fill(1)(("B", 1)) ++ Seq.fill(9)(("B", 0)) ++
      Seq.fill(9)(("C", 1)) ++ Seq.fill(1)(("C", 0)) ++
      Seq.fill(5)(("D", 0)) ++ Seq.fill(5)(("E", 0))).toDF("s", "c")
    val got = Profile.twoProportionZ2(df, col("s"), col("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(6), if (r.isNullAt(7)) -1L else r.getLong(7), r.getInt(8)))
      .toMap
    // .5 vs .1 on 10+10: z² = .16/(.3·.7·.2) = 3.8095… — NOT significant
    assert(got(("A", "B")) === ((400000L, 3809523L, 0)))
    // .1 vs .9: z² = 12.8 — significant, diff truncates toward zero
    assert(got(("B", "C")) === ((-800000L, 12800000L, 1)))
    // zero conversions pooled: NULL z², not a crash, not significant
    assert(got(("D", "E")) === ((0L, -1L, 0)))
  }

  test("calibrationTable: equal-population buckets, label decoded from the rank id") {
    // ids 1..10, score 101−id (id 1 highest), label = id odd, 5 buckets
    // → buckets pair (1,2)(3,4)… each n=2, one positive, rate 500000
    val df = (1L to 10L).map(i => (i, 101L - i, (i % 2).toInt))
      .toDF("id", "sc", "y")
    val got = Profile.calibrationTable(df, col("id"), col("sc"), col("y"),
        buckets = 5)
      .orderBy("bucket").as[(Long, Long, Long, Long, String, Long)].collect()
    assert(got === Array(
      (0L, 2L, 1L, 500000L, "199", 99L), (1L, 2L, 1L, 500000L, "195", 97L),
      (2L, 2L, 1L, 500000L, "191", 95L), (3L, 2L, 1L, 500000L, "187", 93L),
      (4L, 2L, 1L, 500000L, "183", 91L)))
  }

  test("oneWayAnova: textbook F=50 exact; zero within-variance and single group read NULL") {
    // a=[10,12], b=[20,22]: SSB=100, SSW=4 → F = (100/1)/(4/2) = 50
    val df = Seq(("a", 10L), ("a", 12L), ("b", 20L), ("b", 22L))
      .toDF("g", "v")
    val got = Profile.oneWayAnova(df, col("g"), col("v"),
        fCritPpm = 2371945L)
      .as[(Long, Long, String, String, Option[Long], Int)].head()
    assert(got === ((2L, 4L, "100000000", "4000000", Some(50000000L), 1)))
    // groups internally constant: SSW = 0 → NULL, not divide-by-zero
    val const = Seq(("a", 10L), ("a", 10L), ("b", 20L), ("b", 20L))
      .toDF("g", "v")
    val g2 = Profile.oneWayAnova(const, col("g"), col("v"), 2371945L)
      .as[(Long, Long, String, String, Option[Long], Int)].head()
    assert(g2._5 === None && g2._6 === 0)
    // one group: k < 2 → NULL
    val solo = Seq(("a", 1L), ("a", 5L)).toDF("g", "v")
    val g3 = Profile.oneWayAnova(solo, col("g"), col("v"), 2371945L)
      .as[(Long, Long, String, String, Option[Long], Int)].head()
    assert(g3._1 === 1L && g3._5 === None)
  }

  test("log2Chi2Drift: disjoint bins read chi2 = N exactly; identical mixes read 0; lone stratum NULL") {
    // A: 4 values in bin 1 (2,3), B: 4 in bin 2 (4..7) — perfectly
    // separated 2×2: χ² = N = 8 → 8e6 ppm, per-dof 8e6, drifted
    val sep = (Seq(2L, 3L, 2L, 3L).map(("A", _)) ++
      Seq(4L, 5L, 6L, 7L).map(("B", _))).toDF("s", "v")
    val g1 = Profile.log2Chi2Drift(sep, col("s"), col("v"))
      .orderBy("s")
      .as[(String, Long, Long, Long, Long, Long, Int)].collect()
    assert(g1 === Array(("A", 4L, 4L, 2L, 8000000L, 8000000L, 1),
      ("B", 4L, 4L, 2L, 8000000L, 8000000L, 1)))
    // identical per-bin mixes: every d = 0 → χ² exactly 0
    val same = (Seq(2L, 2L, 4L, 4L).map(("A", _)) ++
      Seq(3L, 3L, 5L, 5L).map(("B", _))).toDF("s", "v")
    val g2 = Profile.log2Chi2Drift(same, col("s"), col("v"))
      .orderBy("s")
      .as[(String, Long, Long, Long, Long, Long, Int)].collect()
    assert(g2.map(r => (r._5, r._7)).toSeq === Seq((0L, 0), (0L, 0)))
    // one stratum owns the corpus: REST is empty → NULL, not a crash
    val solo = Seq(("A", 2L), ("A", 5L)).toDF("s", "v")
    val g3 = Profile.log2Chi2Drift(solo, col("s"), col("v")).collect().head
    assert(g3.isNullAt(4) && g3.getInt(6) === 0)
  }

  test("tCloseness: a class mirroring the global mix scores zero") {
    val df = (Seq.fill(3)(("A", "s1")) ++ Seq.fill(1)(("A", "s2")) ++
      Seq.fill(3)(("B", "s1")) ++ Seq.fill(1)(("B", "s2"))).toDF("cls", "sv")
    val got = Profile.tCloseness(df, Seq(("cls", col("cls"))), col("sv"),
        tPpm = 100000L)
      .orderBy("cls").as[(String, Long, Long, Int)].collect()
    assert(got === Array(("A", 4L, 0L, 0), ("B", 4L, 0L, 0)))
  }

  test("kruskalWallis: hand-checked H without and with ties; all-tied is NULL") {
    // a={1,2}, b={3,4}: ranks 1..4, R_a=3, R_b=7 →
    // H = 12/(4·5)·(9/2+49/2) − 15 = 2.4 → 2400000 ppm; no ties →
    // h_tie = h
    val plain = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 3L),
      ("b", 4L, 4L)).toDF("g", "v", "id")
    val g1 = Profile.kruskalWallis(plain, col("g"), col("v"), col("id"),
        chi2CritPpm = 3841459L)
      .as[(Long, Long, Long, Long, Int)].head()
    assert(g1 === ((4L, 2L, 2400000L, 2400000L, 0)))
    // a={1,1}, b={2,2}: midrank2 = 3,3,7,7 → same d = ±4 → same raw H;
    // ties T = 6+6 → h_tie = 2.4e6·60/(60−12) = 3e6 — and it crosses a
    // 2999999 threshold the uncorrected H does not
    val tied = Seq(("a", 1L, 1L), ("a", 1L, 2L), ("b", 2L, 3L),
      ("b", 2L, 4L)).toDF("g", "v", "id")
    val g2 = Profile.kruskalWallis(tied, col("g"), col("v"), col("id"),
        chi2CritPpm = 2999999L)
      .as[(Long, Long, Long, Long, Int)].head()
    assert(g2 === ((4L, 2L, 2400000L, 3000000L, 1)))
    // every value tied: variance denominator hits zero → NULL, not ∞
    val const = Seq(("a", 5L, 1L), ("a", 5L, 2L), ("b", 5L, 3L))
      .toDF("g", "v", "id")
    val g3 = Profile.kruskalWallis(const, col("g"), col("v"), col("id"),
      chi2CritPpm = 1L).collect().head
    assert(g3.getLong(2) === 0L && g3.isNullAt(3) && g3.getInt(4) === 0)
  }

  test("cochranArmitage: 0/1 scores reduce to the 2x2 Pearson chi2; degenerate margins are NULL") {
    // scores {0,1}, n=2 each, positives 0 and 2: D=4, V=4 →
    // z² = ⌊16/4⌋·4·1e6/(2·2) = 4e6 — exactly the 2×2 χ² — and the
    // perfect split is significant with a positive trend
    val df = Seq((0L, 0L), (0L, 0L), (1L, 1L), (1L, 1L)).toDF("w", "y")
    val g1 = Profile.cochranArmitage(df, col("w"), col("y"))
      .as[(Long, Long, Long, String, Long, Int, Int)].head()
    assert(g1 === ((4L, 2L, 2L, "4", 4000000L, 1, 1)))
    // all-positive outcome: x = n → undefined → NULL
    val allPos = Seq((0L, 1L), (1L, 1L)).toDF("w", "y")
    val g2 = Profile.cochranArmitage(allPos, col("w"), col("y")).collect().head
    assert(g2.isNullAt(4) && g2.getInt(6) === 0)
    // one score value: V = 0 → NULL
    val oneScore = Seq((2L, 0L), (2L, 1L)).toDF("w", "y")
    val g3 = Profile.cochranArmitage(oneScore, col("w"), col("y")).collect().head
    assert(g3.isNullAt(4))
    // out-of-range score refuses loudly at runtime
    val bad = Seq((40L, 0L), (0L, 1L)).toDF("w", "y")
    intercept[Exception] {
      Profile.cochranArmitage(bad, col("w"), col("y")).collect()
    }
  }

  test("brierDecomposition: exact Murphy terms; unseen segments are dropped") {
    // train x: 4 rows 1 pos → p̂ = 0.25; test x: 4 rows 2 pos →
    // mean(0.25−y)² = 0.3125 = reliability 0.0625 + uncertainty 0.25.
    // Segment z exists only in test → no prediction → dropped.
    val rows = Seq(("x", 1L, true), ("x", 0L, true), ("x", 0L, true),
      ("x", 0L, true), ("x", 1L, false), ("x", 1L, false),
      ("x", 0L, false), ("x", 0L, false), ("z", 1L, false))
    val df = rows.toDF("seg", "y", "tr")
    val got = Profile.brierDecomposition(df, col("seg"), col("y"), col("tr"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(got === Array(("x", 4L, 1L, 250000L, 4L, 2L, 500000L,
      62500L, 250000L, 312500L)))
  }
}
