package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins x79 (winnowing fingerprints) and x80 (leakage-free split). */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val n = 3
  private val w = 4

  test("winnowing guarantee: a shared run of >= w+n-1 words yields a shared fingerprint") {
    // 6 shared words (= w+n-1) embedded in otherwise-distinct docs.
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"one two $shared three four five six seven"),
      (2L, s"red green blue $shared yellow purple orange")).toDF("doc_id", "text")
    val pairs = Dedup.sharedFingerprintPairs(df, col("doc_id"), col("text"), n, w)
      .collect()
    assert(pairs.length === 1)
    assert(pairs.head.getAs[Long]("doc_a") === 1L)
    assert(pairs.head.getAs[Long]("doc_b") === 2L)
    assert(pairs.head.getAs[Long]("n_shared") >= 1L)
  }

  test("winnowed density is far below full shingle density") {
    val words = (1 to 400).map(i => s"w${i % 97}x$i").mkString(" ")
    val df = Seq((1L, words)).toDF("doc_id", "text")
    val nShingles = 400 - n + 1
    val nFps = Dedup.winnowFingerprints(df, col("doc_id"), col("text"), n, w).count()
    // expectation ~ 2/(w+1) = 40%; allow slack, but it must beat 60%
    assert(nFps < nShingles * 6 / 10, s"$nFps of $nShingles kept")
  }

  test("sub-w docs contribute exactly their single global minimum") {
    // 4 words -> 2 shingles (< w windows) -> 1 fingerprint
    val df = Seq((7L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(df, col("doc_id"), col("text"), n, w).collect()
    assert(fps.length === 1)
  }

  test("hot fingerprint df cap drops boilerplate buckets") {
    val boiler = "the same exact boilerplate sentence repeated everywhere verbatim"
    val df = (1L to 10L).map(i => (i, s"$boiler unique$i")).toDF("doc_id", "text")
    val capped = Dedup.sharedFingerprintPairs(df, col("doc_id"), col("text"), n, w,
      maxFpDf = 4L)
    // every fingerprint from the shared sentence has df=10 > 4 -> no pairs
    assert(capped.count() === 0L)
    val uncapped = Dedup.sharedFingerprintPairs(df, col("doc_id"), col("text"), n, w,
      maxFpDf = 64L)
    assert(uncapped.count() === 45L) // all C(10,2) pairs share the run
  }
}

class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  test("rows in the same group always land in the same split") {
    val df = (1L to 300L).map(i => (i, s"g${i % 37}")).toDF("id", "grp")
    val out = Sampling.leakageFreeSplit(df, col("id"), col("grp"))
    val perGroup = out.groupBy("grp").agg(countDistinct(col("split")).as("k"))
      .agg(max(col("k"))).as[Long].head()
    assert(perGroup === 1L)
    assert(out.count() === 300L) // no row lost on the join-back
  }

  test("split is keyed on the representative (min id), not the row id") {
    val df = Seq((5L, "a"), (9000L, "a"), (42L, "b")).toDF("id", "grp")
    val out = Sampling.leakageFreeSplit(df, col("id"), col("grp")).collect()
    val byId = out.map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(5L).getAs[Long]("rep_id") === 5L)
    assert(byId(9000L).getAs[Long]("rep_id") === 5L)
    assert(byId(9000L).getAs[String]("split") === byId(5L).getAs[String]("split"))
    val bucket = byId(5L).getAs[Long]("bucket")
    val expected =
      if (bucket < 8000L) "train" else if (bucket < 9000L) "val" else "test"
    assert(byId(5L).getAs[String]("split") === expected)
  }

  test("custom boundaries partition the hash space as declared") {
    val df = (1L to 2000L).map(i => (i, i)).toDF("id", "grp") // singleton groups
    val out = Sampling.leakageFreeSplit(df, col("id"), col("grp"),
      Seq(("a", 5000L), ("b", 10000L)))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("a", "b"))
    // deterministic md5 buckets: roughly half each; pin the exact realized counts
    assert(counts("a") + counts("b") === 2000L)
    assert(math.abs(counts("a") - 1000L) < 150, counts.toString)
    val again = Sampling.leakageFreeSplit(df, col("id"), col("grp"),
      Seq(("a", 5000L), ("b", 10000L)))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again === counts) // deterministic
  }

  test("malformed boundaries are refused loudly") {
    val df = Seq((1L, "a")).toDF("id", "grp")
    intercept[IllegalArgumentException] {
      Sampling.leakageFreeSplit(df, col("id"), col("grp"), Seq(("a", 9000L)))
    }
    intercept[IllegalArgumentException] {
      Sampling.leakageFreeSplit(df, col("id"), col("grp"),
        Seq(("a", 9000L), ("b", 8000L), ("c", 10000L)))
    }
    intercept[IllegalArgumentException] {
      Sampling.leakageFreeSplit(df, col("id"), col("grp"),
        Seq(("a", 0L), ("b", 10000L)))
    }
  }
}

/** Pins x82 (rendezvous/HRW sharding). */
class RendezvousSpec extends SparkSpec {
  import spark.implicits._

  private def assign(ids: Seq[Long], shards: Int): Map[Long, Long] =
    ids.toDF("id")
      .select(col("id"), Sampling.rendezvousShard(col("id"), shards).as("s"))
      .as[(Long, Long)].collect().toMap

  test("matches an independent per-key argmax over the same md5 family") {
    // recompute the rendezvous winner with java.security MessageDigest —
    // no Spark expression shared with the implementation
    def h(key: String, s: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$key:$s".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val ids = (1L to 50L).toSeq
    val expected = ids.map { id =>
      id -> (0 until 8).maxBy(s => (h(id.toString, s), s)).toLong
    }.toMap
    assert(assign(ids, 8) === expected)
  }

  test("growing the ring by one moves docs ONLY to the new shard") {
    val ids = (1L to 500L).toSeq
    val s8 = assign(ids, 8)
    val s9 = assign(ids, 9)
    val moved = ids.filter(id => s8(id) != s9(id))
    // every mover lands on the NEW shard (a rendezvous winner can only
    // change if the newcomer outbids it) — the consistent-placement law
    assert(moved.nonEmpty)
    moved.foreach(id => assert(s9(id) === 8L, s"doc $id moved to ${s9(id)}"))
    // and the expected movement is ~1/9 of the corpus, not ~8/9
    assert(moved.size < 500 / 4, s"${moved.size} moved")
  }

  test("all shards of a 500-doc corpus are populated; shards=1 is constant") {
    val ids = (1L to 500L).toSeq
    assert(assign(ids, 8).values.toSet === (0L until 8L).toSet)
    assert(assign(ids, 1).values.toSet === Set(0L))
  }

  test("plan is pure scan-side codegen — zero exchanges") {
    val df = (1L to 10L).toDF("id")
      .select(Sampling.rendezvousShard(col("id"), 8).as("s"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("shard counts outside [1, 4096] are refused loudly") {
    intercept[IllegalArgumentException] { Sampling.rendezvousShard(lit(1L), 0) }
    intercept[IllegalArgumentException] { Sampling.rendezvousShard(lit(1L), 4097) }
  }
}

/** Pins x89 (token-budget corpus cut). */
class TokenBudgetCutSpec extends SparkSpec {
  import spark.implicits._

  private def h60(key: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("keeps the maximal hash-order prefix fitting the budget; overflow doc drops") {
    // one stratum, docs of 10 tokens each, budget 35 -> exactly the
    // first 3 docs IN HASH ORDER survive (the 4th would reach 40)
    val docs = (1L to 6L)
      .map(i => (i, "s", (1 to 10).map(j => s"w$j").mkString(" ")))
      .toDF("id", "src", "text")
    val kept = Sampling.tokenBudgetCut(docs, col("src"), col("id"),
      col("text"), budget = 35L)
      .select("id", "cum_tok").as[(Long, Long)].collect().toMap
    val hashOrder = (1L to 6L).sortBy(i => (h60(i.toString), i))
    assert(kept.keySet === hashOrder.take(3).toSet)
    assert(kept(hashOrder(2)) === 30L)   // running total through 3rd doc
  }

  test("budgets cut per stratum independently; rerun and re-partitioning identical") {
    val docs = (1L to 40L)
      .map(i => (i, s"s${i % 3}", (0 to (i % 5).toInt).map(j => s"t$j").mkString(" ")))
      .toDF("id", "src", "text")
    val a = Sampling.tokenBudgetCut(docs, col("src"), col("id"),
      col("text"), budget = 12L)
      .select("id", "src", "cum_tok").as[(Long, String, Long)].collect().toSet
    assert(a.nonEmpty)
    a.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.map(_._3).max <= 12L, s"stratum $src over budget")
    }
    val b = Sampling.tokenBudgetCut(docs.repartition(7), col("src"), col("id"),
      col("text"), budget = 12L)
      .select("id", "src", "cum_tok").as[(Long, String, Long)].collect().toSet
    assert(b === a)
  }

  test("non-positive budgets are refused loudly") {
    val docs = Seq((1L, "s", "a b")).toDF("id", "src", "text")
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetCut(docs, col("src"), col("id"), col("text"), 0L)
    }
  }
}

/** Pins x87 (DSIR target-affinity selection scores). */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "alpha beta alpha beta"), // target: ab x2, ba x1
    (2L, "de", "delta gamma"),           // raw-only feature dg
    (3L, "de", "alpha beta")             // non-target doc, target-like feature
  ).toDF("doc_id", "lang", "text")

  private def score(scale: Long): Map[Long, (Long, Long)] =
    Sampling.dsirAffinity(docs, col("doc_id"), col("text"),
      col("lang") === "en", buckets = 4096, scale = scale)
      .as[(Long, Long, Long)].collect()
      .map { case (d, n, s) => d -> (n, s) }.toMap

  test("hand-computed smoothed ratios; target-like non-target doc outranks raw-only doc") {
    // c(ab)=3/tgt 2, c(ba)=1/tgt 1, c(dg)=1/tgt 0 (4096 buckets — no
    // collisions among 3 features); r = (c_tgt+1)*scale DIV (c_all+1)
    // r(ab)=750, r(ba)=1000, r(dg)=500 at scale 1000
    val got = score(1000L)
    assert(got === Map(
      1L -> (3L, (2 * 750L + 1000L) / 3),   // 833
      2L -> (1L, 500L),
      3L -> (1L, 750L)))
    assert(got(3L)._2 > got(2L)._2)          // selection separates them
  }

  test("deterministic under re-partitioning") {
    val base = Sampling.dsirAffinity(docs, col("doc_id"), col("text"),
      col("lang") === "en").as[(Long, Long, Long)].collect().sortBy(_._1)
    val again = Sampling.dsirAffinity(docs.repartition(5), col("doc_id"),
      col("text"), col("lang") === "en")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(again === base)
  }

  test("law: dsir_score is bounded by scale (r(f) ≤ scale since c_tgt ≤ c_all)") {
    val fuzz = (0L until 60L).map { i =>
      (i, if (i % 3 == 0) "en" else "de",
        (0 to (i % 7).toInt).map(j => s"w${(i * 13 + j * 7) % 19}").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val got = Sampling.dsirAffinity(fuzz, col("doc_id"), col("text"),
      col("lang") === "en", scale = 5000L)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (d, n, s) =>
      assert(n >= 1L && s >= 0L && s <= 5000L, s"doc $d n=$n score=$s")
    }
  }

  test("bucket and scale bounds are refused loudly") {
    intercept[IllegalArgumentException] {
      Sampling.dsirAffinity(docs, col("doc_id"), col("text"), lit(true), buckets = 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.dsirAffinity(docs, col("doc_id"), col("text"), lit(true), scale = 0L)
    }
  }
}

class CrossSourceDupSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("sources sharing a long passage pair up; isolated source stays out") {
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, "sA", passage + " tail one"),
      (2L, "sB", "head two " + passage),
      (3L, "sC", "completely different words that share nothing at all here"))
      .toDF("doc_id", "source", "text")
    val fp = Dedup.winnowFingerprints(docs, col("doc_id"), col("text"), n = 3, w = 4)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select("fp", "source").distinct()
    val pairs = fp.select(col("fp"), col("source").as("source_a"))
      .join(fp.select(col("fp"), col("source").as("source_b")), Seq("fp"))
      .where(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs.contains(("sA", "sB"))) // >= w+n-1 = 6 shared words guarantee
    assert(pairs.keys.forall { case (a, b) => a != "sC" && b != "sC" })
  }
}

class InterarrivalSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("gaps via per-user lag: known cadence yields exact order-statistic quantiles") {
    // user 1: events at 0s, 10s, 20s, 100s -> gaps 10s, 10s, 80s (micros)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val events = Seq(
      (1L, 10L, ts(0)), (2L, 10L, ts(10)), (3L, 10L, ts(20)), (4L, 10L, ts(100)))
      .toDF("event_id", "user_id", "ts")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val gaps = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .where(col("prev_us").isNotNull)
      .select(col("user_id"), (col("us") - col("prev_us")).as("gap"))
    val got = Profile.groupQuantiles(gaps, col("user_id"), col("gap"),
      Seq(25, 50, 75, 99)).collect().head
    // n=3: p25 -> pos 1 (10s), p50 -> pos 2 (10s), p75/p99 -> pos 3 (80s)
    assert(got.getLong(1) === 3L)
    assert(got.getLong(2) === 10000000L && got.getLong(3) === 10000000L)
    assert(got.getLong(4) === 80000000L && got.getLong(5) === 80000000L)
  }
}

class DupOccurrenceRateSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("hand-checked: shared passage counts as dup occurrences in BOTH sources") {
    // 5-gram short-doc fallback: each doc contributes its whole text
    // as one occurrence. sA has the passage twice (2 dup occ of 2);
    // sB has it once (1 of 2, the cross-source copy) + 1 unique.
    val docs = Seq(
      (1L, "sA", "one two three"),
      (2L, "sA", "one two three"),
      (3L, "sB", "one two three"),
      (4L, "sB", "totally unique text"))
      .toDF("doc_id", "source", "text")
    val occ = docs.select(col("source"),
      explode(graft.functions.WordShingles.word_shingles(col("text"), 5)).as("g"))
      .select(col("source"), Dedup.md5Hash60(col("g")).as("h"))
    val ps = occ.groupBy("source", "h").agg(count(lit(1)).as("c_sh"))
    val ch = ps.groupBy("h").agg(sum(col("c_sh")).as("c_h"))
    val res = ps.join(ch, Seq("h")).groupBy("source")
      .agg(sum(col("c_sh")).as("n_occ"),
        sum(when(col("c_h") >= 2, col("c_sh")).otherwise(0L)).as("n_dup_occ"))
      .select(col("source"), col("n_occ"), col("n_dup_occ"),
        expr("n_dup_occ * 1000000L DIV n_occ").as("dup_e6"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(res("sA") === ((2L, 2L, 1000000L)))
    assert(res("sB") === ((2L, 1L, 500000L)))
  }
}

class ShardBalanceSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("loads partition the corpus; skew factor >= 1e6 and on every row") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = graft.SparkEntry.queries("x110_shard_balance")(
      spark, "/root/testdata/sf0.001").collect()
    assert(got.map(_.getLong(1)).sum === docs.count())
    val skews = got.map(_.getLong(3)).toSet
    assert(skews.size === 1 && skews.head >= 1000000L) // table-wide scalar
    assert(got.length <= 8 && got.length >= 2)          // HRW spreads the keys
  }
}
