package graft.ext

import org.apache.spark.sql.functions._

/** Pins BPE merge semantics (ext/Vocab) against hand-computed rounds. */
class VocabSpec extends graft.SparkSpec {
  import spark.implicits._

  private def run(words: Seq[(String, Long)], rounds: Int): Map[String, Seq[String]] =
    Vocab.bpeRounds(words.toDF("word", "freq"), rounds)
      .orderBy("word", "pos")
      .as[(String, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._4).toSeq).toMap

  test("three hand-computed rounds: weighted argmax, greedy self-pair overlap, merged-symbol pairs") {
    val words = Seq(("ab", 3L), ("abab", 2L), ("aaaa", 1L))
    // r1: counts 'a b'=3+4=7, 'a a'=3, 'b a'=2 -> merge 'a b'
    //     (abab has candidates at 0 and 2 — separate runs, both merge)
    // r2: counts 'ab ab'=2, 'a a'=3 -> merge 'a a'; "aaaa" candidates
    //     0,1,2 are ONE run -> keep even offsets 0,2 (greedy), not all
    // r3: counts 'ab ab'=2, 'aa aa'=1 -> merge 'ab ab'
    assert(run(words, 1) === Map(
      "ab" -> Seq("ab"), "abab" -> Seq("ab", "ab"), "aaaa" -> Seq("a", "a", "a", "a")))
    assert(run(words, 2) === Map(
      "ab" -> Seq("ab"), "abab" -> Seq("ab", "ab"), "aaaa" -> Seq("aa", "aa")))
    assert(run(words, 3) === Map(
      "ab" -> Seq("ab"), "abab" -> Seq("abab"), "aaaa" -> Seq("aa", "aa")))
  }

  test("count tie breaks to the lexicographically smaller pair") {
    // 'a b' and 'b c' both appear once; 'a b' must win round 1
    val got = run(Seq(("abc", 1L)), 1)
    assert(got === Map("abc" -> Seq("ab", "c")))
  }

  test("single-char and no-pair vocabularies survive unchanged") {
    assert(run(Seq(("a", 5L), ("b", 2L)), 3) ===
      Map("a" -> Seq("a"), "b" -> Seq("b")))
  }
}

class BigramPmiSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("collocated pair outranks frequent-but-independent pair") {
    // "new york" always adjacent (3x); "the cat" adjacent 3x but both
    // words also appear apart, diluting c(a)*c(b)
    val docs = Seq(
      "new york new york new york",
      "the cat the cat the cat the dog a cat"
    ).toDF("text")
    val got = Vocab.bigramPmi(docs, col("text"), k = 10, minCount = 3L)
      .select("w1", "w2", "pmi_score").as[(String, String, Long)].collect()
    val scores = got.map { case (a, b, s) => (a, b) -> s }.toMap
    assert(scores(("new", "york")) > scores(("the", "cat")))
  }

  test("hand-computed score: scale*c_pair DIV (c1*c2)") {
    val docs = Seq("a b a b a b").toDF("text")
    // c(a b)=3, c(b a)=2 (below minCount), c(a)=3, c(b)=3
    val got = Vocab.bigramPmi(docs, col("text"), k = 10, minCount = 3L)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got === Array(("a", "b", 3L, 3L, 3L, 100000000L * 3 / 9)))
  }

  test("sequential floor division matches the c1*c2 quotient exactly") {
    // the score divides by c1 then c2 (never forming c1*c2, which is
    // the first signed-64 overflow at scale); for positive ints
    // floor(floor(a/b)/c) == floor(a/(b*c)) — pin it on values where
    // the intermediate quotient is NOT exact
    val docs = Seq("a b a b a b a a a a b b").toDF("text")
    // c(a b)=4 (positions 1,3,5,10), c(a)=7, c(b)=5
    val got = Vocab.bigramPmi(docs, col("text"), k = 10, minCount = 3L)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .find(r => r._1 == "a" && r._2 == "b").get
    // 4e8/35 = 11428571.43 — the intermediate 4e8/7 is not exact either,
    // so this pins the floor-composition identity on a non-trivial case
    val expected = (BigInt(4) * BigInt(100000000L) / (BigInt(7) * BigInt(5))).toLong
    assert(got === (("a", "b", 4L, 7L, 5L, expected)))
  }

  test("minCount floors hapax pairs; single-token docs contribute nothing") {
    val docs = Seq("x y", "z", "").toDF("text")
    assert(Vocab.bigramPmi(docs, col("text"), k = 10, minCount = 2L).count() === 0)
  }

  test("plan: top-k is TakeOrderedAndProject, not a global sort") {
    val docs = Seq("a b c a b").toDF("text")
    val p = Vocab.bigramPmi(docs, col("text"), k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}

class BigramLmScoreSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def score(texts: Seq[String], scale: Long): Map[Long, (Long, Long)] =
    Vocab.bigramLmScore(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
      col("id"), col("text"), scale)
      .as[(Long, Long, Long)].collect()
      .map { case (d, n, s) => d -> (n, s) }.toMap

  test("hand-computed doc means over corpus conditionals") {
    // corpus: "a b a b" + "a c"; c(a)=3, c(b)=2, c(c)=1
    // pairs: (a,b)x2 doc0, (b,a)x1 doc0, (a,c)x1 doc1
    // contrib(a,b)=floor(2*100/3)=66  contrib(b,a)=floor(1*100/2)=50
    // contrib(a,c)=floor(1*100/3)=33
    // doc0: n=3, (2*66+50) DIV 3 = 60;  doc1: n=1, 33
    assert(score(Seq("a b a b", "a c"), 100L) ===
      Map(0L -> (3L, 60L), 1L -> (1L, 33L)))
  }

  test("repeated bigram weights the mean by occurrence count") {
    // one doc "x y x y x y": c(x)=3, pairs (x,y)x3 (b=200), (y,x)x2 (=100)
    // mean = (3*floor(3*300/3) + 2*floor(2*300/3)) DIV 5
    val exp = (3L * (3 * 300 / 3) + 2L * (2 * 300 / 3)) / 5L
    assert(score(Seq("x y x y x y"), 300L) === Map(0L -> (5L, exp)))
  }

  test("garbled doc scores below fluent doc under the corpus LM") {
    val fluent = Seq.fill(5)("the cat sat on the mat").mkString(" ")
    val garble = "mat the on cat sat mat the cat on sat"
    val got = score(Seq(fluent, fluent, garble), 100000L)
    assert(got(2L)._2 < got(0L)._2)
  }

  test("docs under two tokens are absent; empty input yields empty output") {
    assert(score(Seq("solo", ""), 100L) === Map.empty)
  }
}

class OovRateSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("hand-checked OOV: top-2 vocab, per-doc floors") {
    // corpus counts: the=4, cat=3, dog=2, xyzzy=1 -> vocab(2) = {the, cat}
    val df = Seq(
      (1L, "the cat the cat"),       // 4 tokens, all in vocab -> oov 0
      (2L, "the dog xyzzy"),         // 1 of 3 in vocab -> oov 666666
      (3L, "dog the cat"))           // 2 of 3 -> oov 333333
      .toDF("doc_id", "text")
    val got = Vocab.oovRates(df, col("doc_id"), col("text"), v = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) === ((4L, 4L, 0L)))
    assert(got(2L) === ((3L, 1L, 666666L)))
    assert(got(3L) === ((3L, 2L, 333333L)))
  }

  test("tie at the vocab cutoff breaks word-ascending (deterministic)") {
    // counts: aa=2, bb=2, cc=2 -> vocab(2) = {aa, bb} by word order
    val df = Seq((1L, "aa bb cc"), (2L, "aa bb cc")).toDF("doc_id", "text")
    val got = Vocab.oovRates(df, col("doc_id"), col("text"), v = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) === 2L && got(2L) === 2L) // cc is the one out
  }
}

class Log2HistSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("exact power-of-two boundaries land in the right buckets") {
    val df = Seq(1L, 1L, 2L, 3L, 4L, 7L, 8L, 1024L).toDF("v")
    val got = Profile.log2Hist(df, col("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === ((2L, 2L)))       // two 1s
    assert(got(2L) === ((2L, 5L)))       // 2, 3
    assert(got(4L) === ((2L, 11L)))      // 4, 7
    assert(got(8L) === ((1L, 8L)))       // 8 goes UP, not into [4,7]
    assert(got(1024L) === ((1L, 1024L)))
    assert(got.keySet === Set(1L, 2L, 4L, 8L, 1024L)) // no empty buckets
  }
}

/** Pins textRank (x138): weighted-PageRank arithmetic on hand graphs. */
class TextRankSpec extends graft.SparkSpec {
  import spark.implicits._

  test("textRank: path graph — hub outranks leaves, exact floor-scaled arithmetic") {
    val docs = Seq("alpha bravo charlie").toDF("text")
    val got = Vocab.textRank(docs, col("text"), window = 1, iters = 1,
      k = 10, minLen = 5)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // edges: alpha-bravo (1), bravo-charlie (1); tw: alpha 1, bravo 2,
    // charlie 1; N=3, r0 = 1/3. Reproduce the EXACT double chain:
    val r0 = 1.0 / 3.0
    def c(r: Double, tw: Long, w: Long) = math.floor(r / tw.toDouble * w.toDouble * 1.0e15)
    val inAlpha = c(r0, 2, 1)               // from bravo
    val inBravo = c(r0, 1, 1) + c(r0, 1, 1) // from alpha and charlie
    def blend(s: Double) = (1.0 - 0.85) / 3.0 + 0.85 * (s / 1.0e15)
    assert(got("alpha") === ((1L, blend(inAlpha))))
    assert(got("bravo") === ((2L, blend(inBravo))))
    assert(got("charlie") === got("alpha"))
    assert(got("bravo")._2 > got("alpha")._2) // the hub outranks the leaves
  }

  test("textRank: minLen filters short words; repeated word makes no self-loop") {
    // "of" drops (len<5); window spans the FILTERED sequence
    val docs = Seq("alpha of bravo", "gamma gamma").toDF("text")
    val words = Vocab.textRank(docs, col("text"), window = 1, iters = 1,
      k = 10, minLen = 5)
      .as[(String, Long, Double)].collect().map(_._1).toSet
    // gamma-gamma is a self-pair -> excluded; gamma has no other edge,
    // so it is not a node at all
    assert(words === Set("alpha", "bravo"))
  }
}

class FeatureHashSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("tokens land in poly_hash % buckets; totals and collisions per stratum") {
    val docs = Seq(("en", "a b a"), ("en", "b"), ("de", "a")).toDF("lang", "text")
    val got = Vocab.featureHashProfile(docs, col("text"), col("lang"), 16)
      .orderBy("stratum", "bucket")
      .as[(String, Int, Long, Long)].collect()
    val ha = (graft.functions.PolyHash.hash("a") % 16).toInt
    val hb = (graft.functions.PolyHash.hash("b") % 16).toInt
    assert(got.toSet === Set(
      ("de", ha, 1L, 1L), ("en", ha, 2L, 1L), ("en", hb, 2L, 1L)))
  }

  test("empty and whitespace-only docs contribute nothing") {
    val docs = Seq(("en", ""), ("en", "   "), ("en", "x")).toDF("lang", "text")
    val got = Vocab.featureHashProfile(docs, col("text"), col("lang"), 8)
      .agg(sum("n_tokens")).as[Long].head()
    assert(got === 1L)
  }
}

class VocabGrowthSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("vocabularyGrowth: first-bucket type charging and cumulative TTR, hand-checked") {
    // doc-id order: "a b" | "a c" || "d" | "a" with 2 buckets:
    // bucket 0: 2 docs, 4 tokens, new types {a,b,c} → ttr 750000
    // bucket 1: +2 docs, +2 tokens, new {d} → 4 types / 6 tokens
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "d"), (4L, "a"))
      .toDF("doc_id", "text")
    val got = Vocab.vocabularyGrowth(docs, col("doc_id"), col("text"),
        buckets = 2)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got === Array((0L, 2L, 4L, 3L, 750000L),
      (1L, 4L, 6L, 4L, 666666L)))
    // repartitioning must not move the curve (two-phase rank, not
    // partition order)
    val again = Vocab.vocabularyGrowth(docs.repartition(5), col("doc_id"),
        col("text"), buckets = 2)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(again === got)
    intercept[IllegalArgumentException] {
      Vocab.vocabularyGrowth(docs, col("doc_id"), col("text"), buckets = 1)
    }
  }
}
