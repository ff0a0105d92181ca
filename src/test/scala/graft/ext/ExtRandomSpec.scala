package graft.ext

import org.apache.spark.sql.functions._

/** Randomized reference checks for the round-7 operators: seeded random
  * fixtures, a straight-line Scala reference implementation, exact
  * comparison. Catches the classes of defect a handcrafted fixture
  * misses (accidental position collisions, tie patterns, cluster
  * shapes). */
class SubstringDedupRandomSpec extends graft.SparkSpec {
  import spark.implicits._

  test("random small-vocab docs: spans match the straight-line reference exactly") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (round <- 1 to 3) {
      val docs = (0L until 20L).map { id =>
        val n = 5 + rnd.nextInt(8) // always >= 5 words: the 5-gram path
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // reference: positioned 5-grams, first occurrence by (doc, pos),
      // later occurrences marked, consecutive marks merged into spans
      val occ = docs.flatMap { case (id, text) =>
        val w = text.trim.split("\\s+")
        w.sliding(5).zipWithIndex.map { case (sh, pos) =>
          (id, pos.toLong, sh.mkString(" "))
        }
      }
      val firsts = occ.groupBy(_._3).map { case (sh, os) => sh -> os.minBy(o => (o._1, o._2)) }
      val counts = occ.groupBy(_._3).map { case (sh, os) => sh -> os.size }
      val marked = occ.filter(o => counts(o._3) >= 2 && firsts(o._3) != o)
        .map(o => (o._1, o._2)).sorted
      val expected = marked.groupBy(_._1).toSeq.flatMap { case (id, ps) =>
        val runs = ps.map(_._2).sorted.foldLeft(List.empty[List[Long]]) {
          case (acc @ (run :: rest), p) if run.head == p - 1 => (p :: run) :: rest
          case (acc, p) => List(p) :: acc
        }
        runs.map(r => (id, r.min, r.max + 4L, r.size.toLong))
      }.sorted
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), n = 5)
        .orderBy("doc_id", "span_start")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got === expected, s"round $round")
    }
  }
}

class SemanticDedupRandomSpec extends graft.SparkSpec {
  import spark.implicits._

  test("random vectors + assignments: keep/dup_of match the brute reference") {
    val rnd = new scala.util.Random(23)
    for (round <- 1 to 3) {
      val vecs = (0L until 40L).map { id =>
        id -> Seq.fill(4)(rnd.nextDouble() * 2 - 1)
      }
      val cid = vecs.map { case (id, _) => id -> (rnd.nextInt(5) + 100L) }.toMap
      val threshold = 0.8
      // reference: same-cluster pairs a<b, 6-dp-rounded cosine >= t
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val r = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
        BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val expected = vecs.map { case (id, v) =>
        val dupOf = vecs.collect {
          case (a, va) if a < id && cid(a) == cid(id) && cos(va, v) >= threshold => a
        }.sorted.headOption
        (id, cid(id), dupOf, if (dupOf.isEmpty) 1 else 0)
      }.sorted
      val embs = Similarity.withNorm(vecs.toDF("vec_id", "emb"), col("vec_id"), col("emb"))
      val assign = cid.toSeq.toDF("vec_id", "cid")
      val got = Similarity.semanticDedupWithin(embs, assign, threshold)
        .orderBy("vec_id")
        .as[(Long, Long, Option[Long], Int)].collect().toSeq
      assert(got === expected, s"round $round")
    }
  }
}

class SemanticDedupMpRandomSpec extends graft.SparkSpec {
  import spark.implicits._

  test("random vectors + centroids: multi-probe cells/dup_of match the brute reference") {
    val rnd = new scala.util.Random(47)
    for (round <- 1 to 3) {
      val vecs = (0L until 40L).map { id =>
        id -> Seq.fill(4)(rnd.nextDouble() * 2 - 1)
      }
      val cents = (0L until 6L).map { c =>
        (c + 200L) -> Seq.fill(4)(rnd.nextDouble() * 2 - 1)
      }
      val threshold = 0.8
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val r = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
        BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      // reference: top-2 cells under (csim DESC, cid ASC); a pair is
      // compared iff it shares EITHER cell; greedy keep-min
      val cells = vecs.map { case (id, v) =>
        id -> cents.map { case (c, cv) => (c, cos(v, cv)) }
          .sortBy { case (c, s) => (-s, c) }.take(2).map(_._1)
      }.toMap
      val expected = vecs.map { case (id, v) =>
        val dupOf = vecs.collect {
          case (a, va) if a < id && cells(a).exists(cells(id).contains) &&
            cos(va, v) >= threshold => a
        }.sorted.headOption
        (id, cells(id).headOption, cells(id).lift(1), dupOf,
          if (dupOf.isEmpty) 1 else 0)
      }.sortBy(_._1)
      val embs = Similarity.withNorm(vecs.toDF("vec_id", "emb"),
        col("vec_id"), col("emb"))
      val centsDf = cents.toDF("cid", "cemb")
        .withColumn("cnorm", Similarity.l2Norm(col("cemb")))
      val got = Similarity.semanticDedupAcross(embs, centsDf, threshold)
        .orderBy("vec_id")
        .as[(Long, Option[Long], Option[Long], Option[Long], Int)].collect().toSeq
      assert(got === expected, s"round $round")
    }
  }
}

class TokenMixRandomSpec extends graft.SparkSpec {
  import spark.implicits._

  test("random sources/weights: rates match the integer reference, flags match the rate") {
    val rnd = new scala.util.Random(31)
    for (round <- 1 to 3) {
      val sources = Vector("sa", "sb", "sc", "sd")
      val docs = (0L until 60L).map { id =>
        (id, sources(rnd.nextInt(4)),
          Seq.fill(1 + rnd.nextInt(20))("w").mkString(" "))
      }
      val budget = 100L + rnd.nextInt(400)
      val w = sources.map(_ -> (100L + rnd.nextInt(5000))).toMap
      val tok = docs.groupBy(_._2).map { case (s, ds) =>
        s -> ds.map(_._3.split(" ").length.toLong).sum
      }
      val expectedRate = tok.map { case (s, t) =>
        s -> (if (t == 0) 0L else math.min(10000L, budget * w(s) / 10000L * 10000L / t))
      }
      val got = Sampling.tokenBudgetMix(docs.toDF("doc_id", "source", "text"),
        col("doc_id"), col("source"), col("text"),
        budgetTokens = budget, weights10k = w, defaultWeight10k = 1L)
        .orderBy("doc_id")
        .as[(Long, String, Long, Long, Int)].collect()
      assert(got.map(r => r._2 -> r._4).toMap === expectedRate, s"round $round rates")
      // flags are exactly the documented hash predicate
      val buckets = docs.map(_._1).toDF("id")
        .select(col("id"), Sampling.hashBucket(col("id")).as("b"))
        .as[(Long, Long)].collect().toMap
      got.foreach { case (id, _, _, rate, keep) =>
        assert((buckets(id) < rate) === (keep == 1), s"round $round doc $id")
      }
    }
  }
}
