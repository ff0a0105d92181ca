package graft.ext

import org.apache.spark.sql.functions._

/** Pins [[Sampling.tokenBudgetMix]]'s rate arithmetic: integer-exact
  * targets, the keep-everything cap for under-represented sources, and
  * the tok=0 guard (an all-empty source keeps nothing instead of
  * tripping ANSI division by zero). */
class TokenMixSpec extends graft.SparkSpec {
  import spark.implicits._

  test("rates: cap at 10000, exact integer division, empty source rate 0") {
    val docs = Seq(
      (1L, "A", "w w w w w w w w w w"),        // 10 tokens
      (2L, "A", "w w w w w w w w w w"),        // A: tok=20
      (3L, "B", Seq.fill(100)("w").mkString(" ")), // B: tok=100
      (4L, "C", "")                            // C: tok=0
    ).toDF("doc_id", "source", "text")
    // budget 100: A target 50 > 20 -> capped 10000; B target 25 ->
    // 25*10000 DIV 100 = 2500; C -> 0
    val got = Sampling.tokenBudgetMix(docs, col("doc_id"), col("source"),
      col("text"), budgetTokens = 100L,
      weights10k = Map("A" -> 5000L, "B" -> 2500L), defaultWeight10k = 2500L)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Int)].collect()
    val rates = got.map(r => r._2 -> r._4).toMap
    assert(rates === Map("A" -> 10000L, "B" -> 2500L, "C" -> 0L))
    // a capped source keeps every doc regardless of hash; an empty
    // source keeps none
    assert(got.filter(_._2 == "A").forall(_._5 == 1))
    assert(got.filter(_._2 == "C").forall(_._5 == 0))
    // keep decision is the documented hash predicate, not a coin flip
    got.foreach { case (id, _, _, rate, keep) =>
      val bucket = spark.range(1).select(
        Sampling.hashBucket(lit(id))).as[Long].head()
      assert((bucket < rate) === (keep == 1))
    }
  }
}

class CurriculumInterleaveSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("every prefix of the interleave tracks the source mix within 1 per source") {
    // 80 docs of 'big', 20 of 'small' -> in any prefix of length L the
    // count of 'small' docs must be within ±1 of L/5 (proportional
    // round-robin property of the scaled-rank key)
    val docs = ((1L to 80L).map(i => (i, "big")) ++ (81L to 100L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val ordered = Sampling.curriculumInterleave(docs, col("doc_id"), col("source"))
      .orderBy("ikey", "source", "rn_src")
      .select("source").as[String].collect()
    assert(ordered.length === 100)
    var nSmall = 0
    ordered.zipWithIndex.foreach { case (s, i) =>
      if (s == "small") nSmall += 1
      val expected = (i + 1) / 5.0
      assert(math.abs(nSmall - expected) <= 1.0,
        s"prefix ${i + 1}: small=$nSmall expected~$expected")
    }
  }

  test("deterministic across runs and orders: same ikey per doc") {
    val docs = (1L to 50L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    val k1 = Sampling.curriculumInterleave(docs, col("doc_id"), col("source"))
      .select("doc_id", "ikey").as[(Long, Long)].collect().toMap
    val k2 = Sampling.curriculumInterleave(docs.orderBy(col("doc_id").desc),
      col("doc_id"), col("source"))
      .select("doc_id", "ikey").as[(Long, Long)].collect().toMap
    assert(k1 === k2)
  }
}

class QuantileNormalizeSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("one threshold means the same fraction in every stratum") {
    // verbose source: scores 1000..1009; terse source: scores 1..10.
    // A raw threshold picks all of 'verbose'; q_e6 > 500000 picks the
    // top half of EACH.
    val docs = ((1L to 10L).map(i => (i, "verbose", 999L + i)) ++
      (11L to 20L).map(i => (i, "terse", i - 10L)))
      .toDF("doc_id", "source", "score")
    val got = Sampling.quantileNormalize(docs, col("doc_id"), col("source"),
      col("score"))
    val kept = got.where(col("q_e6") > 500000)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(kept === Map("verbose" -> 5L, "terse" -> 5L))
    // floors: rank 1 of 10 -> 100000; rank 10 of 10 -> 1000000
    val terse = got.where(col("stratum") === "terse")
      .select("score", "q_e6").as[(Long, Long)].collect().toMap
    assert(terse(1L) === 100000L && terse(10L) === 1000000L)
  }

  test("score ties break by doc_id: total, rerun-stable ranks") {
    val docs = Seq((5L, "s", 7L), (3L, "s", 7L), (9L, "s", 7L))
      .toDF("doc_id", "source", "score")
    val got = Sampling.quantileNormalize(docs, col("doc_id"), col("source"),
      col("score")).select("doc_id", "q_e6").as[(Long, Long)].collect().toMap
    assert(got === Map(3L -> 333333L, 5L -> 666666L, 9L -> 1000000L))
  }
}
