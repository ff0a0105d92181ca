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
