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
