package graft.ext

import org.apache.spark.sql.functions._

/** Pins [[Curation.curationFlags]]'s composition semantics: each flag
  * fires for its own reason, keep_flag is their conjunction, and the
  * canonical election keys on NORMALIZED content (formatting noise must
  * not defeat the dedup). Sampling uses rate 1.0 here so the fixture
  * stays hash-independent; the per-language rates ride the x58 oracle. */
class CurationSpec extends graft.SparkSpec {
  import spark.implicits._

  test("flags fire independently; conjunction drops for exactly the flagged reason") {
    val docs = Seq(
      // canonical English doc, decent quality
      (1L, "the cat of the hat and is here today now"),
      // same content under different formatting/case: dup of 1
      (2L, "  The  cat of THE hat\tand is here today  now "),
      // German doc (keep_lang via 'de' stopwords)
      (3L, "der hund und die katze ist der beste und die"),
      // bullet spam: every line a bullet -> quality gate drops it
      (4L, "- der item und\n- der item und\n- der item und"),
      // lorem-ipsum ban
      (5L, "the lorem ipsum of the and is filler text here")
    ).toDF("doc_id", "text")
    val got = Curation.curationFlags(docs, col("doc_id"), col("text"),
      keepLangs = Seq("en", "de"))
      .orderBy("doc_id")
      .as[(Long, String, Int, Int, Int, Int, Int)].collect()
    assert(got === Array(
      (1L, "en", 1, 1, 1, 1, 1),   // keeper
      (2L, "en", 0, 1, 1, 1, 0),   // normalized dup of 1: only is_canonical drops it
      (3L, "de", 1, 1, 1, 1, 1),   // German kept
      (4L, "de", 1, 1, 0, 1, 0),   // bullets: only the quality gate drops it
      (5L, "en", 1, 1, 0, 1, 0)))  // lorem ipsum: quality gate again
  }

  test("language outside keepLangs drops on keep_lang alone") {
    val docs = Seq(
      (7L, "el perro grande y la casa blanca es de la familia y el jardin"))
      .toDF("doc_id", "text")
    val got = Curation.curationFlags(docs, col("doc_id"), col("text"),
      keepLangs = Seq("en", "de"))
      .as[(Long, String, Int, Int, Int, Int, Int)].collect().head
    assert(got === ((7L, "es", 1, 0, 1, 1, 0)))
  }
}

class ParetoFrontierSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("crafted frontier: dominated dropped, tie-groups survive together") {
    val pts = Seq(
      (1L, 10L, 1L),  // frontier: longest
      (2L, 8L, 5L),   // frontier
      (3L, 8L, 5L),   // exact tie with 2 -> both survive
      (4L, 8L, 4L),   // dominated by 2 (same x, smaller y)
      (5L, 5L, 9L),   // frontier: most diverse
      (6L, 4L, 9L),   // dominated by 5 (smaller x, same y)
      (7L, 3L, 3L))   // dominated by everything above
      .toDF("doc_id", "mx", "my")
    val got = Curation.paretoFrontier(pts, col("doc_id"), col("mx"), col("my"))
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 5L))
  }

  test("sweep == naive dominance join on sf0.001 doc metrics") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = TextAnalysis.simpsonDiversity(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_tokens").as("x"), col("simpson_div").as("y"))
      .localCheckpoint(false)
    val naive = m.as("a").join(m.as("b"),
        col("b.x") >= col("a.x") && col("b.y") >= col("a.y") &&
          (col("b.x") > col("a.x") || col("b.y") > col("a.y")), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    val swept = Curation.paretoFrontier(m, col("doc_id"), col("x"), col("y"))
      .select("doc_id").as[Long].collect().toSet
    assert(swept === naive)
    assert(swept.nonEmpty)
  }
}
