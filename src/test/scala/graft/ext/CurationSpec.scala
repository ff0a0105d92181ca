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

class MerkleSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val docs = Seq(
    ("a", 1L, "hello"), ("a", 2L, "world"), ("a", 1030L, "far"),
    ("b", 1L, "hello"))
    .toDF("s", "id", "text")

  test("same content, same root; any doc change moves the root") {
    val r1 = Curation.merkleFingerprint(docs, col("s"), col("id"),
      col("text"), 1024L).orderBy("stratum")
      .as[(String, Long, Long, String)].collect()
    assert(r1.map(r => (r._1, r._2, r._3)) === Array(("a", 3L, 2L), ("b", 1L, 1L)))
    val r2 = Curation.merkleFingerprint(docs.repartition(7), col("s"),
      col("id"), col("text"), 1024L).orderBy("stratum")
      .as[(String, Long, Long, String)].collect()
    assert(r1 === r2) // partitioning-independent
    val mutated = docs.withColumn("text",
      when(col("id") === 2L && col("s") === "a", lit("WORLD")).otherwise(col("text")))
    val r3 = Curation.merkleFingerprint(mutated, col("s"), col("id"),
      col("text"), 1024L).orderBy("stratum")
      .as[(String, Long, Long, String)].collect()
    assert(r3(0)._4 !== r1(0)._4) // a's root moved
    assert(r3(1)._4 === r1(1)._4) // b untouched
  }

  test("block isolation: a change in block 1 keeps block 0's hash") {
    val base = Curation.merkleFingerprint(docs.where(col("s") === "a"),
      col("s"), col("id"), col("text"), 1024L)
    // recompute block table directly to compare block hashes
    val blocks = (d: org.apache.spark.sql.DataFrame) =>
      d.select(col("s"), col("id"), expr("id DIV 1024L").as("blk"), md5(col("text")).as("h"))
        .groupBy("s", "blk")
        .agg(md5(concat_ws("", transform(
          array_sort(collect_list(struct(col("id"), col("h")))),
          x => x.getField("h")))).as("bh"))
    val b1 = blocks(docs.where(col("s") === "a"))
      .orderBy("blk").as[(String, Long, String)].collect()
    val mutated = docs.where(col("s") === "a").withColumn("text",
      when(col("id") === 1030L, lit("FAR")).otherwise(col("text")))
    val b2 = blocks(mutated).orderBy("blk").as[(String, Long, String)].collect()
    assert(b1(0)._3 === b2(0)._3) // block 0 stable
    assert(b1(1)._3 !== b2(1)._3) // block 1 moved
  }
}

class MerkleDiffSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("diff localizes changes, drops identical blocks, flags one-sided blocks") {
    val a = Seq(("s", 1L, "x"), ("s", 2L, "y"), ("s", 70L, "z"), ("s", 140L, "w"))
      .toDF("src", "id", "text")
    // block 0 changed (doc 2 edited), block 1 identical, block 2 dropped,
    // block 3 added
    val b = Seq(("s", 1L, "x"), ("s", 2L, "Y"), ("s", 70L, "z"), ("s", 200L, "n"))
      .toDF("src", "id", "text")
    val got = Curation.merkleDiff(a, b, col("src"), col("id"), col("text"),
        blockSize = 64L)
      .orderBy("blk").as[(String, Long, String, Long, Long)].collect()
    assert(got === Array(
      ("s", 0L, "changed", 2L, 2L),
      ("s", 2L, "only_a", 1L, 0L),
      ("s", 3L, "only_b", 0L, 1L)))
  }

}

/** Contract audit (x183): violation accounting with NULL-fails-closed
  * semantics and the surplus-rows uniqueness count. */
class ContractAuditSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("contractAudit: exact violation counts, NULL fails closed, pass flags") {
    val rows = Seq[(java.lang.Long, java.lang.Long, java.lang.Double, String)](
      (1L, 1L, 10.0, "A"),   // clean
      (1L, 2L, -5.0, "N"),   // negative value
      (2L, 1L, null, "R"),   // NULL value -> fails the range check
      (3L, 1L, 999.0, "X"),  // out of domain
      (3L, 1L, 20.0, "A"))   // duplicate (3,1) key
      .toDF("k1", "k2", "v", "flag")
    val got = Curation.contractAudit(rows,
        Seq("v_positive" -> (col("v") > 0),
          "flag_domain" -> col("flag").isin("A", "N", "R")),
        "pk_unique", Seq(col("k1"), col("k2")))
      .orderBy("check_name")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got === Array(
      ("flag_domain", 5L, 1L, 200000L, 0L),
      ("pk_unique", 5L, 1L, 200000L, 0L),   // 4 keys, 5 rows -> 1 surplus
      ("v_positive", 5L, 2L, 400000L, 0L))) // -5 AND the NULL
  }

  test("contractAudit: a clean table passes every check with zero ppm") {
    val rows = Seq((1L, 1L, 1.0, "A"), (2L, 1L, 2.0, "N"))
      .toDF("k1", "k2", "v", "flag")
    val got = Curation.contractAudit(rows,
        Seq("v_positive" -> (col("v") > 0)),
        "pk_unique", Seq(col("k1"), col("k2")))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.forall(r => r._3 === 0L && r._4 === 0L && r._5 === 1L))
  }
}
