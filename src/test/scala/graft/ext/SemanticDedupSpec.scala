package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Similarity.semanticDedupWithin]]'s contract — including the
  * DOCUMENTED recall limitation that makes semantic dedup cheaper than
  * all-pairs: vectors in different clusters are never compared. */
class SemanticDedupSpec extends graft.SparkSpec {
  import spark.implicits._

  private def embsOf(rows: (Long, Seq[Double])*) =
    Similarity.withNorm(rows.toDF("vec_id", "emb"), col("vec_id"), col("emb"))

  private def centsOf(rows: (Long, Seq[Double])*) =
    rows.toDF("cid", "cemb")
      .withColumn("cnorm", Similarity.l2Norm(col("cemb")))

  test("cross-cluster near-identicals are NOT paired; in-cluster dup keys to min id") {
    // v1/v2 are near-identical (cosine ~0.9998) but straddle the c10/c20
    // boundary — the split is the point of the fixture, and the pair MUST
    // be missed. v3/v4 share c30 and v4 must key to v3.
    val embs = embsOf(
      1L -> Seq(1.0, 0.0, 0.01),
      2L -> Seq(1.0, 0.0, -0.01),
      3L -> Seq(0.0, 1.0, 0.0),
      4L -> Seq(0.0, 1.0, 0.02))
    val cents = centsOf(
      10L -> Seq(1.0, 0.0, 0.5),
      20L -> Seq(1.0, 0.0, -0.5),
      30L -> Seq(0.0, 1.0, 0.0))
    val assign = Similarity.ivfAssign(embs, cents)
    // sanity: the fixture really does split the near-identical pair
    val byId = assign.as[(Long, Long)].collect().toMap
    assert(byId(1L) === 10L && byId(2L) === 20L && byId(3L) === 30L && byId(4L) === 30L)
    val got = Similarity.semanticDedupWithin(embs, assign, threshold = 0.95)
      .orderBy("vec_id")
      .select("vec_id", "dup_of", "keep_flag")
      .as[(Long, Option[Long], Int)].collect()
    assert(got === Array(
      (1L, None, 1),           // survivor
      (2L, None, 1),           // near-identical to 1 but cross-cluster: KEPT (limitation)
      (3L, None, 1),           // survivor (smallest id in its neighborhood)
      (4L, Some(3L), 0)))      // in-cluster dup of 3
  }

  test("greedy chain: a~b~c with a!~c removes both b and c (one representative)") {
    // 2-d vectors at 0deg / 25deg / 50deg: adjacent cosines ~0.906, the
    // far pair ~0.643 — threshold 0.9 links only neighbors. The greedy
    // per-pair rule (not connected components... which would be the same
    // keep-set here, but dup_of differs) keys c to b even though b is
    // itself removed.
    def at(deg: Double) = Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    val embs = embsOf(1L -> at(0), 2L -> at(25), 3L -> at(50))
    val assign = Seq((1L, 100L), (2L, 100L), (3L, 100L)).toDF("vec_id", "cid")
    val got = Similarity.semanticDedupWithin(embs, assign, threshold = 0.9)
      .orderBy("vec_id")
      .select("vec_id", "dup_of", "keep_flag")
      .as[(Long, Option[Long], Int)].collect()
    assert(got === Array((1L, None, 1), (2L, Some(1L), 0), (3L, Some(2L), 0)))
  }

  test("a zero vector never pairs: NaN cosine must not match the whole cluster") {
    // 0/0 cosine is NaN, and both engines order NaN above every real
    // number — without the isnan guard the zero vector (smallest id in
    // the cluster) would 'match' and remove every other member
    val embs = embsOf(
      1L -> Seq(0.0, 0.0),    // all-zero, smallest id
      2L -> Seq(1.0, 0.0),
      3L -> Seq(0.99, 0.141)) // ~0.99 cosine to 2
    val assign = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("vec_id", "cid")
    val got = Similarity.semanticDedupWithin(embs, assign, threshold = 0.9)
      .orderBy("vec_id")
      .select("vec_id", "dup_of", "keep_flag")
      .as[(Long, Option[Long], Int)].collect()
    assert(got === Array(
      (1L, None, 1),          // zero vector survives, pairs with nothing
      (2L, None, 1),          // NOT removed by the zero vector
      (3L, Some(2L), 0)))     // real near-dup still keys to 2
  }

  test("hot-cluster guard refuses a pathological DISTINCT-vector cluster loudly at plan build") {
    // 10k pairwise-distinct vectors all assigned to ONE cluster — the
    // Σ|c|² pairing would be 10^8 in-cluster pairs in a single task.
    // With maxCluster below that membership the operator must refuse at
    // plan build with a message that names the fix, not hang the task.
    // (Distinct on purpose: identical vectors pre-collapse since r16
    // and never count against the cap — next test.)
    val embs = Similarity.withNorm(
      spark.range(10000L).selectExpr("id AS vec_id",
        "array(cast(id as double), 1.0d) AS emb"),
      col("vec_id"), col("emb"))
    val assign = spark.range(10000L).selectExpr("id AS vec_id", "7L AS cid")
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticDedupWithin(embs, assign, threshold = 0.9, maxCluster = 1000L)
    }
    assert(e.getMessage.contains("10000 distinct members"))
    assert(e.getMessage.contains("stride"))
    // the named fix — more, smaller cells — takes the SAME corpus under
    // the same cap: 100-member clusters pass the guard and run
    val spread = spark.range(10000L).selectExpr("id AS vec_id", "id % 100 AS cid")
    assert(Similarity.semanticDedupWithin(embs, spread, threshold = 0.9999,
      maxCluster = 1000L).count() === 10000L)
  }

  test("identical-vector flood pre-collapses: 10k copies ride UNDER any cap, verdicts exact (the r16 skew find)") {
    // 10k byte-identical vectors + one distinct smaller-id neighbor in
    // the same cluster. The old form paid 10^8 in-cluster pairs under
    // its 100k cap (the skew receipt's detonation); the collapsed form
    // pairs ONE representative and expands the family verdict back.
    val embs = Similarity.withNorm(
      spark.range(10001L).selectExpr("id + 10 AS vec_id",
        "CASE WHEN id = 0 THEN array(1.0d, 0.0d) ELSE array(0.8d, 0.6d) END AS emb"),
      col("vec_id"), col("emb"))
    val assign = spark.range(10001L).selectExpr("id + 10 AS vec_id", "7L AS cid")
    // maxCluster = 3: only 2 distinct vectors exist, so the guard passes
    val got = Similarity.semanticDedupWithin(embs, assign,
        threshold = 0.9, maxCluster = 3L)
      .select("vec_id", "dup_of", "keep_flag")
      .as[(Long, Option[Long], Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size === 10001)
    // vec 10 (the distinct one, cos 0.8 to the family) survives;
    // family rep 11 survives (0.8 < 0.9 to vec 10, no smaller dup);
    // every other family member dups onto the rep
    assert(got(10L) === ((None, 1)))
    assert(got(11L) === ((None, 1)))
    assert((12L to 10010L).forall(i => got(i) == ((Some(11L), 0))))
  }

  test("multi-probe catches the boundary-straddling pair single-probe misses") {
    // EXACTLY the first test's fixture: v1/v2 straddle the c10/c20
    // boundary and single-probe must miss them. Sitting near the
    // midline, both rank c10 and c20 as their top-2 cells, so the
    // multi-probe path compares them in BOTH shared cells and v2 keys
    // to v1. v3/v4 still behave as before (shared primary c30).
    val embs = embsOf(
      1L -> Seq(1.0, 0.0, 0.01),
      2L -> Seq(1.0, 0.0, -0.01),
      3L -> Seq(0.0, 1.0, 0.0),
      4L -> Seq(0.0, 1.0, 0.02))
    val cents = centsOf(
      10L -> Seq(1.0, 0.0, 0.5),
      20L -> Seq(1.0, 0.0, -0.5),
      30L -> Seq(0.0, 1.0, 0.0))
    val got = Similarity.semanticDedupAcross(embs, cents, threshold = 0.95)
      .orderBy("vec_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)].collect()
    assert(got === Array(
      (1L, Some(10L), Some(20L), None, 1),     // survivor; probes both boundary cells
      (2L, Some(20L), Some(10L), Some(1L), 0), // the pair x57 documents as MISSED
      (3L, Some(30L), Some(10L), None, 1),     // v3's ties at csim 0 break to cid 10
      (4L, Some(30L), Some(10L), Some(3L), 0)))
  }

  test("multi-probe: slot-1 assignment is exactly ivfAssign; cells match the window ranking") {
    val embs = embsOf((0L until 60L).map(i =>
      i -> Seq(math.cos(i * 0.1), math.sin(i * 0.1), (i % 7).toDouble / 7.0)): _*)
    val cents = Similarity.kmeansLite(embs, Similarity.seedCentroids(embs, 10), 1)
    val top2 = Similarity.ivfAssignTop2(embs, cents)
    val single = Similarity.ivfAssign(embs, cents).as[(Long, Long)].collect().toMap
    val cells = top2.select(col("vec_id"), col("cells"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(cells.keySet === single.keySet)
    cells.foreach { case (v, cs) => assert(cs.head === single(v), s"vec $v") }
    // independent reference: the row_number window over the same rounded
    // similarity stream (the shape the aggregator exists to avoid)
    val sims = embs.crossJoin(broadcast(
        cents.select(col("cid"), col("cemb"), col("cnorm"))))
      .withColumn("csim", round(Similarity.dot(col("emb"), col("cemb")) /
        (col("norm") * col("cnorm")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
    val ref = sims.withColumn("pr", row_number().over(w)).where(col("pr") <= 2)
      .groupBy("vec_id")
      .agg(sort_array(collect_list(struct(col("pr"), col("cid")))).as("s"))
      .select(col("vec_id"), expr("transform(s, x -> x.cid)").as("cells"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(cells === ref)
  }

  test("multi-probe: a zero vector gets no cells, pairs with nothing, survives") {
    val embs = embsOf(
      1L -> Seq(0.0, 0.0),    // all-zero: NaN csim to every centroid
      2L -> Seq(1.0, 0.0),
      3L -> Seq(0.99, 0.141))
    val cents = centsOf(5L -> Seq(1.0, 0.1))
    val got = Similarity.semanticDedupAcross(embs, cents, threshold = 0.9)
      .orderBy("vec_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)].collect()
    assert(got === Array(
      (1L, None, None, None, 1),            // unassigned keeper, poisons nothing
      (2L, Some(5L), None, None, 1),        // one centroid -> no runner-up cell
      (3L, Some(5L), None, Some(2L), 0)))
  }

  test("multi-probe hot-cell guard refuses over the DOUBLED membership (distinct vectors — identical ones collapse)") {
    // one centroid: every vector's single cell is 7 -> membership 10k,
    // pairwise-distinct so the r16 collapse cannot fold them
    val embs = Similarity.withNorm(
      spark.range(10000L).selectExpr("id AS vec_id",
        "array(cast(id as double), 1.0d) AS emb"),
      col("vec_id"), col("emb"))
    val cents = centsOf(7L -> Seq(1.0, 0.5))
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticDedupAcross(embs, cents, threshold = 0.9, maxCluster = 1000L)
    }
    assert(e.getMessage.contains("10000 distinct members"))
    assert(e.getMessage.contains("stride"))
    // the identical-vector flood, by contrast, folds to one rep per
    // cell and runs under ANY cap — multi-probe twin of the x57 pin
    val flood = Similarity.withNorm(
      spark.range(5000L).selectExpr("id AS vec_id",
        "array(0.8d, 0.6d) AS emb"),
      col("vec_id"), col("emb"))
    val got = Similarity.semanticDedupAcross(flood, cents,
        threshold = 0.9, maxCluster = 3L)
      .select("vec_id", "dup_of", "keep_flag")
      .as[(Long, Option[Long], Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size === 5000)
    assert(got(0L) === ((None, 1)))
    assert((1L to 4999L).forall(i => got(i) == ((Some(0L), 0))))
  }

  test("full composition runs end-to-end and keeps exactly one row per input vector") {
    val embs = embsOf((0L until 60L).map(i =>
      i -> Seq(math.cos(i * 0.1), math.sin(i * 0.1), (i % 7).toDouble / 7.0)): _*)
    val got = Similarity.semanticDedup(embs, threshold = 0.95, stride = 10, iters = 1)
    assert(got.count() === 60L)
    assert(got.select("vec_id").distinct().count() === 60L)
    // keep_flag is exactly dup_of's null-ness
    assert(got.where(col("keep_flag") === 1 && col("dup_of").isNotNull).count() === 0L)
    assert(got.where(col("keep_flag") === 0 && col("dup_of").isNull).count() === 0L)
  }

  test("annMrr: aggregates agree with an independent recompute from the two audited plans") {
    val embs = Similarity.withNorm(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      col("vec_id"), col("embedding"))
    val qids = (0L until 10L).toSeq
    val truth = Similarity.knnBrute(embs, embs.where(col("vec_id") < 10), 1)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toMap
    val rankOf = Similarity.knnLsh(embs, qids, 5)
      .select("qid", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
      .map { case (q, n, r) => (q, n) -> r }.toMap
    val rrs = truth.toSeq.map { case (q, t) =>
      rankOf.get((q, t)).map(r => 1000000L / r).getOrElse(0L) }
    val h1 = truth.count { case (q, t) => rankOf.get((q, t)).contains(1) }
    val hk = truth.count { case (q, t) => rankOf.contains((q, t)) }
    val got = Similarity.annMrr(embs, qids, 5)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === ((10L, h1.toLong, hk.toLong, rrs.sum, rrs.sum / 10)))
    assert(got._3 >= got._2) // hit@k contains hit@1 by construction
  }

  test("annMap: hand-checked AP with per-term floors and the min(R, k) denominator") {
    // query 0 (label A) against: 1=A sim 1.0, 4=A sim 0.8, 3=B sim 0.6,
    // 2=B sim 0.0 → top-3 ranking [1, 4, 3], rel = [1, 1, 0],
    // apsum = 1e6/1 + 2e6/2 = 2e6; label A has 3 members →
    // denominator min(3−1, 3) = 2 → ap = 1e6
    val embs = embsOf(0L -> Seq(1.0, 0.0), 1L -> Seq(1.0, 0.0),
      2L -> Seq(0.0, 1.0), 3L -> Seq(0.6, 0.8), 4L -> Seq(0.8, 0.6))
    val labels = Seq((0L, "A"), (1L, "A"), (2L, "B"), (3L, "B"),
      (4L, "A")).toDF("vec_id", "label")
    val got = Similarity.annMap(embs, labels, Seq(0L), k = 3)
      .as[(Long, String, Long, Long)].head()
    assert(got === ((0L, "A", 2L, 1000000L)))
    // a query whose label has no other member: denominator 0 → NULL
    val lone = Seq((0L, "Z"), (1L, "A"), (2L, "B"), (3L, "B"),
      (4L, "A")).toDF("vec_id", "label")
    val g2 = Similarity.annMap(embs, lone, Seq(0L), k = 3).collect().head
    assert(g2.getLong(2) === 0L && g2.isNullAt(3))
  }

  test("truncationAgreement: a vector orthogonal only in the tail invades the truncated top-k") {
    // q0 = (3,4,0,0): full top-2 = [1 (sim 1.0), 2 (0.96)]; truncated
    // to 2 dims, 3 = (3,4,5,0) renormalizes to sim 1.0 and displaces 2
    // → truncated top-2 = [1, 3] (tie → smaller id) → overlap 1/2
    val raw = Seq(
      (0L, Seq(3.0, 4.0, 0.0, 0.0)), (1L, Seq(3.0, 4.0, 0.0, 0.0)),
      (2L, Seq(4.0, 3.0, 0.0, 0.0)), (3L, Seq(3.0, 4.0, 5.0, 0.0)),
      (4L, Seq(5.0, 0.0, 0.0, 0.0))).toDF("vec_id", "emb")
    val got = Similarity.truncationAgreement(raw, col("vec_id"),
        col("emb"), Seq(0L), k = 2, dims = 2)
      .as[(Long, Long, Long)].head()
    assert(got === ((0L, 1L, 500000L)))
    // truncating to the full width is the identity: overlap = k
    val id4 = Similarity.truncationAgreement(raw, col("vec_id"),
        col("emb"), Seq(0L), k = 2, dims = 4)
      .as[(Long, Long, Long)].head()
    assert(id4 === ((0L, 2L, 1000000L)))
  }
}
