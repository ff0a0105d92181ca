package graft.ext

import org.apache.spark.sql.functions._

/** Pins the round-9 operators: PageRank (ext/Graph), deterministic HLL
  * (ext/Sketches), boilerplate coverage (Dedup.boilerplateCoverage) and
  * BM25 (Relevance.bm25TopK). */
class GraphSketchSpec extends graft.SparkSpec {
  import spark.implicits._

  // ---- Graph.pageRank ----

  test("pageRank path graph: hand-computed first iteration, symmetry, unit mass") {
    // 1 - 2 - 3 (undirected): deg = (1, 2, 1), N = 3, r0 = 1/3.
    // After one iteration: r(1) = r(3) = 0.05 + 0.85·(1/3)/2,
    // r(2) = 0.05 + 0.85·(1/3 + 1/3).
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val r1 = Graph.pageRank(e, iters = 1).orderBy("doc_id")
      .as[(Long, Long, Double)].collect()
    assert(r1.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(r1.map(_._2).toSeq === Seq(1L, 2L, 1L))
    assert(math.abs(r1(0)._3 - (0.05 + 0.85 * (1.0 / 3.0 / 2.0))) < 1e-12)
    assert(math.abs(r1(1)._3 - (0.05 + 0.85 * (2.0 / 3.0))) < 1e-12)
    assert(r1(0)._3 === r1(2)._3) // symmetric leaves stay equal
    // three iterations: center keeps the most mass, total mass stays 1
    val r3 = Graph.pageRank(e, iters = 3).as[(Long, Long, Double)].collect()
    assert(r3.find(_._1 == 2L).get._3 > r3.find(_._1 == 1L).get._3)
    assert(math.abs(r3.map(_._3).sum - 1.0) < 1e-9)
  }

  test("personalizedPageRank: hand-computed e12 walk, seed keeps restart mass, exact conservation") {
    // 1 - 2 - 3 path (undirected), seed = {1}: p = (1e12, 0, 0).
    // iter 1: inbound(2) = 1e12 DIV 1; r = (15p + 85s) DIV 100
    //   → (150000000000, 850000000000, 0)
    // iter 2: inbound(1) = inbound(3) = 850e9 DIV 2; inbound(2) = 150e9
    //   → (511250000000, 127500000000, 361250000000) — sums to 1e12 exactly
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val r1 = Graph.personalizedPageRank(e, c => c === 1L, iters = 1)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(r1.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(r1.map(_._2).toSeq === Seq(1L, 2L, 1L))
    assert(r1.map(_._3).toSeq ===
      Seq(150000000000L, 850000000000L, 0L))
    val r2 = Graph.personalizedPageRank(e, c => c === 1L, iters = 2)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(r2.map(_._3).toSeq ===
      Seq(511250000000L, 127500000000L, 361250000000L))
    assert(r2.map(_._3).sum === 1000000000000L) // exact divisions: zero dust
    // two symmetric seeds split the restart mass equally and stay equal
    val r2s = Graph.personalizedPageRank(e, c => c === 1L || c === 3L, iters = 2)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(r2s(0)._3 === r2s(2)._3)
    assert(r2s(1)._3 < 1000000000000L)
  }

  test("coShingleEdges: co-occurrence pairs only, stop-gram df cap excludes hot shingles") {
    val docs = Seq(
      (1L, "the common shingle here plus alpha beta gamma"),
      (2L, "the common shingle here plus delta epsilon zeta"),
      (3L, "the common shingle here plus eta theta iota"),
      (4L, "rare pair content words only one"),
      (5L, "rare pair content other tail words")).toDF("doc_id", "text")
    // cap 2: every shingle of the 1/2/3 triple ("the common shingle",
    // "common shingle here", "shingle here plus") has df = 3 > 2 and is
    // dropped; docs 4/5 share "rare pair content" (df = 2) and survive.
    val capped = Graph.coShingleEdges(docs, col("doc_id"), col("text"), n = 3,
      maxShingleDf = 2L).as[(Long, Long)].collect().toSet
    assert(capped === Set((4L, 5L), (5L, 4L)))
    // cap lifted: the triple's pairs come back, symmetric
    val full = Graph.coShingleEdges(docs, col("doc_id"), col("text"), n = 3,
      maxShingleDf = 64L).as[(Long, Long)].collect().toSet
    assert(full === Set((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L),
      (3L, 2L), (4L, 5L), (5L, 4L)))
  }

  test("triangleStats: hand-computed counts, pendant scores 0, shared-edge triangles both counted") {
    def sym(pairs: (Long, Long)*) =
      (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    // triangle 1-2-3 with pendant 3-4
    val g1 = Graph.triangleStats(sym((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(g1(0) === ((1L, 2L, 1L, 1.0)))
    assert(g1(1) === ((2L, 2L, 1L, 1.0)))
    assert(g1(2) === ((3L, 3L, 1L, 1.0 / 3.0)))
    assert(g1(3) === ((4L, 1L, 0L, 0.0)))    // deg<2: defined 0, no div-by-zero
    // two triangles sharing edge 2-3
    val g2 = Graph.triangleStats(
      sym((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(g2.map(r => r._1 -> r._3).toMap ===
      Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    assert(g2.find(_._1 == 2L).get._4 === 2.0 * 2.0 / (3.0 * 2.0))
  }

  test("triangleStats: hub flood refuses loudly at plan build, not at execute") {
    def sym(pairs: (Long, Long)*) =
      (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    // a star: node 0 touches everyone — wedge volume is deg² from the
    // hub alone, the Σdeg² failure mode the guard exists for
    val star = sym((1L to 50L).map(i => (0L, i)): _*)
    val e = intercept[IllegalArgumentException] {
      Graph.triangleStats(star, maxDegree = 49L)
    }
    assert(e.getMessage.contains("maxDegree"))
    assert(e.getMessage.contains("50"))     // reports the measured degree
    // at the cap: runs; a star has no triangles
    val ok = Graph.triangleStats(star, maxDegree = 50L)
      .as[(Long, Long, Long, Double)].collect()
    assert(ok.forall(_._3 == 0L))
    assert(ok.find(_._1 == 0L).get._2 === 50L)
  }

  // ---- Sketches.hllDistinct ----

  test("hllDistinct: exact baseline right, duplicate-insensitive, sane error") {
    val els = (0 until 600).map(i => ("k", s"element_$i")).toDF("key", "el")
    val one = Sketches.hllDistinct(els, col("key"), col("el"))
      .as[(String, Long, Double, Double)].collect().head
    assert(one._2 === 600L)
    assert(one._4 < 0.5, s"raw HLL-64 estimate off by ${one._4} — hash suspect")
    // HLL registers are max() folds: feeding every element 3x must not
    // move the estimate by even an ulp
    val tripled = els.unionAll(els).unionAll(els)
    val three = Sketches.hllDistinct(tripled, col("key"), col("el"))
      .as[(String, Long, Double, Double)].collect().head
    assert(three._3 === one._3)
  }

  // ---- Sketches.cmsCounters / cmsTopK ----

  test("cmsTopK: estimate never undercounts, exact order preserved for clear hitters") {
    val els = (Seq.fill(500)("hot") ++ Seq.fill(100)("warm") ++
      (0 until 300).map(i => s"cold_$i")).toDF("el")
    val got = Sketches.cmsTopK(els, col("el"), k = 3)
      .as[(String, Long, Long, Long)].collect()
    assert(got.head._1 === "hot" && got.head._2 === 500L)
    assert(got(1)._1 === "warm" && got(1)._2 === 100L)
    // min-over-rows can only overcount (collisions add, never subtract)
    assert(got.forall(r => r._4 >= 0L && r._3 === r._2 + r._4))
  }

  test("cmsCounters: mergeable — counters(A ∪ B) = elementwise sum of the shard sketches") {
    val a = (0 until 400).map(i => s"a_${i % 37}").toDF("el")
    val b = (0 until 300).map(i => s"b_${i % 23}").toDF("el")
    val merged = Sketches.cmsCounters(a.unionAll(b), col("el"))
      .as[(Int, Long, Long)].collect().map(t => ((t._1, t._2), t._3)).toMap
    val summed = (Sketches.cmsCounters(a, col("el")).as[(Int, Long, Long)].collect() ++
      Sketches.cmsCounters(b, col("el")).as[(Int, Long, Long)].collect())
      .groupBy(t => (t._1, t._2)).map { case (k2, v) => (k2, v.map(_._3).sum) }
    assert(merged === summed)
  }

  // ---- Dedup.boilerplateCoverage ----

  test("boilerplateCoverage: df>=3 4-grams cut everywhere, islands merge, sub-n docs clamp") {
    val docs = Seq(
      (1L, "a b c d x"),            // "a b c d" df=3 -> covers 0..3
      (2L, "a b c d y"),
      (3L, "p q a b c d e r s t"),  // covers 2..5 inside a longer doc
      (4L, "u v w z a a a a"),      // no boilerplate shingle
      (5L, "tiny doc"),             // sub-n: whole text is the shingle, df=1
      (6L, "a b c d a b c d x y")). // two overlapping occurrences -> ONE span 0..7
      toDF("doc_id", "text")
    val got = Dedup.boilerplateCoverage(docs, col("doc_id"), col("text"),
      n = 4, minDf = 3L).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got(0) === ((1L, 5L, 4L, 1L, 1L, 0.8)))
    assert(got(1) === ((2L, 5L, 4L, 1L, 1L, 0.8)))
    assert(got(2) === ((3L, 10L, 4L, 1L, 6L, 0.4)))
    assert(got(3) === ((4L, 8L, 0L, 0L, 8L, 0.0)))
    assert(got(4) === ((5L, 2L, 0L, 0L, 2L, 0.0)))
    // doc 6: "a b c d" at pos 0 and 4 cover [0,3] and [4,7] -> merged span
    assert(got(5) === ((6L, 10L, 8L, 1L, 2L, 0.8)))
  }

  test("boilerplateCoverage: a boilerplate whole-text shingle clamps to doc length") {
    val docs = Seq(
      (1L, "ab cd"), (2L, "ab cd"), (3L, "ab cd"), // sub-n, df=3
      (4L, "filler words beyond reach here")).toDF("doc_id", "text")
    val got = Dedup.boilerplateCoverage(docs, col("doc_id"), col("text"),
      n = 4, minDf = 3L).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // covered = [0, min(0+3, 1)] = both words; never past the doc end
    assert(got(0) === ((1L, 2L, 2L, 1L, 0L, 1.0)))
    assert(got(3)._3 === 0L)
  }

  // ---- Dedup.noveltyScores ----

  test("noveltyScores: first copy prices 1.0, re-copy 0.0, mixed doc in between") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),   // all shingles first here
      (2L, "alpha beta gamma delta epsilon"),   // exact copy -> 0 novel
      (3L, "alpha beta gamma zeta eta theta"))  // shares 1 of its shingles
      .toDF("doc_id", "text")
    val got = Dedup.noveltyScores(docs, col("doc_id"), col("text"), n = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(got(0) === ((1L, 3L, 3L, 1.0)))
    assert(got(1) === ((2L, 3L, 0L, 0.0)))
    // doc 3: shingles "alpha beta gamma" (seen in doc 1), +3 fresh
    assert(got(2) === ((3L, 4L, 3L, 0.75)))
  }

  // ---- Similarity.randomProject ----

  test("randomProject: JL distortion bounded in the mean, zero-norm excluded, 8 components") {
    val rnd = new scala.util.Random(7)
    val embs = Similarity.withNorm(
      ((0 until 200).map(i => (i.toLong, Seq.fill(32)(rnd.nextGaussian()))) :+
        (999L, Seq.fill(32)(0.0))).toDF("vec_id", "emb"),
      col("vec_id"), col("emb"))
    val got = Similarity.randomProject(embs, outDim = 8)
      .as[(Long, Int, Double, Double)].collect()
    assert(!got.exists(_._1 == 999L))               // zero-norm vector dropped
    assert(got.length === 200 * 8)
    val ratios = got.groupBy(_._1).map(_._2.head._4)
    // E[norm_ratio] = 1 for JL; mean over 200 gaussian vectors lands
    // well inside [0.8, 1.2] (per-vector spread is chi²_8/8-wide)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean ratio $mean")
    // the sign matrix must mix: a degenerate all-alternating or
    // constant-sign matrix would push most mass to one component family
    assert(ratios.count(r => r > 0.2) > 150)
  }

  test("JlProject: native expression is bit-identical to the interpreted fold") {
    // the codegen'd inner loop must reproduce the SQL aggregate's
    // left-to-right IEEE accumulation EXACTLY — this is the hash
    // contract that keeps x69 under the oracle gate
    val rnd = new scala.util.Random(13)
    // 64-wide vectors, like the embeddings table: the contract projects
    // the FIRST 32 components only (the oracle's range(1, 33)), so the
    // native inDim=32 must ignore the second half exactly as the
    // interpreted sequence(1, 32) fold does
    val embs = (0 until 64).map(i => (i.toLong, Seq.fill(64)(rnd.nextGaussian() * 10)))
      .toDF("vec_id", "emb").select(col("vec_id"), col("emb").cast("array<double>").as("emb"))
    val native = embs.select(col("vec_id"),
      transform(graft.functions.JlProject.jl_project(col("emb"), 8, 32),
        y => round(y, 6)).as("proj"))
    val interpreted = embs.select(col("vec_id"),
      expr(s"""transform(sequence(0, 7), j ->
        round(aggregate(sequence(1, 32), 0.0D,
          (acc, i) -> acc + (1 - 2 * (((CAST(536870923 AS BIGINT) * (j * 33 + i) + 337)
              % ${Dedup.HashP}) % 2))
            * element_at(emb, i)) / sqrt(8.0D), 6))""").as("proj"))
    val n = native.orderBy("vec_id").as[(Long, Seq[Double])].collect()
    val r = interpreted.orderBy("vec_id").as[(Long, Seq[Double])].collect()
    assert(n.length === 64)
    n.zip(r).foreach { case ((idN, pN), (idI, pI)) =>
      assert(idN === idI)
      // exact bit equality, not tolerance
      assert(pN.map(java.lang.Double.doubleToLongBits) ===
        pI.map(java.lang.Double.doubleToLongBits), s"vec $idN: $pN vs $pI")
    }
  }

  // ---- Relevance.bm25TopK ----

  test("bm25: rare term dominates, shorter doc wins at equal tf, ranks dense") {
    val docs = Seq(
      (1L, "rare alpha beta gamma"),                  // rare term, short doc
      (2L, "common alpha beta gamma"),                // common term only
      (3L, "common delta epsilon zeta eta theta"),    // common, longer
      (4L, "common iota kappa"),                      // common, shortest
      (5L, "alpha beta gamma delta")).toDF("doc_id", "text") // no hit
    val got = Relevance.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("rare", "common"), k = 10)
      .as[(Long, Long, Long, Double, Int)].collect()
    assert(got.map(_._5).toSeq === (1 to got.length))  // dense ranks
    assert(got.map(_._4).toSeq === got.map(_._4).sortBy(-_).toSeq)
    assert(!got.exists(_._1 == 5L))                    // no-hit doc absent
    // idf: 'rare' df=1 vs 'common' df=3 of N=5 -> doc 1 on top
    assert(got.head._1 === 1L)
    // among common-only docs at tf=1, shorter dl scores higher
    val commons = got.filter(r => Set(2L, 3L, 4L)(r._1))
    assert(commons.sortBy(_._5).map(_._1).toSeq === Seq(4L, 2L, 3L))
  }

  // ---- Graph.kCorePeel ----

  private def sym(pairs: (Long, Long)*): org.apache.spark.sql.DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("kCorePeel: a path cascades away round by round; a cycle is a fixpoint") {
    // path 1-2-3-4, k=2: round 1 peels endpoints, round 2 peels the
    // middle (degrees fell to 1), round 3 is empty
    val path = sym((1L, 2L), (2L, 3L), (3L, 4L))
    assert(Graph.kCorePeel(path, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap === Map(2L -> 1L, 3L -> 1L))
    assert(Graph.kCorePeel(path, k = 2, rounds = 2).count() === 0)
    assert(Graph.kCorePeel(path, k = 2, rounds = 3).count() === 0)
    // 4-cycle: every degree is 2 — no round ever peels
    val cyc = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(Graph.kCorePeel(cyc, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("kCorePeel: a tail dissolves while the attached triangle core survives") {
    // triangle {1,2,3} + tail 3-4-5, k=2: 5 peels (deg 1), then 4;
    // the triangle keeps degree 2 throughout
    val g = sym((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val got = Graph.kCorePeel(g, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCorePeel law: survivors shrink monotonically in k") {
    // pseudo-random but fixed graph: 40 nodes, edges from a hash rule
    val pairs = for {
      a <- 1L to 40L; b <- (a + 1) to 40L
      if ((a * 2654435761L + b * 40503L) % 7) == 0
    } yield (a, b)
    val g = sym(pairs: _*)
    val surv = (2 to 5).map { k =>
      k -> Graph.kCorePeel(g, k, rounds = 4).as[(Long, Long)]
        .collect().map(_._1).toSet
    }.toMap
    (2 to 4).foreach { k =>
      assert(surv(k + 1).subsetOf(surv(k)), s"k=${k + 1} not within k=$k")
    }
    // and residual degrees respect the floor wherever a next round
    // would keep them (spot: every survivor of k=3/r4 has deg >= 3 OR
    // would be peeled in round 5 — weaker: max residual >= k somewhere)
    assert(surv(2).nonEmpty)
  }

  test("kCorePeel: out-of-range arguments are refused loudly") {
    val g = sym((1L, 2L))
    intercept[IllegalArgumentException] { Graph.kCorePeel(g, k = 0, rounds = 1) }
    intercept[IllegalArgumentException] { Graph.kCorePeel(g, k = 2, rounds = 0) }
    intercept[IllegalArgumentException] { Graph.kCorePeel(g, k = 2, rounds = 17) }
  }

  // ---- Graph.assortativity ----

  test("assortativity: a star is perfectly disassortative (−1e6), a regular graph is NULL") {
    // star 1—{2,3,4}: every edge pairs deg 3 with deg 1 → r = −1
    val star = Graph.assortativity(sym((1L, 2L), (1L, 3L), (1L, 4L)))
      .collect().head
    assert((star.getLong(0), star.getLong(1), star.getLong(2),
      star.getLong(3), star.getLong(4)) === ((4L, 3L, 1L, 3L, -1000000L)))
    // triangle: all degrees 2 → zero variance → NULL, not a crash
    val tri = Graph.assortativity(sym((1L, 2L), (2L, 3L), (1L, 3L)))
      .collect().head
    assert(tri.getLong(0) === 3L && tri.isNullAt(4))
  }

  // ---- Graph.labelPropagation ----

  test("labelPropagation: plurality ties go to the smallest label; a pendant pair oscillates deterministically") {
    // triangle {1,2,3} + pendant pair {10,11}. Round 1: node 1 sees
    // labels {2,3} (tie, count 1 each) → 2; nodes 2,3 see label 1 in
    // their tie sets → 1; the pair swaps labels. Round 2: node 1 sees
    // {lab(2)=1, lab(3)=1} → 1; nodes 2,3 tie {2,1}/{2,1} → 1; the
    // pair swaps BACK (the classic bipartite oscillation — the fixed
    // round count is what makes the contract deterministic).
    // Final labels {1:1, 2:1, 3:1, 10:10, 11:11} → one size-3
    // community + two singletons.
    val g = sym((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L))
    val got = Graph.labelPropagation(g, rounds = 2)
      .orderBy("community_size").as[(Long, Long, Long)].collect()
    assert(got === Array((1L, 2L, 2L), (3L, 1L, 3L)))
    // one round: the triangle splits {1→2, 2→1, 3→1} → sizes 2 and 1
    val one = Graph.labelPropagation(g, rounds = 1)
      .orderBy("community_size").as[(Long, Long, Long)].collect()
    assert(one.map(_._3).sum === 5L) // every node assigned exactly once
    intercept[IllegalArgumentException] { Graph.labelPropagation(g, 0) }
    intercept[IllegalArgumentException] { Graph.labelPropagation(g, 9) }
  }
}

class LinkPredictionSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // path graph 1—2—3—4 (undirected, both directions): non-edges with a
  // common neighbor are (1,3) via 2 and (2,4) via 3; (1,4) shares none
  private def sym(pairs: (Long, Long)*) =
    pairs.flatMap(p => Seq(p, p.swap)).toDF("src", "dst")

  test("path graph: RA index discounts by the mid-node's degree") {
    val got = Graph.linkPrediction(sym((1L, 2L), (2L, 3L), (3L, 4L)), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    // deg(2) = deg(3) = 2 → each predicted pair scores 1e6/2
    assert(got === Array((1L, 3L, 1L, 500000L), (2L, 4L, 1L, 500000L)))
  }

  test("existing edges are excluded; multiple common neighbors sum") {
    // square 1—2—3—4—1: (1,3) and (2,4) are the diagonals, each with
    // TWO common neighbors of degree 2 → cn=2, ra = 2·(1e6/2)
    val got = Graph.linkPrediction(
        sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(got === Array((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
    // no output row is an existing edge
    assert(!got.exists(r => Set((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))(r._1 -> r._2)))
  }

  test("hub refusal: a node above maxDegree refuses loudly") {
    val star = sym((1L to 9L).map(i => (0L, i)): _*)
    val e = intercept[IllegalArgumentException] {
      Graph.linkPrediction(star, k = 5, maxDegree = 4L)
    }
    assert(e.getMessage.contains("hottest node"))
  }

  test("maxMidDegree prunes hub INTERMEDIARIES structurally — no refusal, leaves kept") {
    // star 0—{1..9} plus path 1—10—2: with the degree-9 hub pruned as a
    // mid node (cap 4), (1,2) keeps only its path intermediary 10
    // (deg 2 → ra 5e5) and the hub contributes nothing; without the cap
    // the same graph refuses at maxDegree=4
    val g = sym(((1L to 9L).map(i => (0L, i)) ++ Seq((1L, 10L), (10L, 2L))): _*)
    val got = Graph.linkPrediction(g, k = 100, maxDegree = 4L, maxMidDegree = 4L)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.contains((1L, 2L, 1L, 500000L)))
    // pairs whose ONLY common neighbor is the hub are gone entirely
    assert(!got.exists(r => r._1 === 3L && r._2 === 4L))
    // hub endpoints still appear: (0, 2) via mid 1 (deg 2... 1's degree
    // is 0-1,1-10 = 2 ≤ cap) — the prune removes hubs as MIDS only
    assert(got.exists(r => r._1 === 0L))
  }
}

class HllOverlapSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("inclusion-exclusion identity holds exactly on the sketch's own terms") {
    // identical element sets → union estimate == each single estimate,
    // so overlap_est == est_a == est_b exactly (same registers)
    val els = (1 to 200).flatMap(i => Seq(("s1", s"tok$i"), ("s2", s"tok$i")))
      .toDF("k", "el")
    val got = Sketches.hllOverlap(els, col("k"), col("el"))
      .as[(String, String, Double, Double, Double, Double, Long)].head()
    assert(got._1 === "s1" && got._2 === "s2")
    assert(got._3 === got._4 && got._4 === got._5) // identical registers
    assert(got._6 === got._3)                      // a + b − union = a
    assert(got._7 === 200L)
  }

  test("disjoint sets: exact overlap 0; estimate stays near zero") {
    val els = ((1 to 300).map(i => ("s1", s"a$i")) ++
      (1 to 300).map(i => ("s2", s"b$i"))).toDF("k", "el")
    val r = Sketches.hllOverlap(els, col("k"), col("el"))
      .as[(String, String, Double, Double, Double, Double, Long)].head()
    assert(r._7 === 0L)
    // raw-HLL estimator noise at m=64, but the union must dominate both
    assert(r._5 >= r._3 && r._5 >= r._4)
    assert(math.abs(r._6) < r._5 * 0.5)
  }

  test("three keys → three pairs, all orderings a < b") {
    val els = Seq(("a", "x"), ("b", "x"), ("c", "y")).toDF("k", "el")
    val got = Sketches.hllOverlap(els, col("k"), col("el"))
      .select("ka", "kb").as[(String, String)].collect().toSet
    assert(got === Set(("a", "b"), ("a", "c"), ("b", "c")))
  }
}

class BloomBitsSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def filt(els: Seq[String]) =
    Sketches.bloomBits(els.toDF("el"), col("el"), words = 4, d = 3)

  test("every inserted element's d probe bits are set; width always emitted") {
    val els = (1 to 40).map(i => s"tok$i")
    val got = filt(els).orderBy("word_idx")
      .as[(Long, Long, Int)].collect()
    assert(got.map(_._1) === (0L until 4L).toArray) // all words, zeros included
    val words = got.map(r => r._1 -> r._2).toMap
    // recompute each element's probes the long way and check membership
    val coeffs = Dedup.hashCoeffs(3)
    val probes = els.toDF("el")
      .select(Dedup.md5Hash60(col("el")).as("h"))
      .as[Long].collect()
      .flatMap(h => coeffs.map { case (a, b, c) =>
        ((a * (h & 1073741823L) + b * (h >>> 30) + c) % Dedup.HashP) % (4 * 62L) })
    probes.foreach { bit =>
      assert((words(bit / 62) & (1L << (bit % 62).toInt)) !== 0L, s"bit $bit unset")
    }
    // 62-bit layout: no mask ever reaches the sign bits
    assert(got.forall(_._2 >= 0L))
    assert(got.map(_._3).sum === got.map(r => java.lang.Long.bitCount(r._2)).sum)
  }

  test("merge law: OR of two shard filters == filter of the union") {
    val s1 = (1 to 30).map(i => s"a$i")
    val s2 = (20 to 60).map(i => s"a$i") // overlap on purpose
    val m1 = filt(s1).as[(Long, Long, Int)].collect().map(r => r._1 -> r._2).toMap
    val m2 = filt(s2).as[(Long, Long, Int)].collect().map(r => r._1 -> r._2).toMap
    val whole = filt(s1 ++ s2).as[(Long, Long, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(whole === m1.map { case (k, v) => k -> (v | m2(k)) })
  }
}

class BloomPruneSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("no false negatives ever; accounting columns reconcile") {
    val dim = (1L to 50L).map(i => i * 7L).toDF("k") // 7, 14, ..., 350
    val fact = (1L to 700L).toDF("k")
    val got = Sketches.bloomPruneAudit(fact, col("k"), dim, col("k"),
        words = 8, d = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    val (nFact, nPass, nMatch, nFp, fpPpm) = got
    assert(nFact === 700L)
    assert(nMatch === 50L) // all 50 dim keys occur in 1..700
    assert(nPass === nMatch + nFp) // every true match passes — no FN
    assert(fpPpm === nFp * 1000000L / (nFact - nMatch))
  }

  test("native bloom_contains agrees with the declarative word-join probe per key") {
    val dimKeys = (1L to 80L).map(i => s"d$i")
    val factKeys = (1L to 400L).map(i => if (i % 5 == 0) s"d${i / 5}" else s"f$i")
    val words = 8; val d = 3
    val wordRows = Sketches.bloomWords(dimKeys.toDF("k"), col("k"), words, d)
      .as[(Long, Long)].collect().toMap
    val wordArr = (0 until words).map(i => wordRows.getOrElse(i.toLong, 0L))
    val seeds = Dedup.hashCoeffs(d)
    val native = factKeys.toDF("k")
      .select(col("k"), graft.functions.BloomContains.bloom_contains(
        Dedup.md5Hash60(col("k")), wordArr, seeds).as("pass"))
      .as[(String, Boolean)].collect().toMap
    // declarative twin: d probes per key, all bits must hit
    val declarative = factKeys.map { k =>
      val h = graft.functions.Md5Hash60.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(k))
      k -> seeds.forall { case (a, b, c) =>
        val bit = ((a * (h & 1073741823L) + b * (h >>> 30) + c) % Dedup.HashP) % (words * 62L)
        (wordArr((bit / 62L).toInt) & (1L << (bit % 62L).toInt)) != 0L
      }
    }.toMap
    assert(native === declarative)
    // and every dim key present among the fact keys passes
    factKeys.filter(dimKeys.contains).foreach(k => assert(native(k)))
  }

  test("dim keys absent from the fact side do not distort the audit") {
    val dim = (1000L to 1100L).toDF("k") // disjoint from fact
    val fact = (1L to 200L).toDF("k")
    val got = Sketches.bloomPruneAudit(fact, col("k"), dim, col("k"),
        words = 8, d = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got._3 === 0L) // no true matches
    assert(got._2 === got._4) // everything passing is a false positive
  }
}

class CdcChunkSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def chunks(rows: (Long, String)*) =
    Dedup.cdcChunks(rows.toDF("doc_id", "text"), col("doc_id"), col("text"),
      mask = 4) // small mask → boundaries every ~4 words on test data

  test("chunks partition the doc: contiguous, start at 0, words sum to doc length") {
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val got = chunks((1L, text)).orderBy("chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.head._3 === 0L) // first chunk starts at position 0
    assert(got.map(_._4).sum === 60L)
    // each chunk starts where the previous ended
    got.sliding(2).foreach {
      case Array(a, b) => assert(b._3 === a._3 + a._4)
      case _ =>
    }
  }

  test("CDC re-sync: a prepended word changes ONLY the first chunk's hash") {
    val words = (1 to 80).map(i => s"tok$i")
    val a = chunks((1L, words.mkString(" ")))
      .select(col("chunk_hash")).as[String].collect().toSet
    val b = chunks((1L, ("INSERTED" +: words).mkString(" ")))
      .select(col("chunk_hash")).as[String].collect().toSet
    // every chunk after the first boundary re-synchronizes: the two docs
    // share all chunks except the (changed) leading one
    assert((a diff b).size <= 1, s"a-only=${(a diff b).size}")
    assert((b diff a).size <= 1, s"b-only=${(b diff a).size}")
    assert((a intersect b).nonEmpty)
  }

  test("identical docs produce identical chunk hash multisets — chunk-level dedup sees them") {
    val text = (1 to 40).map(i => s"v$i").mkString(" ")
    val got = chunks((1L, text), (2L, text))
      .groupBy("chunk_hash").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    assert(got.forall(_._2 === 2L))
  }

  // ---- Sketches.kmvDistinct (KMinValuesAgg) ----

  test("KMV below capacity: sketch IS the exact count, zero error") {
    val rows = (1 to 10).map(i => ("k", s"e$i")) ++
      (1 to 10).map(i => ("k", s"e$i")) // duplicates dedup in-buffer
    val got = Sketches.kmvDistinct(rows.toDF("key", "el"),
        col("key"), col("el"), k = 64)
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(got._2 === 10L) // n_exact
    assert(got._3 === 10L) // n_sketch: duplicates absorbed
    assert(got._5 === 10L) // est_distinct == exact below capacity
    assert(got._6 === 0L)  // err_ppm
  }

  test("KMV at capacity: buffer = k smallest distinct hashes, estimator matches hand math") {
    val rows = (1 to 500).map(i => ("k", s"e$i"))
    val df = rows.toDF("key", "el")
    val mins = Sketches.kmvMins(df, col("key"), col("el"), k = 16)
      .select(explode(col("mins"))).as[Long].collect().toSeq
    val allH = df.select(graft.ext.Dedup.md5Hash60(col("el").cast("string")))
      .as[Long].collect().toSet.toSeq.sorted
    assert(mins === allH.take(16)) // exactly the 16 smallest distinct
    assert(mins === mins.sorted && mins.distinct === mins)
    val got = Sketches.kmvDistinct(df, col("key"), col("el"), k = 16)
      .as[(String, Long, Long, Long, Long, Long)].head()
    val expectEst = (BigInt(15) * BigInt(2).pow(60) / BigInt(allH(15))).toLong
    assert(got._4 === allH(15))   // kth_min
    assert(got._5 === expectEst)  // (k-1)·2^60 / h_(k)
    // k=16 gives ~26% sigma; assert the estimate is in a loose sane band
    assert(got._5 > 100L && got._5 < 2500L, s"est=${got._5}")
  }

  test("KMV merge law: result is partitioning-invariant (1 vs 32 partitions)") {
    val rows = (1 to 3000).map(i => (s"g${i % 3}", s"e${i % 700}"))
    def run(parts: Int) =
      Sketches.kmvMins(rows.toDF("key", "el").repartition(parts),
          col("key"), col("el"), k = 32)
        .as[(String, Seq[Long])].collect().toMap
    assert(run(1) === run(32))
  }
}

/** KMV sketch algebra (x188): union/overlap estimates with exact audits. */
class KmvOverlapSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("kmvOverlap below capacity: estimates ARE exact, err_ppm = 0") {
    // |A| = 100, |B| = 80, overlap 30 — all under k=256
    val a = (1 to 100).map(i => s"k$i").toDF("k")
    val b = (71 to 150).map(i => s"k$i").toDF("k")
    val got = Sketches.kmvOverlap(a, col("k"), b, col("k"), k = 256)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((100L, 80L, 30L, 100L, 80L, 150L, 30L, 0L)))
  }

  test("kmvOverlap: disjoint sets estimate zero overlap (below capacity)") {
    val a = (1 to 50).map(i => s"a$i").toDF("k")
    val b = (1 to 50).map(i => s"b$i").toDF("k")
    val got = Sketches.kmvOverlap(a, col("k"), b, col("k"), k = 256)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got._3 === 0L && got._7 === 0L && got._8 === 0L)
  }

  test("kmvOverlap at capacity: identical sets give est_union == est_a == est_b") {
    val a = (1 to 2000).map(i => s"k$i").toDF("k")
    val got = Sketches.kmvOverlap(a, col("k"), a, col("k"), k = 64)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got._4 === got._5 && got._5 === got._6) // same sketch thrice
    assert(got._7 === got._4) // overlap_est = est (inclusion-exclusion)
    assert(got._3 === 2000L)
  }
}
