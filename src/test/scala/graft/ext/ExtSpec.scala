package graft.ext

import graft.SparkSpec
import graft.functions.PolyHash
import org.apache.spark.sql.functions._

class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the Scala twin (codegen path)") {
    val vals = Seq("", "a", "hello world", "x" * 1000, "Prog 7 FHD")
    val got = vals.toDF("s")
      .withColumn("h", PolyHash.poly_hash(col("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vals.foreach(v => assert(got(v) === PolyHash.hash(v), s"'$v'"))
    assert(PolyHash.hash("") === 0L)
    assert(PolyHash.hash("a") === 97L)
  }

  test("null-safe") {
    val got = Seq(Some("ab"), None).toDF("s")
      .withColumn("h", PolyHash.poly_hash(col("s"))).collect()
    assert(got.exists(_.isNullAt(1)))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("md5Hash60 native expr == conv(substring(md5,1,15),16,10) == oracle form") {
    val vals = Seq("", "a", "hello world", "x" * 500, "Grüße 中文 😀")
    val rows = vals.toDF("s")
      .select(col("s"), Dedup.md5Hash60(col("s")).as("native"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("composed"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2), r.getString(0)))
  }

  test("exact dedup keeps the minimum id per content") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(df, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(groups === Map(1L -> 3L, 2L -> 1L))
    val kept = Dedup.exactDedup(df, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 2L))
  }

  test("shingles: distinct word n-grams with short-doc fallback") {
    val got = Seq("a b c d", "a b").toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(got(0).toSet === Set("a b c", "b c d"))
    assert(got(1) === Seq("a b"))
  }

  test("minhash LSH finds what exact jaccard finds (sf0.001 docs)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val approx = Dedup.minhashPairs(docs, col("doc_id"), col("text"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(approx === exact) // high-sim planted dups: full recall expected
    assert(exact.nonEmpty)
  }

  test("hot-bucket guard: 10k identical docs don't create a quadratic LSH bucket") {
    // Without the distinct-contents guard every flood doc lands in the
    // same (band,hash) bucket in all 32 bands → ~1.6e9 join rows. With
    // it the flood collapses to one representative and the distinct
    // near-dup pair is still found.
    val distinct = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different text with nothing shared at all ok"))
    val flood = (100L until 10100L)
      .map(i => (i, "an identical flood document repeated many times verbatim"))
    val df = (distinct ++ flood).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(df, col("doc_id"), col("text"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("LSH bucket cap skips oversized buckets") {
    val sigs = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 1024L))
      .toDF("doc_id", "simhash")
    val uncapped = Dedup.simhashPairs(sigs, maxHamming = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(uncapped === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // every bucket holding the identical trio exceeds the cap of 2
    val capped = Dedup.simhashPairs(sigs, maxHamming = 3, maxBucket = 2)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(capped === Set.empty)
  }

  test("lshCalibration: identical shingle sets land in decile 10 with zero error; pair mass = candidates") {
    // docs 1/2 differ only in whitespace → DIFFERENT bytes (both survive
    // distinctContents) but the SAME word-shingle set → all 64 signature
    // components match (est 1e6) and exact Jaccard is 1e6 → decile 10,
    // mae 0. Docs 3/4 share most shingles (near dup); doc 5 is noise.
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick  brown fox jumps over the lazy dog today"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (5L, "completely unrelated content with nothing shared at all ok")
    ).toDF("doc_id", "text")
    val cal = Dedup.lshCalibration(df, col("doc_id"), col("text"))
      .orderBy("decile")
      .as[(Int, Long, Long, Long)].collect()
    assert(cal.forall(r => r._1 >= 0 && r._1 <= 10), cal.mkString(","))
    val top = cal.find(_._1 == 10).get
    assert(top._2 === 1L)         // exactly the whitespace pair
    assert(top._3 === 0L)         // estimator exact when signatures agree
    assert(top._4 === 1000000L)
    // every banded candidate is audited exactly once: pair mass equals
    // the threshold-free pairer's candidate count
    val nCands = Dedup.minhashPairs(df, col("doc_id"), col("text"),
      threshold = 0.0).count()
    assert(cal.map(_._2).sum === nCands)
    // mae can never exceed the e6 scale
    assert(cal.forall(_._3 <= 1000000L), cal.mkString(","))
  }

  test("simhash: identical docs collide, disjoint docs differ") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    val sigs = Dedup.simhash(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    val pairs = Dedup.simhashPairs(
      Dedup.simhash(df, col("doc_id"), col("text")), maxHamming = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }
}

class StopwordCountSpec extends SparkSpec {
  import spark.implicits._

  test("native expr == size(filter(split)) composed form") {
    val words = TextAnalysis.langStopwords.head._2
    val vals = Seq("", " ", "the cat and the hat", "a  the", "no stop words here",
      "the", "THE the tHe", "x " * 200 + "of")
    val rows = vals.toDF("s")
      .select(col("s"),
        TextAnalysis.stopwordCount(col("s"), words).as("native"),
        size(filter(split(col("s"), " "),
          w => w.isin(words.map(x => x: Any): _*))).as("composed"))
      .collect()
    rows.foreach(r => assert(r.getInt(1) === r.getInt(2), s"'${r.getString(0)}'"))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot and norm match hand computation") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.l2Norm(col("a")).as("n")).collect().head
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
  }

  test("knnBrute: duplicate vector is the top neighbor") {
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // duplicate of 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val embs = Similarity.withNorm(rows, col("vec_id"), col("embedding"))
    val knn = Similarity.knnBrute(embs, embs.where(col("vec_id") === 0), 2)
      .orderBy("rank").collect()
    assert(knn(0).getAs[Long]("neighbor_id") === 1L)
    assert(knn(0).getAs[Double]("sim") === 1.0)
  }

  test("recallAtK: a single-cell index recovers the exact set (recall 100)") {
    // 24 deterministic vectors; stride 24 leaves exactly one seed
    // (vec_id 7), so every vector shares the one cell and the IVF
    // candidate set IS the corpus — approx must equal exact
    val rows = (0L until 24L).map { i =>
      (i, Array(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat,
        (i % 5).toFloat / 4f))
    }.toDF("vec_id", "embedding")
    val embs = Similarity.withNorm(rows, col("vec_id"), col("embedding"))
    val got = Similarity.recallAtK(embs,
      Similarity.seedCentroids(embs, stride = 24), (0L until 4L).toSeq,
      k = 3, nprobe = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got === (0L until 4L).map(q => (q, 3L, 100L)).toArray)
  }

  test("recallAtK: integer floor and per-query spine under a lossy index") {
    val rows = (0L until 40L).map { i =>
      (i, Array(math.cos(i * 1.3).toFloat, math.sin(i * 2.1).toFloat,
        math.cos(i * 0.31).toFloat))
    }.toDF("vec_id", "embedding")
    val embs = Similarity.withNorm(rows, col("vec_id"), col("embedding"))
    // stride 8 -> 5 cells (offsets 7,15,23,31,39), nprobe 1: lossy
    val got = Similarity.recallAtK(embs,
      Similarity.seedCentroids(embs, stride = 8), (0L until 6L).toSeq,
      k = 3, nprobe = 1)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1) === (0L until 6L).toArray)       // spine complete
    got.foreach { case (q, h, pct) =>
      assert(h >= 0L && h <= 3L, s"q$q n_hit=$h")
      assert(pct === h * 100L / 3L, s"q$q floor")          // 0/33/66/100
    }
    // partition-count invariance (determinism under re-layout)
    val again = Similarity.recallAtK(embs.repartition(7),
      Similarity.seedCentroids(embs.repartition(3), stride = 8),
      (0L until 6L).toSeq, k = 3, nprobe = 1)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(again === got)
  }

  test("cellMedoids: identity result equals the brute pairwise argmin; no pair join in the plan") {
    val rows = (0L until 24L).map { i =>
      (i, Array((i % 7).toFloat, math.sin(i * 0.9).toFloat,
        math.cos(i * 0.4).toFloat))
    }.toDF("vec_id", "embedding")
    val embs = Similarity.withNorm(rows, col("vec_id"), col("embedding"))
    val cents = Similarity.seedCentroids(embs, stride = 8) // cids 7,15,23
    val got = Similarity.cellMedoids(embs, cents)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)

    // independent reference: explicit pairwise sum of squared distances
    val vecs = embs.select(col("vec_id"), col("emb"))
      .as[(Long, Seq[Double])].collect().toMap
    val asg = Similarity.ivfAssign(embs, cents)
      .as[(Long, Long)].collect().groupBy(_._2).view
      .mapValues(_.map(_._1).toSeq).toMap
    def ssd(x: Seq[Double], members: Seq[Seq[Double]]): Double =
      members.map(y => x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum).sum
    val expected = asg.map { case (cid, ids) =>
      val ms = ids.map(vecs)
      val scored = ids.map(id => (id, ssd(vecs(id), ms))).sortBy { case (id, s) => (s, id) }
      cid -> ((ids.size.toLong, scored.head._1, scored.head._2))
    }
    got.foreach { case (cid, n, mid, mssd) =>
      val (en, emid, essd) = expected(cid)
      assert(n === en, s"cell $cid size")
      assert(mid === emid, s"cell $cid medoid")
      assert(math.abs(mssd - essd) < 1e-5, s"cell $cid ssd $mssd vs $essd")
    }

    // the scale claim: NO pairwise member join anywhere in the plan
    val p = Similarity.cellMedoids(embs, cents)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("cellMedoids: duplicate members tie to the lower vec_id; singleton cell scores 0") {
    val rows = Seq(
      (7L, Array(1.0f, 0.0f)),   // centroid seed (stride 8) — cell A
      (1L, Array(0.9f, 0.1f)),   // near A
      (2L, Array(0.9f, 0.1f)),   // duplicate of 1 — tie
      (15L, Array(-1.0f, 0.0f))  // centroid seed — cell B, alone
    ).toDF("vec_id", "embedding")
    val embs = Similarity.withNorm(rows, col("vec_id"), col("embedding"))
    val got = Similarity.cellMedoids(embs, Similarity.seedCentroids(embs, 8))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val byCell = got.map(r => r._1 -> r).toMap
    // cell 7: members {7,1,2}; 1 and 2 coincide so both minimize — 1 wins
    assert(byCell(7L)._3 === 1L)
    assert(byCell(15L)._2 === 1L && byCell(15L)._3 === 15L && byCell(15L)._4 === 0.0)
  }

  test("strideForCells holds the cell count fixed at any corpus size") {
    def embsOfN(n: Long) = Similarity.withNorm(
      spark.range(n).selectExpr("id AS vec_id",
        "array(cast(id as double), 1.0d) AS emb"),
      col("vec_id"), col("emb"))
    // 500 rows / 40 cells -> stride 12 (integer division, both engines)
    assert(Similarity.strideForCells(embsOfN(500L), 40) === 12)
    // 10x the corpus -> 10x the stride: cell count stays ~40
    assert(Similarity.strideForCells(embsOfN(5000L), 40) === 125)
    // tiny corpus: stride floors at 1, never 0 (x % 0 would throw)
    assert(Similarity.strideForCells(embsOfN(10L), 40) === 1)
  }

  test("IVF: identical vector lands in the probed cell and ranks first") {
    val base = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dups = base.where(col("vec_id") < 5)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"), col("label"))
    val embs = Similarity.withNorm(base.unionByName(dups), col("vec_id"), col("embedding"))
    val centroids = Similarity.seedCentroids(base
      .transform(b => Similarity.withNorm(b, col("vec_id"), col("embedding"))), 50)
    val top1 = Similarity.ivfSearch(embs, centroids, (0L until 5L).toSeq, k = 5)
      .where(col("rank") === 1)
      .select("qid", "neighbor_id", "sim").as[(Long, Long, Double)].collect()
    assert(top1.length === 5)
    top1.foreach { case (q, n, sim) =>
      assert(n === q + 1000, s"query $q")
      assert(sim === 1.0)
    }
  }

  test("kmeansLite: Lloyd refinement keeps centroid count, recall holds") {
    val embs = Similarity.withNorm(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      col("vec_id"), col("embedding"))
    val seeds = Similarity.seedCentroids(embs, 50)
    val refined = Similarity.kmeansLite(embs, seeds, iters = 2)
    assert(refined.count() === seeds.count())
    // refined centroids are unit-scale-ish vectors with positive norm
    assert(refined.where(col("cnorm") <= 0).count() === 0)
    // the refined quantizer still finds a planted duplicate
    val dups = embs.where(col("vec_id") === 0)
      .select(lit(2000L).as("vec_id"), col("emb"), col("norm"))
    val all = embs.unionByName(dups)
    val top1 = Similarity.ivfSearch(all, refined, Seq(0L), k = 3)
      .where(col("rank") === 1)
      .select("neighbor_id", "sim").as[(Long, Double)].collect()
    assert(top1.toSeq === Seq((2000L, 1.0)))
  }

  test("knnLsh infers dim from the data: 128-dim recall parity with brute force") {
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map(i => (i, Array.fill(128)(rnd.nextFloat() * 2 - 1)))
    // plant a duplicate of vector 0 so recall is testable at rank 1
    val rows = (base :+ (1000L, base.head._2.clone())).toDF("vec_id", "embedding")
    val embs = Similarity.withNorm(rows, col("vec_id"), col("embedding"))
    val top1 = Similarity.knnLsh(embs, Seq(0L), k = 3)
      .where(col("rank") === 1)
      .select("neighbor_id", "sim").as[(Long, Double)].collect()
    assert(top1.toSeq === Seq((1000L, 1.0)))
  }

  test("LSH always finds an identical vector (same buckets by construction)") {
    val base = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // plant exact duplicates of vectors 0..4 under ids 1000..1004
    val dups = base.where(col("vec_id") < 5)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"), col("label"))
    val embs = Similarity.withNorm(base.unionByName(dups), col("vec_id"), col("embedding"))
    val top1 = Similarity.knnLsh(embs, (0L until 5L).toSeq, 5)
      .where(col("rank") === 1)
      .select("qid", "neighbor_id", "sim").as[(Long, Long, Double)].collect()
    assert(top1.length === 5)
    top1.foreach { case (q, n, sim) =>
      assert(n === q + 1000, s"query $q")
      assert(sim === 1.0)
    }
  }

  test("sliceCentroidSim: orthogonal slices 0, identical slices 1, a<b only") {
    val rows = Seq(
      ("a", Array(2.0f, 0.0f)), ("a", Array(4.0f, 0.0f)),  // centroid (3, 0)
      ("b", Array(0.0f, 1.0f)), ("b", Array(0.0f, 3.0f)),  // centroid (0, 2)
      ("c", Array(6.0f, 0.0f))                             // centroid (6, 0) ∥ a
    ).toDF("slice", "embedding")
    val got = Similarity.sliceCentroidSim(rows, col("slice"), col("embedding"))
      .orderBy("slice_a", "slice_b")
      .as[(String, String, Long, Long, Double)].collect()
    assert(got === Array(
      ("a", "b", 2L, 2L, 0.0),
      ("a", "c", 2L, 1L, 1.0),
      ("b", "c", 2L, 1L, 0.0)))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub is deterministic and batch-shaped") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(20)
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length === 20)
    val again = Multimodal.decodeFeatures(media).collect()
    assert(feats.map(_.checksum).sorted.toSeq === again.map(_.checksum).sorted.toSeq)
    // mapPartitions features agree with the column-only metadata
    val meta = Multimodal.metaColumns(media.toDF())
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Int]("width")).toMap
    feats.foreach(f => assert(meta(f.media_id) === f.width))
  }

  private def mediaOf(rows: Seq[(Long, String)]) =
    rows.toDF("media_id", "t")
      .select(col("media_id"), encode(col("t"), "UTF-8").as("payload"))

  private def hashesOf(rows: Seq[(Long, String)]) =
    Multimodal.dHash60(mediaOf(rows), col("media_id"), col("payload"))

  test("dHash60: 60-bit, deterministic, identical payloads collide; one sampled char flips <= 2 bits") {
    val base = ("the quick brown fox jumps over the lazy dog again and again " * 4).take(200)
    // position 37*5 % 200 + 1 = 186 (1-based) is cell 5's sample; 37 is
    // coprime with 200 so exactly ONE cell reads it → <= 2 bits move
    val mutated = base.updated(185, if (base(185) == 'z') 'y' else 'z')
    val h = hashesOf(Seq((1L, base), (2L, base), (3L, mutated)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) === h(2L))
    assert(h(1L) >= 0L && h(1L) < (1L << 60))
    val flipped = java.lang.Long.bitCount(h(1L) ^ h(3L))
    assert(flipped >= 0 && flipped <= 2, s"expected <=2 bit flips, got $flipped")
  }

  test("reencodeVariants: every variant is hamming <= 1 from its original (the planted-recall contract)") {
    val rows = (0 until 40).map { i =>
      (i * 10L, ("payload body " + ("abcdefghij" * 12).drop(i % 7) + i).take(80 + i))
    }
    val media = mediaOf(rows)
    val variants = Multimodal.reencodeVariants(media, every = 10L)
    val vids = variants.select("media_id").collect().map(_.getLong(0)).toSet
    // eligibility: media_id % 10 == 0 (all here), n >= 67, n % 37 != 0
    val eligible = rows.filter { case (_, t) => t.length >= 67 && t.length % 37 != 0 }
      .map(_._1 + 1000000000L).toSet
    assert(vids === eligible)
    val hs = Multimodal.dHash60(media.unionByName(variants),
        col("media_id"), col("payload"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vids.foreach { v =>
      val orig = v - 1000000000L
      val d = java.lang.Long.bitCount(hs(orig) ^ hs(v))
      assert(d <= 1, s"variant of $orig drifted $d bits")
    }
  }

  private def videoOf(rows: Seq[(Long, String)]) =
    rows.toDF("media_id", "t")
      .select(col("media_id"), lit("video").as("kind"),
        encode(col("t"), "UTF-8").as("payload"))

  test("videoFrameDHash: frame grid IS frameSamplePlan's (same stride contract), hashes deterministic") {
    val rows = (0L until 25L).map(i => (i, ("frame payload body " * 9 + i).take(40 + (i * 13 % 200).toInt)))
    val vids = videoOf(rows)
    val gotGrid = Multimodal.videoFrameDHash(vids, maxFrames = 8)
      .select("media_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val planGrid = Multimodal.frameSamplePlan(
        Multimodal.metaColumns(vids), maxFrames = 8)
      .select("media_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(gotGrid === planGrid)
    // deterministic: same input, same hashes
    val h1 = Multimodal.videoFrameDHash(vids).collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val h2 = Multimodal.videoFrameDHash(vids).collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(h1 === h2)
    h1.values.foreach(v => assert(v >= 0L && v < (1L << 60)))
  }

  test("videoNeardupPairs: re-upload twins surface with ham_max = 0 and a full frame vote; distinct videos do not") {
    val rows = (0L until 21L).map(i =>
      (i, ("video body nr " + i + " " + ("abcdefghij" * 20)).take(120 + (i * 7 % 80).toInt)))
    val vids = videoOf(rows)
    val withTwins = vids.unionByName(Multimodal.reuploadTwins(vids, every = 7L))
    val hashes = Multimodal.videoFrameDHash(withTwins)
    val got = Multimodal.videoNeardupPairs(hashes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val twinPairs = got.filter { case (a, b, _, _) => b - a == 2000000000L }
    // every twin whose video samples >= 2 frames must vote through at hamming 0
    val framesPer = hashes.groupBy("media_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = rows.map(_._1).filter(i => i % 7 == 0 && framesPer(i) >= 2L)
    assert(twinPairs.map(_._1).toSet === expected.toSet)
    twinPairs.foreach { case (a, _, nm, hm) =>
      assert(hm === 0, s"twin of $a not byte-identical under the hash?")
      assert(nm === framesPer(a), s"twin of $a must match on EVERY sampled frame")
    }
    // a single-frame coincidence can never fire the vote
    assert(got.forall(_._3 >= 2L))
  }

  test("videoNeardupPairs: the vote is frame-ALIGNED (same positions only) and >= minVotes positions") {
    // hand-built frame hashes: videos 1 and 2 share hashes at frames 0 and 3;
    // video 4 collides with 1 at ONE frame only -> below the vote
    val fh = Seq(
      (1L, 0, 100L), (1L, 3, 200L), (1L, 6, 300L),
      (2L, 0, 100L), (2L, 3, 201L), (2L, 6, 999L), // f3: hamming(200,201)=1
      (4L, 0, 100L), (4L, 3, 77777L)
    ).toDF("media_id", "frame_idx", "phash")
    val got = Multimodal.videoNeardupPairs(fh, maxHamming = 3, minVotes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got === Set((1L, 2L, 2L, 1)))
  }

  test("audioTrimPlan: trim bounds, silent count and the all-silent NULL contract (hand-checked windows)") {
    // payload of spaces (byte 32: window energy 4*32=128 <= 260 silent)
    // with a loud span of 'Z' (byte 90: 4*90=360 > 260 voiced) in the
    // middle: 64 chars => sample offsets are exactly 0..63, windows are
    // 4-char spans; voiced span = chars 16..31 => windows 4..7
    val quiet = " " * 16 + "Z" * 16 + " " * 32
    val allSilent = " " * 64
    val allVoiced = "Z" * 64
    val media = Seq((1L, quiet), (2L, allSilent), (3L, allVoiced))
      .toDF("media_id", "t")
      .select(col("media_id"), lit("audio").as("kind"),
        encode(col("t"), "UTF-8").as("payload"))
    val got = Multimodal.audioTrimPlan(media).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getInt(3), r.getLong(4))))
      .toMap
    assert(got(1L) === ((Some(4), Some(7), 12, 16L * 128 + 4 * (360 - 128))))
    assert(got(2L) === ((None, None, 16, 16L * 128)))
    assert(got(3L) === ((Some(0), Some(15), 0, 16L * 360)))
    // non-audio rows are ignored by the plan
    val img = Seq((9L, "ZZZZ")).toDF("media_id", "t")
      .select(col("media_id"), lit("image").as("kind"),
        encode(col("t"), "UTF-8").as("payload"))
    assert(Multimodal.audioTrimPlan(img).count() === 0L)
  }

  test("bordaAggregate: hand-checked election, per-ballot collapse, singleton NULL ppm") {
    // ballots: b1 ranks A>B>C, b2 ranks B>A, b3 sees only C (singleton)
    // b1: A=2, B=1, C=0 of max 2 each; b2: B=1, A=0 of max 1 each
    val rows = Seq(
      ("b1", "A", 30L, 1), ("b1", "B", 20L, 2), ("b1", "C", 10L, 3),
      ("b2", "B", 9L, 1), ("b2", "A", 5L, 2),
      ("b3", "C", 1L, 1),
      // duplicate candidate entry on b1: pools into A's strength,
      // NOT a second vote (A stays rank 1 with s=30+15=45)
      ("b1", "A", 15L, 4)
    ).toDF("ballot", "cand", "s", "t")
    val got = graft.ext.Relevance.bordaAggregate(rows,
        col("ballot"), col("cand"), col("s"), col("t"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), Option(r.get(4)))))
      .toMap
    assert(got("A") === ((2L, 2L, 3L, Some(2L * 1000000 / 3))))
    assert(got("B") === ((2L, 1L + 1L, 2L + 1L, Some(2L * 1000000 / 3))))
    assert(got("C") === ((2L, 0L, 2L + 0L, Some(0L))))
    // a candidate seen ONLY on singleton ballots: NULL ppm
    val solo = Seq(("b9", "Z", 1L, 1)).toDF("ballot", "cand", "s", "t")
    val z = graft.ext.Relevance.bordaAggregate(solo,
        col("ballot"), col("cand"), col("s"), col("t")).collect().head
    assert(z.isNullAt(4) && z.getLong(3) === 0L)
  }

  test("phash clusters: a planted re-encode family collapses to ONE cluster containing original and variant") {
    val texts = (0L until 30L).map(i =>
      (i * 10L, ("cluster corpus body " + ("qwertyuiop" * 11) + i).take(90 + (i % 9).toInt * 7)))
    val media = mediaOf(texts)
    val withPlanted = media.unionByName(
      graft.ext.Multimodal.reencodeVariants(media, every = 10L))
    val pairs = Multimodal.phashPairs(
      Multimodal.dHash60(withPlanted, col("media_id"), col("payload")))
    val clusters = graft.ext.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every eligible planted variant must share its original's cluster
    val eligible = texts.filter { case (_, t) =>
      t.length >= 67 && t.length % 37 != 0 }.map(_._1)
    assert(eligible.nonEmpty)
    eligible.foreach { id =>
      assert(clusters.contains(id) && clusters(id) === clusters(id + 1000000000L),
        s"variant of $id not in its original's cluster")
    }
  }

  test("audioSegments: gaps-and-islands runs agree with the trim plan's grid (shared helper)") {
    // 64-char payloads => windows are exact 4-char spans
    val twoRuns = "Z" * 12 + " " * 8 + "Z" * 20 + " " * 24  // w0-2, w5-9 voiced
    val allSilent = " " * 64
    val media = Seq((1L, twoRuns), (2L, allSilent)).toDF("media_id", "t")
      .select(col("media_id"), lit("audio").as("kind"),
        encode(col("t"), "UTF-8").as("payload"))
    val segs = Multimodal.audioSegments(media).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .sortBy(x => (x._1, x._2))
    assert(segs === Seq((1L, 0, 2, 3, 3L * 360), (1L, 5, 9, 5, 5L * 360)))
    // grid parity with the trim plan: bounds and silent count line up
    val trim = Multimodal.audioTrimPlan(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(trim(1L).getInt(1) === 0 && trim(1L).getInt(2) === 9)
    assert(trim(1L).getInt(3) === 16 - 8)
    assert(trim(2L).isNullAt(1)) // all silent: trim says drop, segments says no rows
  }

  test("copelandAggregate: majority head-to-heads, beats minus losses, and the Borda-vs-Copeland contract") {
    // b1, b2: A>B>C; b3: B>A>C  =>  A beats B 2-1, A beats C 3-0, B beats C 3-0
    val rows = Seq(
      ("b1", "A", 30L, 1), ("b1", "B", 20L, 2), ("b1", "C", 10L, 3),
      ("b2", "A", 30L, 1), ("b2", "B", 20L, 2), ("b2", "C", 10L, 3),
      ("b3", "B", 30L, 1), ("b3", "A", 20L, 2), ("b3", "C", 10L, 3)
    ).toDF("ballot", "cand", "s", "t")
    val got = graft.ext.Relevance.copelandAggregate(rows,
        col("ballot"), col("cand"), col("s"), col("t"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got("A") === ((2L, 2L, 0L, 0L, 2L)))
    assert(got("B") === ((2L, 1L, 1L, 0L, 0L)))
    assert(got("C") === ((2L, 0L, 2L, 0L, -2L)))
    // an exact 1-1 split is a head-to-head TIE (verdict 0 both sides)
    val split = Seq(
      ("c1", "X", 9L, 1), ("c1", "Y", 1L, 2),
      ("c2", "Y", 9L, 1), ("c2", "X", 1L, 2)
    ).toDF("ballot", "cand", "s", "t")
    val tied = graft.ext.Relevance.copelandAggregate(split,
        col("ballot"), col("cand"), col("s"), col("t"))
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(tied === Map("X" -> 0L, "Y" -> 0L))
    assert(graft.ext.Relevance.copelandAggregate(split,
      col("ballot"), col("cand"), col("s"), col("t"))
      .collect().forall(r => r.getLong(4) === 1L && r.getLong(5) === 0L))
    // a ballot where both candidates tie on score AND tie value carries
    // no preference — it is neutral, so the one decisive ballot decides
    val mixed = Seq(
      ("d1", "P", 5L, 1), ("d1", "Q", 3L, 2),
      ("d2", "P", 7L, 1), ("d2", "Q", 7L, 1)
    ).toDF("ballot", "cand", "s", "t")
    val m = graft.ext.Relevance.copelandAggregate(mixed,
        col("ballot"), col("cand"), col("s"), col("t"))
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(m === Map("P" -> 1L, "Q" -> -1L))
  }

  test("phashPairs: banded join returns EXACTLY the all-pairs hamming<=3 answer (pigeonhole)") {
    // a spread of lengths and contents plus planted near-dups
    val texts = (0 until 30).map { i =>
      val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "fox",
        "golf", "hotel", "india", "julia")
      (100L + i, (0 until 20 + i).map(j => words((i * 7 + j * 3) % 10)).mkString(" "))
    }
    val base = texts.head._2
    val dups = Seq((900L, base), (901L, base.updated(5, '_')))
    val all = texts ++ dups
    val hs = hashesOf(all)
    val got = Multimodal.phashPairs(hs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hv = hs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- hv.keys; b <- hv.keys if a < b
      d = java.lang.Long.bitCount(hv(a) ^ hv(b)) if d <= 3
    } yield (a, b, d)).toSet
    assert(got === brute)
    assert(got.contains((100L, 900L, 0)), s"planted exact dup missing: $got")
  }

  test("audioEnergyProfile: q = energy DIV quantum on the shared grid; one bounded row per (media, window)") {
    val media = Seq((1L, "abcdefgh" * 16), (2L, " " * 80))
      .toDF("media_id", "t")
      .select(col("media_id"), lit("audio").as("kind"),
        encode(col("t"), "UTF-8").as("payload"))
    val prof = Multimodal.audioEnergyProfile(media).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(prof.length === 32) // 16 windows per media, never more
    // all-space payload: every sampled byte is 0x20 = 32, so every
    // window's energy is 4*32 = 128 and q = 128 DIV 16 = 8, all windows
    assert(prof.filter(_._1 == 2L).map(_._3).toSeq === Seq.fill(16)(8L))
    // grid parity with the trim plan: sum of window energies (recovered
    // only coarsely from q here) can never exceed the trim's energy_q
    val eq = Multimodal.audioTrimPlan(media).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    prof.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._3 * 16).sum <= eq(id))
    }
  }

  test("audioNeardupPairs: vote equals brute-force |dq|<=1 window count; planted re-encode recalled") {
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "julia")
    val texts = (0 until 24).map { i =>
      (100L + i, (0 until 25 + i).map(j => words((i * 7 + j * 3) % 10)).mkString(" "))
    }
    val base = texts.toDF("media_id", "t")
      .select(col("media_id"), encode(col("t"), "UTF-8").as("payload"))
    val withPlanted = base.unionByName(Multimodal.reencodeVariants(base))
      .withColumn("kind", lit("audio"))
    val prof = Multimodal.audioEnergyProfile(withPlanted)
    val got = Multimodal.audioNeardupPairs(prof, minVotes = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // brute force over the collected profiles
    val pm = prof.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(t => t._2 -> t._3).toMap }
    val brute = (for {
      a <- pm.keys; b <- pm.keys if a < b
      ds = (0 until 16).map(c => math.abs(pm(a)(c) - pm(b)(c))).filter(_ <= 1L)
      if ds.size >= 12
    } yield (a, b) -> ((ds.size.toLong, ds.max))).toMap
    assert(got === brute)
    // every planted twin recalled: ids 100/110/120 are % 10 == 0 and
    // long enough, so (id, id + 1e9) must be present with >= 15 votes
    Seq(100L, 110L, 120L).foreach { id =>
      val votes = got.get((id, id + 1000000000L))
      assert(votes.exists(_._1 >= 15L), s"planted twin $id missing or weak: $votes")
    }
  }

  test("audioNeardupStars: an IDENTICAL flood pre-collapses to one rep — linear star output, no bucket ever hot") {
    val flood = (0 until 10).map(i => (500L + i, " " * 64)).toDF("media_id", "t")
      .select(col("media_id"), lit("audio").as("kind"),
        encode(col("t"), "UTF-8").as("payload"))
    val prof = Multimodal.audioEnergyProfile(flood)
    // all 10 profiles identical -> ONE representative enters the
    // banding (no bucket can overflow even at maxBucket=2) and the
    // family emits 9 star rows (rep 500 -> members 501..509), kind
    // 'family', full-profile vote (16, 0)
    val stars = Multimodal.audioNeardupStars(prof, minVotes = 1, maxBucket = 2)
      .collect()
    assert(stars.length === 9)
    assert(stars.forall(r => r.getLong(0) == 500L && r.getString(4) == "family"
      && r.getLong(2) == 16L && r.getLong(3) == 0L))
    // with room, the pair view expands the clique as the answer
    assert(Multimodal.audioNeardupPairs(prof, minVotes = 16, maxBucket = 100)
      .count() === 45) // C(10, 2)
    // the pair view REFUSES loudly when a family exceeds maxFamily —
    // the expansion of a flood family is quadratic by definition
    val e = intercept[Exception] {
      Multimodal.audioNeardupPairs(prof, minVotes = 16, maxFamily = 5).count()
    }
    assert(e.getMessage.contains("maxFamily") ||
      Option(e.getCause).exists(_.getMessage.contains("maxFamily")))
  }

  test("audioNeardupStars: a DISTINCT-profile flood sharing band keys still drops loudly under maxBucket — never detonates") {
    // 10 pairwise-distinct profiles: windows 0..11 identical (q=8),
    // windows 12..15 wildly different per media. Bands (minVotes=12):
    // sizes [4,3,3,3,3] over starts [0,4,7,10,13] — bands 0..2 (windows
    // 0..9) are shared by all 10 medias, so those buckets hold 10 rows;
    // bands 3..4 carry the distinct windows (singleton buckets, probe
    // +-1 misses the >=100-spaced levels). True vote between any two =
    // 12 matching windows (0..11) >= minVotes.
    val rows = for (i <- 0 until 10; c <- 0 until 16) yield
      (600L + i, c, if (c < 12) 8L else 1000L * i + 100L * c)
    val prof = rows.toDF("media_id", "c", "q")
    // capless: all 45 pairs verified at exactly 12 votes
    val full = Multimodal.audioNeardupStars(prof, minVotes = 12,
      maxBucket = 100).collect()
    assert(full.count(_.getString(4) == "pair") === 45)
    assert(full.forall(r => r.getString(4) != "pair" || r.getLong(2) == 12L))
    // a cap below the shared-bucket occupancy drops bands 0..2 loudly-
    // by-absence; the distinct bands find no candidates — zero output,
    // never a 10x10 join
    assert(Multimodal.audioNeardupStars(prof, minVotes = 12, maxBucket = 4)
      .count() === 0)
  }

  test("audioNeardupStars: CC over stars equals CC over the pair expansion") {
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "julia")
    val texts = (0 until 24).map { i =>
      (100L + i, (0 until 25 + i).map(j => words((i * 7 + j * 3) % 10)).mkString(" "))
    }
    val base = texts.toDF("media_id", "t")
      .select(col("media_id"), encode(col("t"), "UTF-8").as("payload"))
    val withPlanted = base.unionByName(Multimodal.reencodeVariants(base))
      .withColumn("kind", lit("audio"))
    val prof = Multimodal.audioEnergyProfile(withPlanted)
    def cc(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStars = cc(Multimodal.audioNeardupStars(prof, minVotes = 12))
    val viaPairs = cc(Multimodal.audioNeardupPairs(prof, minVotes = 12))
    assert(viaStars === viaPairs)
    assert(viaStars.nonEmpty)
  }

  test("audioNeardupPairs: gate-corpus bucket occupancy sits FAR below the drop cap (capless-oracle parity observed, not assumed)") {
    // the x250 parity contract: the engine drops (band, key) buckets
    // past maxBucket=65536 while the oracle votes caplessly — sound
    // only while no gate bucket approaches the cap. Build the EXACT
    // x250 input (audio slice + planted re-encodes, quantum=4) on the
    // sf0.01 gate corpus and measure; a future dataset drifting toward
    // the cap fails HERE with a pointer, not as a bare hash mismatch.
    val media = Multimodal.mediaFromDocuments(spark,
      graft.Tables.documents(spark, "/root/testdata/sf0.01")).toDF()
    val auds = media.where(col("kind") === "audio")
      .select(col("media_id"), col("payload"))
    val withPlanted = auds.unionByName(Multimodal.reencodeVariants(auds))
      .withColumn("kind", lit("audio"))
    val occ = Multimodal.audioBandOccupancy(
      Multimodal.audioEnergyProfile(withPlanted, quantum = 4))
    assert(occ > 0L)
    assert(occ <= (1 << 16) / 8,
      s"max (band, key) bucket occupancy $occ is within 8x of the 65536 " +
        "drop cap — the capless x250 oracle parity margin is eroding")
  }

  test("crossModalKeepOne: longest caption wins its cluster (tie: smallest id); singletons kept; captionless members ignored") {
    import graft.ext.Curation
    val docs = Seq(
      (1L, "short"), (2L, "a much longer caption text"), (3L, "mid caption"),
      (7L, "lonely"),
      (8L, "same len"), (9L, "same len")
    ).toDF("doc_id", "text")
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),   // cluster of three real captions
      (8L, 8L), (9L, 8L),             // exact-length tie: id 8 must keep
      (1000000010L, 10L)              // planted variant with no doc row
    ).toDF("media_id", "cluster")
    val got = Curation.crossModalKeepOne(docs, clusters).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3), r.getString(4)))).toMap
    assert(got(2L) === ((1L, 3L, 1, "cluster_best"))) // longest caption
    assert(got(1L) === ((1L, 3L, 0, "cluster_dup")))
    assert(got(3L) === ((1L, 3L, 0, "cluster_dup")))
    assert(got(7L) === ((7L, 1L, 1, "singleton")))
    assert(got(8L) === ((8L, 2L, 1, "cluster_best"))) // tie -> smaller id
    assert(got(9L) === ((8L, 2L, 0, "cluster_dup")))
    assert(got.size === 6) // the captionless planted member contributes nothing
  }
}

class ApproxDistinctSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("approx_count_distinct within 5% of exact on events.user_id (beyond-reference)") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).collect().head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }
}

case class FneEvent(user_id: Long, event_id: Long, props: String)

class FirstNonEmptyAggSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("typed Aggregator agrees with the min_by form on events (SURVEY §7.3)") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("props"))
    // builtin path (what the query layer uses)
    val builtin = ev.groupBy(col("user_id"))
      .agg(min_by(col("props"), when(length(col("props")) > 0, col("event_id")))
        .as("first_props"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // typed Aggregator path
    val typedAgg = ev.as[FneEvent].groupByKey(_.user_id)
      .agg(graft.functions.FirstNonEmptyAgg.column[FneEvent](_.event_id, _.props)
        .name("first_props"))
      .collect().toMap
    assert(typedAgg === builtin)
    assert(builtin.nonEmpty)
  }
}

class SamplingSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ext.{Sampling, TextAnalysis}

  test("hash sample is deterministic, rate-accurate, partition-invariant") {
    val ids = spark.range(0, 20000).toDF("id")
    val kept = Sampling.hashSample(ids, col("id"), 0.3)
      .as[Long].collect().toSet
    // deterministic: identical keep set at a different partition count
    val kept4 = Sampling.hashSample(ids.repartition(4), col("id"), 0.3)
      .as[Long].collect().toSet
    assert(kept === kept4)
    // md5 buckets are uniform: 30% ± 2pp at n=20000
    assert(math.abs(kept.size / 20000.0 - 0.3) < 0.02, kept.size)
  }

  test("stratified rates apply per stratum; default covers the tail") {
    val df = (0 until 8000).map(i => (i.toLong, if (i % 2 == 0) "en" else "zh"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, col("lang"), col("id"),
      rates = Map("en" -> 0.1), default = 1.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(out("zh") === 4000L)              // default 1.0 keeps everything
    assert(math.abs(out("en") / 4000.0 - 0.1) < 0.03, out("en"))
  }

  test("redaction scrubs emails before digit runs; counts audit the raw text") {
    val raw = "write bob.smith+x@corp.example.co or call 5551234567 ref 12345"
    val r = Seq(raw).toDF("t").select(
      TextAnalysis.redactPii(col("t")).as("red"),
      TextAnalysis.patternCount(col("t"), TextAnalysis.EmailPattern).as("ne"),
      TextAnalysis.patternCount(col("t"), TextAnalysis.LongNumberPattern).as("nn"))
      .collect().head
    assert(r.getString(0) === "write <EMAIL> or call <ID> ref 12345")
    assert(r.getInt(1) === 1)
    assert(r.getInt(2) === 1)  // 12345 is under the 6-digit floor
  }

  test("repetition ratios: distinct text 0, repeated text high, short-doc 0") {
    val rows = Seq(
      (1L, "alpha beta gamma delta"),     // all distinct
      (2L, "spam spam spam spam spam"),   // one word repeated
      (3L, "one"),                        // < 2 words
      (4L, "")
    ).toDF("id", "t").select(col("id"),
      TextAnalysis.dupWordRatio(col("t")).as("dw"),
      TextAnalysis.dupBigramRatio(col("t")).as("db"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows(1L) === ((0.0, 0.0)))
    assert(rows(2L)._1 === 0.8)            // 1 - 1/5
    assert(rows(2L)._2 === 0.75)           // 1 distinct bigram of 4
    assert(rows(3L) === ((0.0, 0.0)))
    assert(rows(4L) === ((0.0, 0.0)))
  }

  test("simpson diversity: hand-computed moments; monoculture 0; empty doc absent") {
    val docs = Seq(
      (1L, "a a b"),        // n=3, Σc²=5 -> (9-5)*10000/9 = 4444
      (2L, "x x x x"),      // monoculture -> 0
      (3L, "p q r"),        // all distinct -> (9-3)*10000/9 = 6666
      (4L, "  ")            // blank -> excluded
    ).toDF("id", "t")
    val got = TextAnalysis.simpsonDiversity(docs, col("id"), col("t"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array(
      (1L, 3L, 2L, 4444L), (2L, 4L, 1L, 0L), (3L, 3L, 3L, 6666L)))
  }

  test("contrast keywords: hand-computed smoothed odds, noise floor, top-k plan") {
    val docs = Seq(
      ("en", "the the the cat shared shared"),
      ("de", "der der der hund shared shared shared")
    ).toDF("lang", "text")
    val got = TextAnalysis.contrastKeywords(docs, col("text"),
      col("lang") === "en", k = 10, minTotal = 3L, scale = 1000L)
      .as[(String, Long, Long, Long)].collect()
    // the: ca=3 cb=0 -> 4000; der: ca=0 cb=3 -> 250; shared: 2/3 -> 750
    assert(got === Array(("the", 3L, 0L, 4000L), ("shared", 2L, 3L, 750L),
      ("der", 0L, 3L, 250L)))
    // cat/hund fall under minTotal=3
    val p = TextAnalysis.contrastKeywords(docs, col("text"),
      col("lang") === "en", k = 10).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }
  test("distributionMatch: per-stratum counts equal min(target quota, pool supply); pick rule is x48's; unmatched strata drop") {
    import spark.implicits._
    // target: 3 rows in bin 1, 1 row in bin 2, none in bin 3
    val target = Seq((101L, 1L), (102L, 1L), (103L, 1L), (104L, 2L))
      .toDF("doc_id", "b")
    // pool: 5 in bin 1 (quota 3), 0 in bin 2... and 4 in bin 3 (quota 0)
    val pool = (Seq(1L, 2L, 3L, 4L, 5L).map((_, 1L)) ++
      Seq(31L, 32L, 33L, 34L).map((_, 3L))).toDF("doc_id", "b")
    val got = graft.ext.Sampling.distributionMatch(target, pool,
        col("b"), col("doc_id"))
      .select("doc_id", "stratum", "matched_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.count(_._2 == 1L) === 3) // quota met from 5 candidates
    assert(!got.exists(_._2 == 3L))     // target never exhibits bin 3
    assert(got.forall(_._3 <= 3))
    // the picked 3 are exactly takePerStratum's pick (same hash rule)
    val viaTake = graft.ext.Sampling.takePerStratum(
        pool.where(col("b") === 1L), col("b"), col("doc_id"), n = 3)
      .collect().map(_.getLong(0)).toSet
    assert(got.filter(_._2 == 1L).map(_._1).toSet === viaTake)
    // pool shorter than quota: contributes what it has
    val tgt2 = Seq((9L, 7L), (10L, 7L), (11L, 7L)).toDF("doc_id", "b")
    val pool2 = Seq((1L, 7L)).toDF("doc_id", "b")
    val short = graft.ext.Sampling.distributionMatch(tgt2, pool2,
      col("b"), col("doc_id")).collect()
    assert(short.length === 1)
  }

}

class LayoutSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ext.{Dedup, Layout}

  test("morton key interleaves bits: hand-checked values and locality tiling") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 5L))
      .toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorderKey(col("a"), col("b"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows((0L, 0L)) === 0L)
    assert(rows((1L, 0L)) === 1L)   // a occupies even bit positions
    assert(rows((0L, 1L)) === 2L)   // b occupies odd bit positions
    assert(rows((1L, 1L)) === 3L)
    assert(rows((2L, 2L)) === 12L)  // 0b1100
    assert(rows((3L, 5L)) === 39L)  // a=0b11->bits0,2; b=0b101->bits1,5
  }

  test("scala key == SQL key (the oracle form) on a value grid") {
    val df = (0 until 64).flatMap(a => (0 until 64).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    val bad = df.select(
      Layout.zorderKey(col("a"), col("b"), 8).as("scala_z"),
      expr(Layout.zorderKeySql("a", "b", 8)).as("sql_z"))
      .where(col("scala_z") =!= col("sql_z")).count()
    assert(bad === 0L)
  }

  test("z-sorted layout clusters both dimensions into row groups") {
    // a 32x32 grid z-sorted into 16 chunks: each chunk's (a, b) spans
    // must both be narrow — that's what makes min/max pruning work on
    // either column. A plain a-sort gives chunk b-span = the full 32.
    val grid = (0 until 32).flatMap(a => (0 until 32).map(b => (a.toLong, b.toLong)))
    val zsorted = grid.sortBy { case (a, b) =>
      var z = 0L
      (0 until 5).foreach { i => z |= ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1) }
      z
    }
    val spans = zsorted.grouped(64).map { chunk =>
      val (as, bs) = chunk.unzip
      math.max(as.max - as.min, bs.max - bs.min)
    }.toSeq
    assert(spans.forall(_ <= 8), spans)  // every 64-row chunk is a tight tile
  }

  test("incremental dedup drops contents already in history, keeps min id") {
    val history = Seq((1L, "seen one"), (2L, "seen two")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen one"),   // exists in history -> dropped
      (11L, "fresh"), (12L, "fresh"),  // new content, duplicated in batch -> min id
      (13L, "also new")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupAgainstHistory(batch, history, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(11L, 13L))
  }
}

class ZorderPruningSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.execution.FileSourceScanExec
  import org.apache.spark.sql.DataFrame
  import graft.ext.Layout

  /** Rows surviving parquet row-group/page pruning for `df`'s scan. */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()  // run the job so metrics populate
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }
    scans.sum
  }

  test("z-ordered parquet prunes row groups on the NON-leading column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val grid = (0 until 128).flatMap(a => (0 until 128).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    // many small files so min/max stats have resolution to prune with
    val pageOpts = Map("maxRecordsPerFile" -> "512",
      "parquet.block.size" -> (64 * 1024).toString)
    Layout.zorderWrite(grid, col("a"), col("b"), bits = 7, tiebreak = col("a"))
      .write.options(pageOpts).mode("overwrite").parquet(s"$dir/zord")
    grid.repartitionByRange(4, col("a")).sortWithinPartitions("a")
      .write.options(pageOpts).mode("overwrite").parquet(s"$dir/asort")
    val pred = col("b") < 8  // selective predicate on the non-leading dim
    val zRows = scanOutputRows(spark.read.parquet(s"$dir/zord").where(pred))
    val aRows = scanOutputRows(spark.read.parquet(s"$dir/asort").where(pred))
    // a-sorted files interleave the full b range into every row group ->
    // stats can't prune; z-order tiles b, so most groups are skipped
    assert(zRows < aRows / 2, s"zRows=$zRows aRows=$aRows")
    // both return the same 128*8 = 1024 query rows
    assert(spark.read.parquet(s"$dir/zord").where(pred).count() === 1024L)
    assert(spark.read.parquet(s"$dir/asort").where(pred).count() === 1024L)
  }
}

class PqSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ext.Similarity

  private def embs = Similarity.withNorm(
    graft.Tables.embeddings(spark, "/root/testdata/sf0.01"),
    col("vec_id"), col("embedding"))

  test("pq codes: one code per (vector, subspace); codebook is broadcast-sized") {
    val cb = Similarity.pqCodebooks(embs, m = 4, dim = 64, stride = 50)
    val codes = Similarity.pqEncode(embs, cb, m = 4, dim = 64)
    assert(cb.count() === 40)          // 10 sampled vectors x 4 subspaces
    assert(codes.count() === 500 * 4)  // every vector coded in every subspace
    val dups = codes.groupBy("vec_id", "sub").count().where(col("count") > 1).count()
    assert(dups === 0L)
  }

  test("pq-adc finds a planted duplicate and overlaps brute-force top-5") {
    // the corpus contains each query itself; its code identical in every
    // subspace -> max approximate score -> survives re-rank as the top hit
    val brute = Similarity.knnBrute(embs, embs.where(col("vec_id") < 10), k = 5)
      .select("qid", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // a wider re-rank pool is PQ's recall/cost knob: 10-codeword books
    // are coarse, so re-rank 8k candidates instead of the default 3k
    val pq = Similarity.pqSearch(embs, (0L until 10L).toSeq, k = 5, rerank = 8)
      .select("qid", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(pq.keySet === (0L until 10L).toSet)
    // approximate search with tiny codebooks won't match exact top-5
    // everywhere; demand real signal: mean overlap >= 2.5 of 5
    val overlap = (0L until 10L).map(q => (pq(q) & brute(q)).size).sum / 10.0
    assert(overlap >= 2.5, s"mean overlap $overlap")
  }
}

class ApproxQuantileSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("approx_percentile within its accuracy bound of exact quantiles (mergeable sketch)") {
    // percentile_approx's sketch merges across partitions - the
    // distributed-quantile shape for 100 TB, where exact percentile
    // (x17) needs a full sort per group
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val acc = 1000  // error <= 1/acc of the rank
    val r = ev.agg(
      expr(s"percentile_approx(value, array(0.5, 0.95, 0.99), $acc)").as("approx"),
      expr("percentile(value, array(0.5, 0.95, 0.99))").as("exact"))
      .collect().head
    val approx = r.getSeq[Double](0)
    val exact = r.getSeq[Double](1)
    val n = ev.count()
    // rank error bound: the approx value's rank is within n/acc of target
    val sorted = ev.select("value").orderBy("value")
      .collect().map(_.getDouble(0))
    Seq(0.5, 0.95, 0.99).zipWithIndex.foreach { case (q, i) =>
      val rank = sorted.indexWhere(_ >= approx(i)) match { case -1 => n.toInt case x => x }
      assert(math.abs(rank - q * n) <= n.toDouble / acc * 2 + 1,
        s"q=$q approx=${approx(i)} exact=${exact(i)} rank=$rank")
    }
    // partition-count invariance of the merged sketch
    val r4 = ev.repartition(4).agg(
      expr(s"percentile_approx(value, 0.5, $acc)")).collect().head.getDouble(0)
    val r32 = ev.repartition(32).agg(
      expr(s"percentile_approx(value, 0.5, $acc)")).collect().head.getDouble(0)
    assert(math.abs(r4 - r32) <= math.abs(exact(0)) * 0.01 + 0.01, s"$r4 vs $r32")
  }
}

class PipelinePropertiesSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ext.{Layout, Sampling}

  test("hash samples NEST: a smaller rate's keep-set is a subset of a larger's") {
    // the property that makes hash sampling composable: the 10% corpus
    // IS a subset of the 30% corpus, so scaling up training data never
    // reshuffles what was already kept
    val ids = spark.range(0, 10000).toDF("id")
    val s10 = Sampling.hashSample(ids, col("id"), 0.1).as[Long].collect().toSet
    val s30 = Sampling.hashSample(ids, col("id"), 0.3).as[Long].collect().toSet
    val s100 = Sampling.hashSample(ids, col("id"), 1.0).as[Long].collect().toSet
    assert(s10.subsetOf(s30))
    assert(s30.subsetOf(s100))
    assert(s100.size === 10000)
  }

  test("zorder key is injective on the full 64x64 grid") {
    val keys = (0 until 64).flatMap(a => (0 until 64).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
      .select(Layout.zorderKey(col("a"), col("b"), 6).as("z"))
      .as[Long].collect()
    assert(keys.distinct.length === 64 * 64)
    assert(keys.min === 0L && keys.max === 4095L)  // exactly tiles [0, 2^12)
  }
}

class PackingSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ext.Packing

  test("chunking: coverage, overlap, and edge cases (empty, short, exact-fit)") {
    val docs = Seq(
      (1L, "a" * 500),   // 500 chars -> chunks at 0,150,300 -> 3 chunks
      (2L, "xy"),        // shorter than window -> 1 chunk, whole text
      (3L, ""),          // empty -> 1 empty chunk
      (4L, "b" * 200)    // exact window -> 1 chunk
    ).toDF("doc_id", "text")
    val chunks = Packing.chunk(docs, col("doc_id"), col("text"), 200, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(chunks.keys.count(_._1 == 1L) === 3)
    assert(chunks((1L, 0L)).length === 200)
    assert(chunks((1L, 2L)).length === 200)   // 300..500
    assert(chunks((2L, 0L)) === "xy")
    assert(chunks((3L, 0L)) === "")
    assert(chunks.keys.count(_._1 == 4L) === 1)
    // reconstruction: dropping each chunk's first `overlap` chars after
    // the head chunk and concatenating restores the document
    val rebuilt = (0L until 3L).map { i =>
      val c = chunks((1L, i)); if (i == 0) c else c.drop(50)
    }.mkString
    assert(rebuilt === "a" * 500)
  }

  test("packing: offsets advance by doc length within each shard") {
    val docs = Seq(
      (1L, "s1", 800), (2L, "s1", 800), (3L, "s1", 800),  // 2400 total
      (4L, "s2", 1999), (5L, "s2", 2)                      // straddles
    ).toDF("doc_id", "source", "len")
    val out = Packing.packAssignments(docs, col("source"), col("doc_id"),
        col("len"), target = 2000)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset")))).toMap
    assert(out(1L) === ((0L, 0L)))
    assert(out(2L) === ((0L, 800L)))
    assert(out(3L) === ((0L, 1600L)))   // starts in pack 0, spills into 1
    assert(out(4L) === ((0L, 0L)))      // shards pack independently
    assert(out(5L) === ((0L, 1999L)))
  }
}

class DecontaminateSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ext.Dedup

  test("planted 5-gram leak is dropped; clean docs survive; short docs match whole-text") {
    val bench = Seq(
      (1L, "what is the capital city of france exactly"),
      (2L, "tiny")  // < 5 words -> whole text is the shingle
    ).toDF("doc_id", "text")
    val train = Seq(
      (10L, "irrelevant words that share nothing with any benchmark entry here"),
      (11L, "someone asked what is the capital city of france yesterday"), // leaks 5-gram
      (12L, "tiny"),                                                       // exact short-doc leak
      (13L, "tiny differences are fine when not verbatim equal")           // 'tiny' only as word
    ).toDF("doc_id", "text")
    val kept = Dedup.decontaminate(train, bench, col("doc_id"), col("text"), n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(10L, 13L))
  }

  test("contamination scores: hand-computed overlap fractions; clean docs report 0") {
    val bench = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    // bench 5-grams: "a b c d e", "b c d e f"
    val train = Seq(
      (10L, "a b c d e x y z"),   // 4 shingles, 1 hit -> 2500/10k
      (11L, "p q r s t u"),       // 2 shingles, 0 hits
      (12L, "a b c d e f")        // both shingles hit -> 10000
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationScores(train, bench, col("doc_id"),
      col("text"), n = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array(
      (10L, 4L, 1L, 2500L), (11L, 2L, 0L, 0L), (12L, 2L, 2L, 10000L)))
  }
}

class ConnectedComponentsSpec extends graft.SparkSpec {
  import spark.implicits._
  import graft.ext.Dedup

  test("min-label propagation: chains merge, separate components stay apart") {
    // component {1,2,3,9} via chain 9-3-2-1, component {5,7}
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 9L), (5L, 7L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 7L -> 5L))
  }

  test("non-convergence inside maxIters raises instead of mislabeling") {
    // a 6-node path needs ~5 rounds; maxIters=1 must fail loudly
    val path = (1L until 6L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(path, maxIters = 1)
    }
    // and with room it converges to the path's minimum
    val ok = Dedup.connectedComponents(path, maxIters = 10)
      .as[(Long, Long)].collect().toMap
    assert(ok.values.toSet === Set(1L))
    assert(ok.keySet === (1L to 6L).toSet)
  }

  test("1000-link chain converges in O(log n) rounds (pointer doubling)") {
    // adversarial long-chain graph: plain min-label propagation needs
    // ~999 rounds (diameter-bound) and errored at the old maxIters=25;
    // the label(label) shortcut must land it well under 20
    val chain = (1L until 1000L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponents(chain, maxIters = 20)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet === Set(1L))
    assert(got.keySet === (1L to 1000L).toSet)
  }

  test("x56 spans: consecutive repeats merge, first copy survives, within-doc repeats cut") {
    val docs = Seq(
      (0L, "a b c d e f g h i j"),           // all keeper occurrences
      (1L, "z1 z2 a b c d e f g z3 z4"),     // 3 consecutive dup 5-grams
      (2L, "p q r s t p q r s t"),           // within-doc repeat at pos 5
      (3L, "a b c d e f g h i j"),           // full copy of doc 0
      (4L, "hello"),                         // short-doc whole-text shingle
      (5L, "hello")                          // ... its duplicate
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, col("doc_id"), col("text"), n = 5)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect()
    assert(spans === Array(
      (1L, 2L, 8L, 3L),   // "a b c d e f g" = positions 2..8, 3 shingles
      (2L, 5L, 9L, 1L),   // second "p q r s t"
      (3L, 0L, 9L, 6L),   // entire doc is one span
      (5L, 0L, 4L, 1L)))  // short-doc span_end = pos + n - 1 by contract
  }
}

class RelevanceSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("tfidf: rare term outranks common term; ties break by term; k caps rows") {
    val docs = Seq(
      (1L, "zebra apple apple"),   // zebra df=1, apple df=3
      (2L, "apple banana"),        // banana df=2
      (3L, "apple banana banana")
    ).toDF("doc_id", "text")
    val got = graft.ext.Relevance.tfidfTopK(docs, col("doc_id"), col("text"), k = 2)
    val byDoc = got.select("doc_id", "term", "rank")
      .as[(Long, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // doc 1: zebra tf=1 df=1 -> 3.0; apple tf=2 df=3 -> 2.0
    assert(byDoc(1L) === Seq("zebra", "apple"))
    // doc 3: banana tf=2 df=2 -> 3.0; apple tf=1 df=3 -> 1.0
    assert(byDoc(3L) === Seq("banana", "apple"))
    assert(got.groupBy("doc_id").count().where(col("count") > 2).count() === 0)
  }

  test("tfidf scores are the exact integer ratio") {
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val s = graft.ext.Relevance.tfidfTopK(docs, col("doc_id"), col("text"), k = 5)
      .where(col("doc_id") === 1 && col("term") === "a")
      .select("score").as[Double].head()
    assert(s === 2.0 * 2 / 1) // tf=2, n_docs=2, df=1
  }
}

class C4FilterSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ext.TextAnalysis

  test("signals: mean word length, terminal/bullet lines, lorem ban, keep flag") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today."), // keep
      (2L, "contains lorem ipsum filler text in the middle here."), // banned
      (3L, "- one\n- two\n- three"),                               // all bullets
      (4L, "ok")                                                   // too few words
    ).toDF("doc_id", "text")
    val got = docs.select(
      col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("n_words"),
      TextAnalysis.meanWordLen(col("text")).as("mwl"),
      TextAnalysis.terminalLineCount(col("text")).as("term_l"),
      TextAnalysis.bulletLineCount(col("text")).as("bull_l"),
      TextAnalysis.c4Keep(
        TextAnalysis.wsTokenCount(col("text")),
        TextAnalysis.meanWordLen(col("text")),
        lower(col("text")).contains("lorem ipsum"),
        TextAnalysis.bulletLineCount(col("text")),
        size(TextAnalysis.lines(col("text")))).as("keep"))
      .as[(Long, Int, Double, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._6 === 1)
    assert(got(2L)._6 === 0)          // lorem ipsum
    assert(got(3L)._5 === 3)          // 3 bullet lines
    assert(got(3L)._6 === 0)          // bullet ratio 3/3 > 0.9
    assert(got(4L)._6 === 0)          // word-count floor
    assert(got(1L)._4 === 1)          // one terminal line
    // "ok" -> 2 chars / 1 word
    assert(got(4L)._3 === 2.0)
  }
}

class BloomDecontaminateSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ext.Dedup

  test("bloom-prefiltered result is identical to the exact form") {
    val bench = Seq(
      (1L, "what is the capital city of france exactly"),
      (2L, "tiny")
    ).toDF("doc_id", "text")
    val train = Seq(
      (10L, "irrelevant words that share nothing with any benchmark entry here"),
      (11L, "someone asked what is the capital city of france yesterday"),
      (12L, "tiny"),
      (13L, "tiny differences are fine when not verbatim equal")
    ).toDF("doc_id", "text")
    val exact = Dedup.decontaminate(train, bench, col("doc_id"), col("text"), n = 5)
      .select("doc_id").as[Long].collect().toSet
    val bloom = Dedup.decontaminateBloom(train, bench, col("doc_id"), col("text"), n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(bloom === exact)
    assert(bloom === Set(10L, 13L))
  }
}

class ContainmentSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ext.Dedup

  test("containment is asymmetric: quote-inside-page scores 1.0 one way only") {
    val page = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val quote = "gamma delta epsilon zeta"  // all its 3-grams are in page
    val docs = Seq((1L, quote), (2L, page), (3L, "unrelated words entirely here"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, col("doc_id"), col("text"), n = 3,
      threshold = 0.5).select("a", "b", "containment")
      .as[(Long, Long, Double)].collect().toMap2
    assert(got((1L, 2L)) === 1.0)      // quote fully contained in page
    assert(!got.contains((2L, 1L)))    // page not contained in quote
    assert(!got.exists(_._1._1 == 3L))
  }

  private implicit class M(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] =
      rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}

class TakePerStratumSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ext.Sampling

  test("caps every stratum at n; choice is partition-count invariant") {
    val df = (1L to 100L).map(i => (i, if (i % 3 == 0) "de" else "en"))
      .toDF("id", "lang")
    val a = Sampling.takePerStratum(df, col("lang"), col("id"), n = 10)
      .select("id").as[Long].collect().toSet
    val b = Sampling.takePerStratum(df.repartition(7), col("lang"), col("id"), n = 10)
      .select("id").as[Long].collect().toSet
    assert(a === b)                  // same KEPT SET at any parallelism
    val perLang = Sampling.takePerStratum(df, col("lang"), col("id"), n = 10)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang === Map("en" -> 10L, "de" -> 10L))
    // small stratum below the cap survives whole
    val c = Sampling.takePerStratum(df, col("lang"), col("id"), n = 1000)
    assert(c.count() === 100)
  }
}

class ClassOutliersSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ext.Similarity

  test("centroid is the exact component mean; the planted flipped vector ranks most atypical") {
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(-1.0f, 0.0f), 0),   // planted outlier in class 0
      (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(0.0f, 0.5f), 1)
    ).toDF("vec_id", "embedding", "label")
    val cents = Similarity.labelCentroids(rows, col("label"), col("embedding"))
      .select("label", "cemb").as[(Int, Seq[Double])].collect().toMap
    assert(cents(1) === Seq(0.0, 0.75))  // exact mean of (0,1) and (0,0.5)
    val out = Similarity.classOutliers(rows, col("label"), col("vec_id"),
      col("embedding"), k = 1)
      .select("label", "vec_id").as[(Int, Long)].collect().toMap
    assert(out(0) === 3L)               // the flipped vector
  }
}

class TemperatureWeightsSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.ext.Sampling

  test("alpha=0.5 flattens between proportional and uniform; weights sum to ~1") {
    // 'big' has 16x the tokens of 'small' -> proportional share 16/17,
    // uniform 1/2; sqrt-temperature lands at 4/5
    val docs = (Seq.fill(16)(("big", "w w w w")) :+ ("small", "w w w w"))
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val got = Sampling.temperatureWeights(docs, col("doc_id"), col("source"),
      col("text"), budgetTokens = 1000L)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("big")._2 === 64L && got("small")._2 === 4L)
    assert(math.abs(got("big")._4 - 0.8) < 1e-8)       // sqrt(64)/(8+2)
    assert(math.abs(got("small")._4 - 0.2) < 1e-8)
    val propBig = 64.0 / 68.0
    assert(got("big")._4 < propBig && got("big")._4 > 0.5) // between the regimes
    assert(math.abs(got.values.map(_._4).sum - 1.0) < 1e-6)
    assert(got.values.map(_._5).sum <= 1000L)          // floor never overspends
  }
}

class PrefixJaccardSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("prefix-filtered join == full inverted index (sf0.001 docs, pairs AND scores)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val full = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val pref = Dedup.prefixJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(pref === full) // prefix filter is exact: no pair lost, none added
    assert(full.nonEmpty)
  }

  test("crafted: qualifying pair via rare shingles; sub-threshold pair pruned") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // 4 shingles
      (2L, "alpha beta gamma delta epsilon eta"),    // shares 3 of 4 -> J=3/5
      (3L, "totally unrelated words here now then")) // J=0 with both
      .toDF("doc_id", "text")
    val got = Dedup.prefixJaccardPairs(df, col("doc_id"), col("text"), 3, 0.5)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
    assert(got.toSeq === Seq((1L, 2L, 0.6)))
  }

  test("single-shingle docs (prefix = whole set) and threshold=1.0 exact match") {
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = Dedup.prefixJaccardPairs(df, col("doc_id"), col("text"), 3, 1.0)
      .select("a", "b").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L)))
    intercept[IllegalArgumentException] {
      Dedup.prefixJaccardPairs(df, col("doc_id"), col("text"), 3, 0.0)
    }
  }

  test("seeded random corpora: prefix == full index at three thresholds") {
    // small word pool -> dense overlap, the regime where the prefix
    // lemma has to work hardest (many near-threshold pairs)
    val pool = Array("red", "blue", "green", "dog", "cat", "sun", "sky", "run")
    for (seed <- Seq(7, 23, 91); t <- Seq(0.3, 0.6, 0.9)) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 30L).map { i =>
        val len = 3 + rnd.nextInt(8)
        (i, Seq.fill(len)(pool(rnd.nextInt(pool.length))).mkString(" "))
      }.toDF("doc_id", "text")
      val full = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 2, t)
        .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.prefixJaccardPairs(docs, col("doc_id"), col("text"), 2, t)
        .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(pref === full, s"seed=$seed t=$t")
    }
  }
}

class SortedNeighborhoodSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("SNM pairs are a subset of the exact inverted-index pairs (sf0.001)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val full = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val snm = Dedup.sortedNeighborPairs(docs, col("doc_id"), col("text"),
      keyLen = 12, window = 8, n = 3, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(snm.subsetOf(full)) // scoring is exact; only recall can differ
    assert(snm.nonEmpty)       // planted dups share prefixes -> found
  }

  test("window and blocking-key semantics: close-in-order found, far apart missed") {
    // 1&2: shared prefix, adjacent in sort order, J>=0.5 -> found.
    // 8&9: same near-dup strength but prefixes diverge at char 1 ('m'
    // vs 'z'), and 6 alphabetic spacers push them > window apart.
    val spacers = Seq("n 1", "o 2", "p 3", "q 4", "r 5", "s 6", "t 7", "u 8")
      .zipWithIndex.map { case (t, i) => (20L + i, t + " filler words here") }
    val df = (Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (8L, "mike november oscar papa quebec romeo"),
      (9L, "zulu november oscar papa quebec romeo")) ++ spacers)
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborPairs(df, col("doc_id"), col("text"),
      keyLen = 12, window = 8, n = 3, threshold = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)))
    assert(!got.contains((8L, 9L))) // the documented SNM blocking miss
    intercept[IllegalArgumentException] {
      Dedup.sortedNeighborPairs(df, col("doc_id"), col("text"), 12, 1, 3, 0.5)
    }
  }
}

class IvfPuritySpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("purity report: members partition the corpus; majority recomputed naively matches") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val en = Similarity.withNorm(e, col("vec_id"), col("embedding"))
    val cents = Similarity.seedCentroids(en, Similarity.strideForCells(en, 10))
    val asg = Similarity.ivfAssign(en, cents).localCheckpoint(false)
    val report = asg.join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy("cid", "label").agg(count(lit(1)).as("cnt"))
      .groupBy("cid")
      .agg(sum(col("cnt")).as("n"), max(col("cnt")).as("cm"),
        max_by(col("label"), struct(col("cnt"), (-col("label")).as("nl"))).as("lm"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
      .toMap
    assert(report.values.map(_._1).sum === e.count()) // cells partition the corpus
    // recompute each cell's majority naively from the assignment
    val byCell = asg.join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select("cid", "label").as[(Long, Int)].collect()
      .groupBy(_._1).map { case (cid, rows) =>
        val hist = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val cm = hist.values.max
        cid -> (rows.size.toLong, cm, hist.filter(_._2 == cm).keys.max)
      }
    byCell.foreach { case (cid, (n, cm, lmMaxTie)) =>
      val (gn, gcm, glm) = report(cid)
      assert(gn === n && gcm === cm)
      // engine tie-break is MIN label; naive max-tie must be >= it
      assert(glm <= lmMaxTie)
      assert(cm * 1000000L / n >= 1000000L / report.size.max(1))
    }
  }
}

class FrameSampleSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("stride schedule: <= maxFrames per video, frame 0 always, even spacing") {
    val meta = Seq(
      (1L, "video", 1),   // 1 frame  -> stride 1 -> [0]
      (2L, "video", 4),   // stride 1 -> [0,1,2,3]
      (3L, "video", 5),   // stride 2 -> [0,2,4]
      (4L, "video", 30),  // stride 8 -> [0,8,16,24]
      (5L, "image", 1))   // not video -> absent
      .toDF("media_id", "kind", "n_frames")
    val got = Multimodal.frameSamplePlan(meta, maxFrames = 4)
      .select("media_id", "frame_idx").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got(1L) === Seq(0))
    assert(got(2L) === Seq(0, 1, 2, 3))
    assert(got(3L) === Seq(0, 2, 4))
    assert(got(4L) === Seq(0, 8, 16, 24))
    assert(!got.contains(5L))
    assert(got.values.forall(f => f.length <= 4 && f.head === 0))
  }

  test("resizePlan: limiting dimension governs, symmetric pads, upscale flagged, dst never exceeds target") {
    val meta = Seq(
      (1L, "image", 640, 480),  // landscape: scale 350000 → 224×168, pad_y 28
      (2L, "image", 100, 200),  // small portrait: scale 1120000 → 112×224, upscaled
      (3L, "image", 224, 224),  // exact fit: scale 1e6, pads 0
      (4L, "video", 3, 5))      // degenerate dims still floor-safe
      .toDF("media_id", "kind", "width", "height")
    val got = Multimodal.resizePlan(meta, targetW = 224, targetH = 224)
      .orderBy("media_id")
      .as[(Long, String, Long, Long, Long, Int, Int, Int, Int, Int)].collect()
    assert(got(0) === ((1L, "image", 640L, 480L, 350000L, 224, 168, 0, 28, 0)))
    assert(got(1) === ((2L, "image", 100L, 200L, 1120000L, 112, 224, 56, 0, 1)))
    assert(got(2) === ((3L, "image", 224L, 224L, 1000000L, 224, 224, 0, 0, 0)))
    // 3×5 → scale = min(74666666, 44800000); dst (134, 224) — both ≤ 224
    assert(got(3) === ((4L, "video", 3L, 5L, 44800000L, 134, 224, 45, 0, 1)))
    got.foreach { r =>
      assert(r._6 <= 224 && r._7 <= 224 && r._8 >= 0 && r._9 >= 0, r)
    }
  }
}

class NormProfileSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("hand-checked norms: 3-4-5 triangle, floor mean, degenerate label visible") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f), 0),     // norm 5.0 -> 5000000
      (2L, Array(0.0f, 2.0f), 0),     // norm 2.0 -> 2000000
      (3L, Array(0.0f, 0.0f), 1))     // collapsed -> 0
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.normProfile(df, col("embedding"), col("label"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(0) === ((2L, 2000000L, 5000000L, 3500000L)))
    assert(got(1) === ((1L, 0L, 0L, 0L))) // the degenerate-encoder signal
  }
}

class GroupQuantilesSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("order-statistic positions: ceil(p*n/100), deterministic under ties") {
    // n=4: p25 -> pos 1, p50 -> pos 2, p75 -> pos 3, p99 -> pos 4
    val df = Seq(("s", 10L), ("s", 20L), ("s", 20L), ("s", 40L),
      ("t", 7L)).toDF("src", "len")
    val got = Profile.groupQuantiles(df, col("src"), col("len"),
      Seq(25, 50, 75, 99)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got("s") === ((4L, 10L, 20L, 20L, 40L)))
    assert(got("t") === ((1L, 7L, 7L, 7L, 7L))) // singleton: all quantiles = it
    intercept[IllegalArgumentException] {
      Profile.groupQuantiles(df, col("src"), col("len"), Seq(0))
    }
  }
}

class LangConfusionSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("confusion rows: per-true-lang fractions sum to 1e6 (up to floor loss)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val cm = docs
      .select(col("lang"), TextAnalysis.langId(col("text")).as("predicted"))
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
    val tot = cm.groupBy("lang").agg(sum(col("n")).as("n_lang"))
    val got = cm.join(tot, Seq("lang"))
      .select(col("lang"), col("predicted"), col("n"),
        expr("n * 1000000L DIV n_lang").as("frac_e6"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byLang = got.groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val s = rows.map(_._4).sum
      // floors: sum in (1e6 - #cells, 1e6]
      assert(s <= 1000000L && s > 1000000L - rows.length, s"$lang -> $s")
    }
    // the diagonal dominates for at least one language (sanity: the
    // classifier is better than random on its own corpus)
    assert(got.exists(r => r._1 == r._2 && r._4 > 500000L))
  }
}

/** Readability proxy (x182): exact fixed-point FRE over hand-countable
  * sentences — the heuristic's every term is pinned, not eyeballed. */
class ReadabilitySpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("readability: hand-computed counts and FRE on a known sentence") {
    // "the cat sat on a mat. it is flat!" -> w=9, s=2 marks,
    // vowel runs: the(1) cat(1) sat(1) on(1) a(1) mat.(1) it(1) is(1)
    // flat!(1) = 9, no vowel-less words -> syl=9
    val df = Seq((1L, "the cat sat on a mat. it is flat!"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(df, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === ((1L,
      9L, 2L, 9L,
      206835L - 1015L * 9 / 2 - 84600L * 9 / 9)))
  }

  test("readability: vowel-less words get the +1 floor; runs count maximal groups") {
    // "xyz 123 queueing" -> words 3, runs: queueing has 'ueuei' as ONE
    // maximal run -> 1; xyz and 123 have none but floor +1 each -> syl 3
    val df = Seq((1L, "xyz 123 queueing")).toDF("doc_id", "text")
    val got = TextAnalysis.readability(df, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got._2 === 3L)
    assert(got._4 === 3L)
    assert(got._3 === 1L) // no terminal marks -> sentence floor of 1
  }

  test("readability: empty and whitespace docs are excluded, not scored") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "ok.")).toDF("doc_id", "text")
    val got = TextAnalysis.readability(df, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(3L))
  }

  test("kappaAgreement: the textbook 0.4 table; a constant agreeing pair is NULL") {
    // 2×2 with po=0.7, symmetric 50/50 marginals → pe=0.5 → κ=0.4
    val rows = Seq.fill(35)(("y", "y")) ++ Seq.fill(15)(("y", "n")) ++
      Seq.fill(15)(("n", "y")) ++ Seq.fill(35)(("n", "n"))
    val got = TextAnalysis.kappaAgreement(rows.toDF("a", "b"),
        col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === ((100L, 70L, 700000L, 500000L, 400000L)))
    // both raters constant and equal: pe=1 → κ undefined → NULL
    val const = Seq.fill(4)(("c", "c")).toDF("a", "b")
    val g2 = TextAnalysis.kappaAgreement(const, col("a"), col("b"))
      .collect().head
    assert(g2.getLong(1) === 4L && g2.isNullAt(4))
  }

  test("mcnemarPaired: continuity-corrected statistic, |b−c|<=1 floor, and the b+c=0 NULL") {
    def df(b: Int, c: Int, both: Int, neither: Int) =
      (Seq.fill(b)((true, false)) ++ Seq.fill(c)((false, true)) ++
        Seq.fill(both)((true, true)) ++ Seq.fill(neither)((false, false)))
        .toDF("ka", "kb")
    // b=6, c=2: (|4|−1)²·1e6/8 = 1125000 < 3841459 → not significant
    val g1 = TextAnalysis.mcnemarPaired(df(6, 2, 1, 1), col("ka"), col("kb"))
      .as[(Long, Long, Long, Long, Long, Long, Int)].head()
    assert(g1 === ((10L, 1L, 1L, 6L, 2L, 1125000L, 0)))
    // b=15, c=1: 13²·1e6/16 = 10562500 → significant
    val g2 = TextAnalysis.mcnemarPaired(df(15, 1, 0, 0), col("ka"), col("kb"))
      .as[(Long, Long, Long, Long, Long, Long, Int)].head()
    assert(g2._6 === 10562500L && g2._7 === 1)
    // |b−c| <= 1: the continuity correction floors the statistic at 0
    val g3 = TextAnalysis.mcnemarPaired(df(1, 0, 2, 0), col("ka"), col("kb"))
      .as[(Long, Long, Long, Long, Long, Long, Int)].head()
    assert(g3._6 === 0L && g3._7 === 0)
    // perfect agreement: b+c=0 → undefined → NULL, not significant
    val g4 = TextAnalysis.mcnemarPaired(df(0, 0, 3, 2), col("ka"), col("kb"))
      .collect().head
    assert(g4.isNullAt(5) && g4.getInt(6) === 0)
  }

  test("captureRecapture: textbook Chapman estimate; an empty audit is NULL") {
    // n_a=10, n_b=10, overlap 4 → Chapman = 11·11 DIV 5 − 1 = 23,
    // seen = 16, unseen = 7
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(6)((true, false)) ++
      Seq.fill(6)((false, true)) ++ Seq.fill(10)((false, false))
    val got = TextAnalysis.captureRecapture(rows.toDF("a", "b"),
        col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((10L, 10L, 4L, 16L, 23L, 7L)))
    // rule B catches nothing: the estimator is undefined → NULL
    val empty = Seq((true, false), (false, false)).toDF("a", "b")
    val g2 = TextAnalysis.captureRecapture(empty, col("a"), col("b"))
      .collect().head
    assert(g2.isNullAt(4) && g2.isNullAt(5))
  }

  test("goodTuring: unseen mass is f1/N exactly; r*1 prices singletons; f1=0 reads NULL") {
    // one stratum 'x': tokens a a b b c → N=5, f1=1, f2=2 →
    // unseen 200000 ppm, r*1 = 2·2/1 = 4e6
    val df = Seq(("x", "a a b b c"), ("y", "z z")).toDF("s", "text")
    val got = TextAnalysis.goodTuring(df, col("s"), col("text"))
      .orderBy("s")
      .as[(String, Long, Long, Long, Long, Long, Option[Long])].collect()
    assert(got(0) === (("x", 5L, 3L, 1L, 2L, 200000L, Some(4000000L))))
    // 'y': z appears twice → f1=0 → zero unseen mass, r*1 NULL
    assert(got(1) === (("y", 2L, 1L, 0L, 1L, 0L, None)))
  }
}

/** Round-14 twenty-ninth batch: margin bitext mining (x252), padded
  * batch-plan waste accounting (x253), multimodal consensus near-dup
  * (x254). */
class BitextPadConsensusSpec extends graft.SparkSpec {
  import spark.implicits._

  private def embFrame(rows: Seq[(Long, Seq[Double])]) =
    Similarity.withNorm(
      rows.toDF("vec_id", "embedding"), col("vec_id"), col("embedding"))

  test("marginMine: aligned pair wins with accept=1; hub loses to the margin") {
    // q2's RAW best is the hub h (cos .707 > y2's .640), but h is close
    // to BOTH queries so its neighborhood mean is high — the margin
    // flips the pick to y2. That flip is the entire point of the op.
    val queries = embFrame(Seq(
      1L -> Seq(1.0, 0.0, 0.0, 0.0),
      2L -> Seq(0.0, 1.0, 0.0, 0.0)))
    val pool = embFrame(Seq(
      10L -> Seq(2.0, 0.0, 0.0, 0.0),   // aligned with q1 (cos 1)
      11L -> Seq(0.7, 0.7, 0.0, 0.0),   // hub: cos .707 to q1 AND q2
      12L -> Seq(0.0, 1.0, 1.2, 0.0)))  // q2's true mate (cos .640)
    val got = Similarity.marginMine(queries, pool, k = 4)
      .orderBy("qid")
      .select("qid", "tgt_id", "accept")
      .as[(Long, Long, Int)].collect()
    assert(got.length === 2)
    assert(got(0) === ((1L, 10L, 1)), got.mkString(","))
    // raw cosine would pick 11 (the hub); the margin picks 12
    assert(got(1)._2 === 12L, got.mkString(","))
  }

  test("marginMine: partition-count invariant (two-phase-free exactness)") {
    val queries = embFrame(Seq(1L -> Seq(1.0, 0.2, 0.0, 0.0),
      2L -> Seq(0.0, 1.0, 0.3, 0.0)))
    val pool = embFrame((10 to 40).map(i =>
      i.toLong -> Seq(i % 5 / 4.0, i % 3 / 2.0, i % 7 / 6.0, 1.0)))
    val a = Similarity.marginMine(queries, pool).orderBy("qid").collect()
    val b = Similarity.marginMine(queries, pool.repartition(7))
      .orderBy("qid").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("padWaste: exact pad accounting, capped top bucket, short last batch") {
    // bucketWidth=4, cap=2, batchSize=2. Bucket 0: three 3-token docs
    // (pad 0 whatever the batch split; 2 batches). Bucket 2 holds the
    // 9-token and the 30-token doc (9 DIV 4 = 2; 30 caps to 2) in ONE
    // batch: pad = 30*2 - 39 = 21, waste = 21e6 DIV 60 = 350000.
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f"), (3L, "g h i"),
      (4L, Seq.fill(9)("w").mkString(" ")),
      (5L, Seq.fill(30)("t").mkString(" "))).toDF("doc_id", "text")
    val got = Packing.padWaste(docs, col("doc_id"), col("text"),
        bucketWidth = 4, maxBucketId = 2, batchSize = 2)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got(0) === ((0L, 2L, 3L, 9L, 0L, 0L)), got.mkString(","))
    assert(got(1) === ((2L, 1L, 2L, 39L, 21L, 350000L)), got.mkString(","))
    // input order cannot move the plan: the rank is a hash of the rows
    val shuffled = Packing.padWaste(docs.orderBy(col("doc_id").desc)
        .repartition(5), col("doc_id"), col("text"),
        bucketWidth = 4, maxBucketId = 2, batchSize = 2)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq === shuffled.toSeq)
  }

  test("consensusPairs: both / image_only / text_only classes, -1 sentinels") {
    val img = Seq((1L, 2L, 1), (3L, 4L, 2)).toDF("a", "b", "hamming")
    val txt = Seq((1L, 2L, 0), (5L, 6L, 3)).toDF("a", "b", "hamming")
    val got = Multimodal.consensusPairs(img, txt).orderBy("a", "b")
      .as[(Long, Long, Int, Int, String)].collect()
    assert(got.toSeq === Seq(
      (1L, 2L, 1, 0, "both"),
      (3L, 4L, 2, -1, "image_only"),
      (5L, 6L, -1, 3, "text_only")))
  }
}

/** Pins [[Similarity.ndcgAtK]] — exact integer nDCG with literal log2
  * discounts. */
class NdcgSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def emb(rows: Seq[(Long, Seq[Double], Int)]) = {
    val df = rows.toDF("vec_id", "embedding", "label")
    (Similarity.withNorm(df, col("vec_id"), col("embedding")),
      df.select(col("vec_id"), col("label")))
  }

  test("ndcgAtK: perfect ranking scores 1e6; relevant-at-2 scores w2/(w1)") {
    // query 0 (label 1); corpus: vec 1 (label 1, cos 1.0 -> rank 1),
    // vec 2 (label 0, cos ~.9), vec 3 (label 0, cos ~.1).
    // R = 1 relevant -> idcg = w1 = 1e6; hit at rank 1 -> ndcg = 1e6.
    val (c1, l1) = emb(Seq(
      (0L, Seq(1.0, 0.0), 1), (1L, Seq(2.0, 0.0), 1),
      (2L, Seq(0.9, 0.4), 0), (3L, Seq(0.1, 1.0), 0)))
    val g1 = Similarity.ndcgAtK(c1, c1.where(col("vec_id") === 0), l1, k = 3)
      .select("n_rel_at_k", "dcg_e6", "idcg_e6", "ndcg_e6")
      .as[(Long, Long, Long, Long)].head()
    assert(g1 === ((1L, 1000000L, 1000000L, 1000000L)))
    // flip labels so the relevant doc lands at rank 2:
    // dcg = w2 = 630930, idcg = w1 -> ndcg = 630930
    val (c2, l2) = emb(Seq(
      (0L, Seq(1.0, 0.0), 1), (1L, Seq(2.0, 0.0), 0),
      (2L, Seq(0.9, 0.4), 1), (3L, Seq(0.1, 1.0), 0)))
    val g2 = Similarity.ndcgAtK(c2, c2.where(col("vec_id") === 0), l2, k = 3)
      .select("dcg_e6", "idcg_e6", "ndcg_e6")
      .as[(Long, Long, Long)].head()
    assert(g2 === ((630930L, 1000000L, 630930L)))
  }

  test("ndcgAtK: DISJOINT query set is exact — R counts corpus rows only, no self-subtraction, external label rows don't inflate idcg") {
    // corpus: vec 1 (label 1), vec 2 (label 0). External queries 100
    // and 101 (both label 1) — their label rows live in `labels` but
    // NOT in the corpus. True R for either query = 1 (only vec 1 is
    // reachable); the old n_label_total - 1 form would have read
    // R = 3 - 1 = 2 and deflated ndcg via an unreachable idcg position.
    val corpusRows = Seq((1L, Seq(2.0, 0.0), 1), (2L, Seq(0.5, 0.5), 0))
    val queryRows = Seq((100L, Seq(1.0, 0.0), 1), (101L, Seq(0.9, 0.1), 1))
    val corpus = Similarity.withNorm(
      corpusRows.toDF("vec_id", "embedding", "label"),
      col("vec_id"), col("embedding"))
    val queries = Similarity.withNorm(
      queryRows.toDF("vec_id", "embedding", "label"),
      col("vec_id"), col("embedding"))
    val labels = (corpusRows ++ queryRows).map(r => (r._1, r._3))
      .toDF("vec_id", "label")
    val g = Similarity.ndcgAtK(corpus, queries, labels, k = 2)
      .select("qid", "n_rel_at_k", "dcg_e6", "idcg_e6", "ndcg_e6")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // vec 1 (relevant) ranks 1 for both queries -> dcg = w1 = 1e6;
    // R = 1 -> idcg = w1 -> perfect score, exactly
    assert(g.toSeq === Seq(
      (100L, 1L, 1000000L, 1000000L, 1000000L),
      (101L, 1L, 1000000L, 1000000L, 1000000L)))
  }

  test("ndcgAtK: no relevant docs in the corpus -> idcg 0, ndcg 0 (not a crash)") {
    val (c, l) = emb(Seq(
      (0L, Seq(1.0, 0.0), 7), (1L, Seq(2.0, 0.0), 0), (2L, Seq(0.5, 0.5), 0)))
    val g = Similarity.ndcgAtK(c, c.where(col("vec_id") === 0), l, k = 2)
      .select("n_rel_at_k", "idcg_e6", "ndcg_e6")
      .as[(Long, Long, Long)].head()
    assert(g === ((0L, 0L, 0L)))
  }
}
