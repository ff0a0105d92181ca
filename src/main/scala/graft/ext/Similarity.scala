package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`):
  * brute-force cosine top-k as the exact baseline, random-hyperplane LSH
  * bucketing as the scale path.
  *
  * All vector math is double-precision column expressions
  * (`zip_with` + `aggregate` fold in index order — deterministic and
  * codegen'd; no UDF). 100 TB posture: brute force is the oracle twin for
  * small query sets (broadcast the queries, never the corpus); the LSH
  * path shuffles only (bucket, id) pairs and compares within buckets.
  */
object Similarity {

  /** Dot product (native codegen expression; same left-to-right
    * accumulation as a sequential fold — see [[graft.functions.DotProduct]]). */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Embeddings table normalized to `(id, emb array<double>, norm)`. */
  def withNorm(df: DataFrame, id: Column, emb: Column): DataFrame =
    df.select(id.as("vec_id"), emb.cast("array<double>").as("emb"))
      .withColumn("norm", l2Norm(col("emb")))

  /** Per-label norm profile: count, min/max/mean of the vectors' L2
    * norms as 1e-6-scaled integers — the embedding-space health check
    * (a label whose norms collapse toward 0 or blow out signals a
    * degenerate encoder or corrupt batch). The norm itself is the same
    * sequential-fold dot + IEEE sqrt the kNN family uses (bit-identical
    * in any engine that folds left-to-right), snapped to integers via
    * round(norm·1e6) so the aggregates are exact — the mean is an
    * integer floor, never a float accumulation-order artifact.
    * One scan, one combinable groupBy; embeddings never shuffle (only
    * (label, long) rows do). */
  def normProfile(embs: DataFrame, emb: Column, label: Column): DataFrame =
    embs.select(label.as("label"),
        round(l2Norm(emb.cast("array<double>")) * lit(1000000.0), 0)
          .cast("long").as("norm_e6"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        min(col("norm_e6")).as("min_e6"),
        max(col("norm_e6")).as("max_e6"),
        sum(col("norm_e6")).as("sum_e6"))
      .select(col("label"), col("n"), col("min_e6"), col("max_e6"),
        expr("sum_e6 DIV n").as("mean_e6"))

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions
    * with deterministic ±1 Achlioptas signs — the dimensionality-
    * reduction scale path for the ANN family (project once scan-side,
    * then index the short vectors; 32→8 dims is 4× less shuffle weight
    * and ADC/centroid arithmetic for a distance distortion JL bounds).
    *
    * sign(j, i) = 1 − 2·(((536870923·(j·33 + i) + 337) mod P) mod 2) —
    * pure integer arithmetic, so the oracle reproduces the matrix
    * exactly (the multiplier is ~P/2 so the product WRAPS mod P even at
    * index 1 and the parity mixes; a small multiplier never wraps and
    * its parity would just alternate with the index);
    * y_j = round(Σ_i sign·x_i / √outDim, 6) with a STRICTLY sequential
    * left-to-right accumulation — same IEEE add order as DuckDB's
    * `list_reduce`, so parity holds even before the 6-dp round.
    * Zero-norm vectors are excluded (no direction to preserve;
    * ANSI-safe, same rule as the kNN family).
    *
    * The Σ sign·x_i inner loop runs as the native codegen'd
    * [[graft.functions.JlProject]] expression (outDim×dim per row —
    * the interpreted `transform(sequence, aggregate(...))` form this
    * replaced was the sf1 suite's CPU soak at ~50M lambda evals;
    * JlProject reproduces its accumulation order bit-for-bit, pinned in
    * ExtSpec). Rounding stays Spark's own `round` (one rounding
    * implementation in the contract), and the ‖y‖²/‖x‖² sums reuse the
    * native [[dot]] — the same sequential fold the SQL `aggregate`
    * performed.
    *
    * 100 TB posture: a single scan-side projection — zero shuffles,
    * zero broadcasts; the output explode is bounded by `outDim`.
    * Output: `(vec_id, pos, component, norm_ratio)` where norm_ratio =
    * round(‖y‖²/‖x‖², 6) makes the JL distortion visible per vector. */
  def randomProject(embs: DataFrame, outDim: Int): DataFrame = {
    // inDim pins the PINNED x69 contract: project the FIRST 32
    // components (the oracle's range(1, 33)), not the array length —
    // on the 64-wide embeddings table that is a deliberate truncation
    val inDim = 32
    val proj = embs.where(col("norm") > 0.0)
      .select(col("vec_id"), col("emb"),
        transform(graft.functions.JlProject.jl_project(col("emb"), outDim, inDim),
          y => round(y, 6)).as("proj"))
    proj
      .withColumn("norm_ratio",
        round(dot(col("proj"), col("proj")) / dot(col("emb"), col("emb")), 6))
      .select(col("vec_id"), col("norm_ratio"), posexplode(col("proj")))
      .select(col("vec_id"), col("pos").cast("int").as("pos"),
        col("col").as("component"), col("norm_ratio"))
  }

  /** Exact top-k cosine neighbors for each query vector (queries are
    * broadcast; ranking on the 6-dp-rounded similarity with id tiebreak
    * for determinism). */
  def knnBrute(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries
      .select(col("vec_id").as("qid"), col("emb").as("qemb"), col("norm").as("qnorm")))
    val pairs = corpus.join(q, col("vec_id") =!= col("qid"))
      .withColumn("sim",
        round(dot(col("qemb"), col("emb")) / (col("qnorm") * col("norm")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("sim"), col("rank"))
  }

  /** Exact top-k EUCLIDEAN neighbors — [[knnBrute]]'s twin on the L2
    * metric (rank by 6-dp-rounded distance ASC, id tiebreak). On
    * unnormalized embeddings this ranks genuinely differently from
    * cosine (magnitude matters), which is exactly why a rank-fusion
    * consumer wants both. Same plan shape: broadcast queries, one
    * corpus scan, per-qid rank window. */
  def knnBruteL2(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("emb").as("qemb")))
    val diff = zip_with(col("qemb"), col("emb"), (a, b) => a - b)
    val pairs = corpus.join(q, col("vec_id") =!= col("qid"))
      .withColumn("dist", round(sqrt(dot(diff, diff)), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("dist"), col("rank"))
  }

  /** nDCG@k of the embedding ranking against label relevance — the
    * graded-ranking member of the ANN-eval family (x84 recall, x206
    * MRR, x221 mAP measure hit-or-miss; nDCG discounts by POSITION, so
    * it is the metric that distinguishes "relevant doc at rank 1" from
    * "relevant doc at rank 10"). Relevance is binary label agreement
    * (neighbor shares the query's label) — the "do nearest neighbors
    * share labels" embedding-quality number a curation pass thresholds.
    *
    * Exactness: the position discounts `w_i = round(1e6 / log2(i+1))`
    * are PRECOMPUTED INTEGER LITERALS baked into the plan (and the
    * oracle) — the log never executes on either engine, so the metric
    * is floor-exact end to end: `dcg = Σ w_rank over relevant hits`,
    * `idcg = Σ_{i ≤ min(R, k)} w_i` with R = same-label CORPUS rows
    * reachable by the ranking (the query row itself is subtracted only
    * when it actually IS a corpus row — knnBrute excludes self, so a
    * query outside the corpus has all `n_label_corpus` rows reachable;
    * a query inside it has one fewer). Computed, not assumed: label
    * counts come from the corpus∩labels join and the self-subtraction
    * rides a broadcast semi-join of query ids against corpus ids, so
    * disjoint and overlapping query sets are BOTH exact.
    * `ndcg_e6 = dcg·1e6 DIV idcg`. Queries absent from `labels` have
    * no gradeable relevance and drop (inner q-label join), which is the
    * label-frame contract.
    *
    * 100 TB posture: x9's fixed-query contract — queries broadcast,
    * one corpus scan for the kNN, label counts are a label-cardinality
    * broadcast, the neighbor-label join touches k·|q| ranked rows.
    * Output: (qid, n_rel_at_k, dcg_e6, idcg_e6, ndcg_e6) per query. */
  def ndcgAtK(corpus: DataFrame, queries: DataFrame, labels: DataFrame,
      k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 100, s"ndcgAtK: k=$k out of [1, 100]")
    val w: Seq[Long] = (1 to k).map(i =>
      math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))
    val cumW: Seq[Long] = w.scanLeft(0L)(_ + _).tail
    val ranked = knnBrute(corpus, queries, k)
    val nl = labels.select(col("vec_id").as("neighbor_id"),
      col("label").as("n_label"))
    val ql = broadcast(labels.select(col("vec_id").as("qid"),
      col("label").as("q_label")))
    val wCol = (1 to k).foldLeft(lit(0L)) { (acc, i) =>
      when(col("rank") === i, lit(w(i - 1))).otherwise(acc)
    }
    // R = same-label CORPUS rows reachable by the ranking: corpus-side
    // label counts (labels may carry external query rows the ranking
    // can never return — they must not inflate idcg), minus 1 exactly
    // when the query itself is a corpus row (knnBrute excludes self).
    // Both sides are label-/query-cardinality broadcasts.
    val counts = broadcast(corpus.select(col("vec_id"))
      .join(labels, Seq("vec_id"))
      .groupBy(col("label").as("q_label"))
      .agg(count(lit(1)).as("n_label_corpus")))
    val selfIn = broadcast(queries.select(col("vec_id").as("qid"))
      .join(corpus.select(col("vec_id").as("qid")), Seq("qid"), "left_semi")
      .withColumn("self_in", lit(1L)))
    // left joins + coalesce keep a query whose label has ZERO corpus
    // rows (R=0 → idcg 0 → ndcg 0) instead of silently dropping it
    val rCol = coalesce(col("n_label_corpus"), lit(0L)) -
      coalesce(col("self_in"), lit(0L))
    val idcgCol = (1 to k).foldLeft(lit(0L)) { (acc, i) =>
      when(least(rCol, lit(k.toLong)) === i,
        lit(cumW(i - 1))).otherwise(acc)
    }
    ranked
      .join(nl, Seq("neighbor_id"))
      .join(ql, Seq("qid"))
      .groupBy("qid", "q_label")
      .agg(sum(when(col("n_label") === col("q_label"), 1L).otherwise(0L))
          .as("n_rel_at_k"),
        sum(when(col("n_label") === col("q_label"), wCol).otherwise(lit(0L)))
          .as("dcg_e6"))
      .join(counts, Seq("q_label"), "left")
      .join(selfIn, Seq("qid"), "left")
      .withColumn("idcg_e6", idcgCol)
      .select(col("qid"), col("n_rel_at_k"), col("dcg_e6"), col("idcg_e6"),
        when(col("idcg_e6") > 0,
          expr("dcg_e6 * 1000000L DIV idcg_e6")).otherwise(lit(0L))
          .as("ndcg_e6"))
  }

  /** Margin-based bitext candidate mining (Artetxe & Schwenk 2019,
    * "Margin-based Parallel Corpus Mining with Multilingual Sentence
    * Embeddings"): for each query vector x (language A), the best pool
    * vector y (language B) scored by the margin — cosine divided by the
    * average of BOTH sides' k-NN neighborhood means. A raw cosine
    * threshold cannot separate aligned pairs from hubs (vectors close
    * to everything); dividing by the neighborhood averages cancels
    * hubness, which is the whole point of the margin criterion. The
    * accepted pairs are the mined bitext a multilingual pretraining
    * mix ingests.
    *
    * Exactness contract (the x41/x67 rational-surrogate rule): cosines
    * lift to integer micro-units `sim_e6 = round(cos·1e6)`, then SHIFT
    * non-negative (`s1 = sim_e6 + 1e6` — cos ≥ −1 so s1 ≥ 0) before
    * any division, so every floor-div agrees between Spark DIV
    * (truncate) and ANSI // (floor). Neighborhood means are
    * `Σ s1 DIV k'` over the top-k rows; the margin is
    * `s1 · 2e6 DIV (mq1 + mt1)` — a shifted form of the ratio margin:
    * monotone in the cosine for a fixed neighborhood and decreasing in
    * the neighborhood means, bit-reproducible on any engine. `accept`
    * flags margin > 1e6 (the candidate beats its neighborhoods'
    * average).
    *
    * 100 TB posture: the QUERY set broadcasts (x9's fixed-query
    * contract — a bounded shard of the smaller language); the pool
    * streams through ONE scan whose |q|·|pool| similarity table is
    * localCheckpointed once and feeds all three consumers (query-side
    * means, pool-side means, the margin join). NO rank window touches
    * the pair table (round 15): both k-NN neighborhood means ride the
    * combinable [[graft.functions.TopKByMeasureAgg]] — each input
    * partition collapses a (qid or tid) group to a ≤k-row sorted state
    * BEFORE the exchange, so the wire carries k rows per group ×
    * partition and no task ever sorts a full group — and the per-query
    * winner is a plain struct-max argmax. Pool growth therefore never
    * concentrates into |q| single-task sorts; production still mines
    * shard-by-shard (x82 sharding / x10 bucketing upstream), but the
    * scorer itself no longer needs the bounded-shard fine print.
    *
    * Inputs are [[withNorm]] frames. Output: one row per query —
    * `(qid, tgt_id, sim_e6, mq1_e6, mt1_e6, margin_e6, accept)`. */
  def marginMine(queries: DataFrame, pool: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 1 && k <= 64, s"marginMine: k=$k out of [1, 64]")
    val q = broadcast(queries.select(col("vec_id").as("qid"),
      col("emb").as("qemb"), col("norm").as("qnorm")))
    val pairs = pool.join(q, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("tid"),
        round(dot(col("qemb"), col("emb")) / (col("qnorm") * col("norm")) * 1e6, 0)
          .cast("long").as("sim_e6"))
      .withColumn("s1", col("sim_e6") + 1000000L)
      .localCheckpoint(false)
    // top-k under (s1 DESC, id ASC) ≡ the old (sim_e6 DESC, id ASC)
    // rank window — s1 is sim_e6 shifted by a constant — but map-side
    // combinable; the neighborhood mean is Σm DIV |top| over the ≤k
    // winners (|top| < k when the group is short, matching the old
    // count(*) over the surviving rank rows)
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val topk = udaf(new graft.functions.TopKByMeasureAgg(k),
      ExpressionEncoder[graft.functions.IdMeasure]())
    val mq = pairs.groupBy("qid")
      .agg(topk(col("tid"), col("s1")).as("top"))
      .select(col("qid"),
        expr("aggregate(top, 0L, (a, x) -> a + x.m) DIV size(top)").as("mq1_e6"))
    val mt = pairs.groupBy("tid")
      .agg(topk(col("qid"), col("s1")).as("top"))
      .select(col("tid"),
        expr("aggregate(top, 0L, (a, x) -> a + x.m) DIV size(top)").as("mt1_e6"))
    val scored = pairs
      .join(broadcast(mq), Seq("qid"))
      .join(mt, Seq("tid"))
      .withColumn("margin_e6",
        expr("s1 * 2000000L DIV greatest(mq1_e6 + mt1_e6, 1L)"))
    // per-query winner under (margin_e6 DESC, tid ASC) as a combinable
    // struct max: lexicographic on (margin_e6, −tid) — the negation
    // encodes the ASC tiebreak (vec_ids are non-negative; only a
    // Long.MinValue id could overflow the negation)
    scored.groupBy("qid")
      .agg(max(struct(col("margin_e6"), (-col("tid")).as("ntid"),
        col("sim_e6"), col("mq1_e6"), col("mt1_e6"))).as("b"))
      .select(col("qid"), (-col("b.ntid")).as("tgt_id"), col("b.sim_e6"),
        col("b.mq1_e6"), col("b.mt1_e6"), col("b.margin_e6"),
        (col("b.margin_e6") > 1000000L).cast("int").as("accept"))
  }

  /** Per-class embedding centroid: component-wise mean through the exact
    * DECIMAL accumulator (order/partition-invariant, oracle-exact — the
    * same recipe as [[kmeansLite]]'s re-average, keyed on a LABEL column
    * instead of a learned assignment). Output: (label, cemb, cnorm).
    * One explode + one combinable groupBy — scales like a word count. */
  def labelCentroids(df: DataFrame, label: Column, emb: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    df.select(label.as("label"), posexplode(emb.cast("array<double>")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(
        sum(col("v").cast(DecimalType(28, 16))).cast("double").as("s"),
        count(lit(1)).as("n"))
      .withColumn("m", col("s") / col("n"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("cemb"))
      .withColumn("cnorm", l2Norm(col("cemb")))
  }

  /** The `k` most ATYPICAL members of each class: lowest cosine to the
    * class's own centroid — label-noise / outlier detection over a
    * labeled embedding corpus. Centroids are class-count-sized and
    * broadcast; the corpus streams past them (no corpus shuffle before
    * the per-label rank). An all-zero vector (or a class whose mean is
    * the zero vector) yields a NaN cosine, mirroring the SQL
    * `list_cosine_similarity` 0/0; NaN sorts AFTER every real
    * similarity in both engines' ascending order, so such rows never
    * displace a real outlier from the top-k. */
  def classOutliers(df: DataFrame, label: Column, id: Column, emb: Column,
      k: Int): DataFrame = {
    val e = df.select(label.as("label"), id.as("vec_id"),
      emb.cast("array<double>").as("emb"))
      .withColumn("norm", l2Norm(col("emb")))
    val cents = broadcast(labelCentroids(df, label, emb))
    val scored = e.join(cents, Seq("label"))
      .withColumn("csim",
        round(dot(col("emb"), col("cemb")) / (col("norm") * col("cnorm")), 6))
    // labels are a LOW-cardinality stratum — the worst-k rank runs
    // through StratumRank's two-phase decomposition (round 14: a bare
    // label window caps parallelism at the class count)
    StratumRank.rank(scored, col("label"), Seq(col("csim"), col("vec_id")))
      .withColumn("rn", col("__rn").cast("int")).drop("__s", "__rn")
      .where(col("rn") <= k)
      .select(col("label"), col("vec_id"), col("csim"), col("rn"))
  }

  /** All pairs (a < b) with cosine >= threshold — brute force, the
    * small-data exactness baseline (oracle twin of the LSH path).
    *
    * GUARDED: the plan is O(N²) by construction, so inputs past
    * `maxRows` are refused loudly at plan-build time rather than
    * launching a job that can never finish at corpus scale — the
    * scale path for the same question is [[lshBuckets]]/[[knnLsh]]
    * (bucketed candidates, exact cosine verify). The probe is
    * `limit(maxRows+1).count()`, which stops scanning at the bound
    * instead of counting the full input — NOTE this makes plan
    * construction itself a Spark action (one small job), so explain-only
    * callers pay it too; that is the point of a build-time guard. */
  def nearDupPairs(embs: DataFrame, threshold: Double,
      maxRows: Long = 100000L): DataFrame = {
    // the probe counts via limit(maxRows+1), which caps at Int.MaxValue —
    // past that the probe can never observe "too many rows" and the
    // guard would pass ANY input silently. Refuse loudly instead: a
    // bound that large means the caller wanted the guard off, and an
    // O(N^2) plan over >2^31 rows is never the right call anyway.
    require(maxRows < Int.MaxValue,
      s"nearDupPairs maxRows=$maxRows cannot be enforced (probe caps at " +
        s"Int.MaxValue rows) — use the LSH path for inputs that large")
    val probe = (maxRows + 1L).toInt
    val atMost = embs.limit(probe).count()
    require(atMost <= maxRows,
      s"nearDupPairs is an O(N^2) exact baseline guarded at $maxRows rows; " +
        s"input has more — use the LSH path (Similarity.lshBuckets/knnLsh) " +
        s"for corpus-scale near-dup search")
    val a = embs.select(col("vec_id").as("a"), col("emb").as("ea"), col("norm").as("na"))
    val b = embs.select(col("vec_id").as("b"), col("emb").as("eb"), col("norm").as("nb"))
    a.join(b, col("a") < col("b"))
      .withColumn("sim", round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .where(col("sim") >= threshold)
      .select("a", "b", "sim")
  }

  /** Semantic dedup, the SemDeDup shape (Abbas et al. 2023): cluster the
    * corpus, then mark every vector that has a SMALLER-id in-cluster
    * neighbor with cosine >= `threshold` as a duplicate of the smallest
    * such neighbor. Output: (vec_id, cid, dup_of, keep_flag) — one row
    * per input vector; `dup_of` is NULL (and keep_flag 1) for survivors.
    *
    * Semantics are the greedy per-pair rule, not connected components:
    * in a chain a~b~c (a<b<c) where a!~c, both b and c are removed (c's
    * dup_of is b, itself removed) — one representative per
    * near-duplicate neighborhood, which is what a curation pass wants.
    * The DOCUMENTED limitation (pinned in SemanticDedupSpec): two
    * near-identical vectors assigned to DIFFERENT clusters are never
    * compared, so boundary-straddling duplicates survive. That is the
    * accepted recall trade the clustering buys — all-pairs within
    * cluster is Σ|c|² work instead of N².
    *
    * 100 TB posture: one corpus-sized shuffle on `cid` (members
    * co-locate per cluster), pairing is cluster-local AND collapsed to
    * DISTINCT vectors first (round 16 — [[identicalCollapse]]: an 80k
    * identical-embedding flood folds to one representative, so it can
    * never ride under the cap into a quadratic pair join). Cluster
    * count scales with the corpus (|c| ≈ N/k stays bounded); a
    * pathological hot cluster of genuinely DISTINCT vectors is the
    * same failure mode as a hot LSH bucket, and like [[nearDupPairs]]
    * the operator REFUSES it loudly at plan build (`maxCluster`,
    * default 100k distinct members → 10^10 in-cluster pairs) instead
    * of hanging an executor — raise `stride` (more seeds) or swap the
    * within-cluster step for [[lshBuckets]] inside the cluster. */
  def semanticDedup(embs: DataFrame, threshold: Double,
      stride: Int = 50, iters: Int = 1, maxCluster: Long = 100000L): DataFrame = {
    val cents = kmeansLite(embs, seedCentroids(embs, stride), iters)
    semanticDedupWithin(embs, ivfAssign(embs, cents), threshold, maxCluster)
  }

  /** The within-cluster half of [[semanticDedup]], taking an explicit
    * `(vec_id, cid)` assignment — the unit the spec drives with
    * handcrafted centroids to pin the cross-cluster-miss limitation. */
  def semanticDedupWithin(embs: DataFrame, assign: DataFrame,
      threshold: Double, maxCluster: Long = 100000L): DataFrame = {
    // the assignment feeds THREE consumers (both sides of the pair
    // self-join and the final left join): without materialization each
    // re-derives it, and when it comes from ivfAssign that means three
    // corpus×centroid crossjoin+argmax passes — the single most
    // expensive stage, tripled (seen in the executed plan). The
    // assignment is 2 longs per vector, the cheapest thing in this
    // operator to pin down (same eager-checkpoint pattern, and the same
    // plan-build-time-job caveat, as kmeansLite's per-round centroids)
    val asg = assign.localCheckpoint(true)
    // zero-vector guard: an all-zero embedding has norm 0, so its cosine
    // is 0/0 — under ANSI that division THROWS, and without ANSI it
    // yields NaN, which both engines order above every real number, so a
    // single zero vector with the smallest id would "match" and silently
    // drop its whole cluster. Excluding zero norms from PAIRING (they
    // still survive as keepers) removes both failure modes: the
    // division never runs for them, and they pair with nothing. The
    // oracle expresses the same rule as a NOT isnan filter.
    val m = asg.join(embs, Seq("vec_id"))
    val (pairSide, famDupMembers) =
      identicalCollapse(m.where(col("norm") > 0),
        embs.where(col("norm") > 0), threshold)
    // hot-cluster guard (same loud-refusal contract as nearDupPairs):
    // pairing is Σ|c|² work over the COLLAPSED side, so the guard
    // counts distinct-vector representatives — an identical-embedding
    // flood (the skew corpus's 80k-copy family, the round-16 find)
    // folds to ONE representative and can never ride under the cap
    // into a quadratic pair join the way the pre-collapse-less form
    // did; only a cluster of genuinely DISTINCT vectors can approach
    // the cap, and that refuses loudly. The probe runs over the
    // collapsed side (plan-build-time-job caveat as before).
    val hottest = pairSide.groupBy(col("cid")).count()
      .agg(coalesce(max(col("count")), lit(0L))).head().getLong(0)
    require(hottest <= maxCluster,
      s"semanticDedupWithin pairs all DISTINCT vectors within a cluster " +
        s"(sum of |c|^2 work after identical-vector collapse); the " +
        s"hottest cluster has $hottest distinct members > " +
        s"maxCluster=$maxCluster. Raise `stride` (more, smaller cells), " +
        s"refine with more kmeansLite iters, or run lshBuckets/knnLsh " +
        s"inside the oversized cluster instead of exact all-pairs")
    val a = pairSide.select(col("cid"), col("vec_id").as("a"),
      col("emb").as("ea"), col("norm").as("na"))
    val b = pairSide.select(col("cid"), col("vec_id").as("b"),
      col("emb").as("eb"), col("norm").as("nb"))
    val removedRep = a.join(b, Seq("cid"))
      .where(col("a") < col("b"))
      .withColumn("sim", round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .where(col("sim") >= threshold)
      .groupBy(col("b").as("vec_id"))
      .agg(min(col("a")).as("dup_of"))
    val removed = expandFamilyDups(removedRep, famDupMembers)
    asg.join(removed, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("dup_of"),
        col("dup_of").isNull.cast("int").as("keep_flag"))
  }

  /** IDENTICAL-VECTOR PRE-COLLAPSE (round 16 — the skew receipt's ANN
    * find, the x250 star-form idiom applied to SemDeDup): members group
    * by (cid, exact vector); a family whose self-similarity passes the
    * threshold (identical vectors — `round(1.0, 6)` unless the caller
    * set a threshold above it) contributes only its min-id
    * REPRESENTATIVE to the all-pairs join, because every non-rep
    * member's greedy dup target is provably `coalesce(rep's dup_of,
    * rep)`: sim(x, member) = sim(x, rep) for every x, the rep is
    * itself a ≥-threshold smaller-id neighbor, and any candidate
    * smaller than the rep is also the rep's candidate. Families whose
    * self-sim MISSES the threshold (only possible at thresholds above
    * round-to-6dp unity) stay uncollapsed — members never see each
    * other as candidates, so each must pair independently; exactness
    * over flood-proofing in that pathological corner.
    * Returns (pairSide, famDupMembers): the collapsed pairing side and
    * the (vec_id, rep) rows of collapsed non-representatives. */
  private def identicalCollapse(nzm: DataFrame, corpus: DataFrame,
      threshold: Double): (DataFrame, DataFrame) = {
    // EXISTENCE PROBE (round 17 — the collapse's toy-scale premium,
    // x57/x62 ~+1-1.7 s at sf0.1): when every vector in the corpus is
    // distinct — the common case outside flood corpora — the collapse
    // machinery below (full-vector groupBy exchange + famMap join +
    // lazy checkpoint + the expansion arm) buys nothing. One NARROW
    // aggregation (a 64-bit vector hash; map-side combine folds floods
    // before the exchange) over the PRE-ASSIGNMENT corpus asks whether
    // any exact-duplicate vector exists at all — no corpus-wide dup ⇒
    // no (cell, vector) family anywhere, regardless of assignment.
    // Hash collisions only FALSE-POSITIVE the probe (two distinct
    // vectors colliding just takes the exact slow path), never
    // false-negative — identical vectors hash identically — so the
    // fast path is taken only when provably nothing would collapse.
    // The hash input is sign-normalized (x + 0.0f folds -0.0f into
    // 0.0f) because the collapse's groupBy compares with Spark's
    // NormalizeFloatingNumbers semantics: vectors identical up to
    // zero-sign ARE one group downstream, so they must be one hash
    // here — raw bit hashing would false-negative exactly that flood
    // and route it past the collapse into the maxCluster refusal.
    // Probing the corpus (not the assigned membership) keeps the
    // probe's lineage checkpoint-free, so the answer is a memoizable
    // data property of the immutable input ([[CorpusProps]]) — the job
    // runs once per (session, corpus), not once per plan build.
    // The empty members frame is a literal Filter(false): Catalyst's
    // PropagateEmptyRelation folds [[expandFamilyDups]]'s join and
    // union out of the optimized plan entirely.
    val anyFamily = CorpusProps.memo(corpus, "hasDupVectors") {
      !corpus
        .groupBy(xxhash64(transform(col("emb"), x => x + lit(0.0f))).as("h"))
        .agg(count(lit(1)).as("fam_n"))
        .where(col("fam_n") > 1)
        .isEmpty
    }
    if (!anyFamily) {
      val pairSide = nzm.select(col("vec_id"), col("cid"), col("emb"), col("norm"))
      val noMembers = nzm.select(col("vec_id"), col("vec_id").as("rep"))
        .where(lit(false))
      return (pairSide, noMembers)
    }
    val fam = nzm.groupBy(col("cid"), col("emb"), col("norm"))
      .agg(min(col("vec_id")).as("rep"))
      .withColumn("fam_sim",
        round(dot(col("emb"), col("emb")) / (col("norm") * col("norm")), 6))
      .withColumn("fam_dup", col("fam_sim") >= threshold)
    val famMap = nzm.select(col("vec_id"), col("cid"), col("emb"), col("norm"))
      .join(fam, Seq("cid", "emb", "norm"))
      .localCheckpoint(false)
    val pairSide = famMap
      .where(!col("fam_dup") || col("vec_id") === col("rep"))
      .select(col("vec_id"), col("cid"), col("emb"), col("norm"))
    // distinct: multi-probe membership lists a vector once per probed
    // cell, and identical vectors share BOTH cells — without the fold a
    // collapsed member would get two removal rows and duplicate its
    // output row after the final left join
    val famDupMembers = famMap
      .where(col("fam_dup") && col("vec_id") =!= col("rep"))
      .select(col("vec_id"), col("rep"))
      .distinct()
    (pairSide, famDupMembers)
  }

  /** Expansion half of [[identicalCollapse]]: representative-level dup
    * verdicts joined back onto collapsed members — a member's dup
    * target is its rep's target when the rep itself was removed, else
    * the rep. Output matches the uncollapsed `removed` table
    * row-for-row (value identity argued at the collapse site). */
  private def expandFamilyDups(removedRep: DataFrame,
      famDupMembers: DataFrame): DataFrame = {
    // the rep-level verdict feeds TWO consumers (the union arm and the
    // member lookup): lazily checkpoint so the cid-pair join — the
    // operator's most expensive stage — evaluates once, not per
    // reference (the x57 plan pin counts its scans)
    val rr = removedRep.localCheckpoint(false)
    val memberDup = famDupMembers
      .join(rr.select(col("vec_id").as("rep"),
        col("dup_of").as("rep_dup")), Seq("rep"), "left")
      .select(col("vec_id"),
        coalesce(col("rep_dup"), col("rep")).as("dup_of"))
    rr.unionByName(memberDup)
  }

  /** Top-2 IVF cells per vector (multi-probe assignment), via the typed
    * [[graft.functions.Top2CellsAgg]] aggregator: the corpus×centroid
    * similarity stream collapses MAP-SIDE to one fixed-size (s1,c1,s2,c2)
    * state per vector before the exchange — k× less wire traffic than
    * the `row_number` window the same ranking would otherwise need
    * (which shuffles all N·k similarity rows on vec_id). Slot 1 is
    * exactly [[ivfAssign]]'s single-probe cell (same (csim DESC, cid
    * ASC) order); NaN csims (zero-norm inputs) never occupy a slot.
    * Output: (vec_id, cells array<long>) with 0/1/2 elements. */
  def ivfAssignTop2(embs: DataFrame, centroids: DataFrame): DataFrame = {
    val top2 = udaf(new graft.functions.Top2CellsAgg(),
      org.apache.spark.sql.Encoders.product[graft.functions.CellSim])
    centroidSims(embs, centroids)
      .groupBy("vec_id")
      .agg(top2(col("cid"), col("csim")).as("cells"))
  }

  /** Multi-probe semantic dedup — [[semanticDedup]]'s recall extension.
    * Each vector joins its TOP-2 cells instead of one, so a
    * near-duplicate pair straddling a cluster boundary (the documented
    * x57 miss, pinned in SemanticDedupSpec) is still compared whenever
    * the two vectors share either cell — which boundary-straddlers do
    * almost by construction: sitting near the midline, both rank the
    * same two cells highest. Cost: membership doubles, so in-cluster
    * pair work is bounded by 4× single-probe — still Σ|c|², never N². */
  def semanticDedupMultiProbe(embs: DataFrame, threshold: Double,
      stride: Int = 50, iters: Int = 1, maxCluster: Long = 100000L): DataFrame = {
    val cents = kmeansLite(embs, seedCentroids(embs, stride), iters)
    semanticDedupAcross(embs, cents, threshold, maxCluster)
  }

  /** The pairing half of [[semanticDedupMultiProbe]], taking explicit
    * centroids — the unit the spec drives with handcrafted cells to pin
    * the boundary-straddling catch. Output matches [[semanticDedup]]
    * plus `cid2` (the probed runner-up cell, NULL when only one cell
    * exists or the vector has zero norm — zero-norm vectors skip
    * assignment entirely and survive as keepers, same contract as
    * single-probe's pairing exclusion). `dup_of` remains the greedy
    * keep-min rule; duplicate pairs that share BOTH cells are folded by
    * the min aggregate, not a distinct (two longs through an agg beat a
    * corpus-scale distinct shuffle). */
  def semanticDedupAcross(embs: DataFrame, centroids: DataFrame,
      threshold: Double, maxCluster: Long = 100000L): DataFrame = {
    val nz = embs.where(col("norm") > 0)
    // same three-consumer materialization as semanticDedupWithin: both
    // pair sides and the final left join re-derive the assignment
    // (here the corpus×centroid aggregation) without the checkpoint
    val asg = ivfAssignTop2(nz, centroids).localCheckpoint(true)
    val mem = asg.select(col("vec_id"), explode(col("cells")).as("cid"))
    val m = mem.join(nz, Seq("vec_id"))
    // identical-vector pre-collapse (round 16 — see identicalCollapse):
    // identical vectors share both probed cells, so the per-(cell,
    // vector) family collapse is consistent across probes and the 80k
    // identical-embedding flood folds to one representative per cell
    val (pairSide, famDupMembers) = identicalCollapse(m, nz, threshold)
    // hot-cell guard, counted over the COLLAPSED exploded membership
    // (multi-probe doubles it): same loud-refusal contract as
    // semanticDedupWithin — only genuinely distinct vectors can
    // approach the cap
    val hottest = pairSide.groupBy(col("cid")).count()
      .agg(coalesce(max(col("count")), lit(0L))).head().getLong(0)
    require(hottest <= maxCluster,
      s"semanticDedupAcross pairs all DISTINCT vectors within a probed " +
        s"cell (sum of |c|^2 work after identical-vector collapse, and " +
        s"multi-probe doubles membership); the hottest cell has $hottest " +
        s"distinct members > maxCluster=$maxCluster. Raise " +
        s"`stride` (more, smaller cells), refine with more kmeansLite " +
        s"iters, or run lshBuckets/knnLsh inside the oversized cell " +
        s"instead of exact all-pairs")
    val a = pairSide.select(col("cid"), col("vec_id").as("a"),
      col("emb").as("ea"), col("norm").as("na"))
    val b = pairSide.select(col("cid"), col("vec_id").as("b"),
      col("emb").as("eb"), col("norm").as("nb"))
    // both pair sides have norm > 0 by construction, so the cosine can
    // never be NaN here — no isnan guard needed (cf. semanticDedupWithin,
    // whose membership includes zero-norm keepers)
    val removedRep = a.join(b, Seq("cid"))
      .where(col("a") < col("b"))
      .withColumn("sim", round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .where(col("sim") >= threshold)
      .groupBy(col("b").as("vec_id"))
      .agg(min(col("a")).as("dup_of"))
    val removed = expandFamilyDups(removedRep, famDupMembers)
    embs.select(col("vec_id"))
      .join(asg.select(col("vec_id"),
        try_element_at(col("cells"), lit(1)).as("cid"),
        try_element_at(col("cells"), lit(2)).as("cid2")), Seq("vec_id"), "left")
      .join(removed, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("cid2"), col("dup_of"),
        col("dup_of").isNull.cast("int").as("keep_flag"))
  }

  /** Deterministic pseudo-random hyperplanes: `tables` tables ×
    * `planes` planes × `dim` components in [-1, 1). */
  def hyperplanes(tables: Int, planes: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    var x = 4242L
    def next(): Long = {
      x += -7046029254386353131L
      var z = x
      z = (z ^ (z >>> 30)) * -4658895280553007687L
      z = (z ^ (z >>> 27)) * -7723592293110705685L
      z ^ (z >>> 31)
    }
    Seq.tabulate(tables, planes, dim) { (_, _, _) =>
      (next() >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
  }

  /** Sign-bucket an embedding table: one row per (vec_id, table, bucket)
    * where bucket packs the sign bits of the hyperplane projections. */
  def lshBuckets(embs: DataFrame, planesByTable: Seq[Seq[Seq[Double]]]): DataFrame = {
    val tableCols = planesByTable.zipWithIndex.map { case (planes, t) =>
      val bits: Seq[Column] = planes.zipWithIndex.map { case (p, i) =>
        val plane = typedlit(p)
        when(dot(col("emb"), plane) >= 0, lit(1L << i)).otherwise(lit(0L))
      }
      struct(lit(t).as("tbl"), bits.reduce(_ + _).as("bucket"))
    }
    embs.select(col("vec_id"), col("emb"), col("norm"),
        explode(array(tableCols: _*)).as("tb"))
      .select(col("vec_id"), col("emb"), col("norm"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
  }

  // ---- IVF (inverted-file) ANN ----

  /** Deterministic coarse-quantizer seeds: every `stride`-th corpus
    * vector (offset avoids id-0 artifacts). Sampled-seed IVF-flat is the
    * classic baseline; refine with [[kmeansLite]] when recall matters
    * more than reproducibility-in-SQL. */
  def seedCentroids(embs: DataFrame, stride: Int, offset: Int = 7): DataFrame = {
    // satisfiability guard (same loud-refusal contract as the hot-cell
    // guard): vec_id % stride == offset matches NOTHING when offset >=
    // stride (a strideForCells on a corpus under ~(offset+1)*cells rows
    // lands here), and the downstream search would silently return an
    // empty result the oracle cannot distinguish from a real one
    require(offset >= 0 && offset < stride,
      s"seedCentroids: offset=$offset is unsatisfiable under stride=$stride " +
        s"(vec_id % $stride == $offset matches no row); the corpus is too " +
        s"small for this cell budget — lower `cells`/`offset` or seed " +
        s"explicitly")
    embs.where(pmod(col("vec_id"), lit(stride)) === offset)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"), col("norm").as("cnorm"))
  }

  /** Stride that holds the sampled cell/codeword count at ~`cells`
    * regardless of corpus size — the scale knob the sf1 bench row
    * exposed: a CONSTANT stride grows the cell count with N and the
    * corpus×centroid assignment N²/stride (x33 ~39×, x60 ~43× for 10×
    * rows), while a fixed cell count keeps it N·cells. One count() job
    * at plan build (same contract as ivfPqSearch's dim lookup); the
    * oracle expresses the identical rule as a scalar subquery
    * (`vec_id % greatest(count(*) // cells, 1)`). The count is a data
    * property of an immutable input, memoized via [[CorpusProps]]
    * (round 17): every IVF-family query paid this job on every warm
    * and timed run — a pure per-query constant. */
  def strideForCells(embs: DataFrame, cells: Int): Int = {
    val n = CorpusProps.memo(embs, "count")(embs.count())
    math.max(1L, n / cells).toInt
  }

  /** Rounded cosine of every (vector, centroid) pair — centroids are
    * broadcast, the corpus streams.
    *
    * STARVATION GUARD (round 16 — the skew receipt's find on x21): the
    * corpus scan's partition count is governed by parquet row-group
    * splits, so a SMALL corpus file (one row group) would run the
    * entire corpus×centroid stream — the operator's dominant cost,
    * multiplied `cells`× per input row — on ONE core (measured: 10
    * stages, 15 tasks, 143 s wall at ~1.7 cores for 2e8 pairs). When
    * the scan has fewer partitions than the cluster's parallelism, the
    * corpus is spread first; the exchange ships N vector rows to buy
    * cells×N of work full-width, a trade that only triggers when the
    * input was under-split (at 100 TB the scan arrives pre-partitioned
    * and this is a no-op). */
  private def centroidSims(embs: DataFrame, centroids: DataFrame): DataFrame = {
    val par = embs.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (embs.rdd.getNumPartitions < par) embs.repartition(par) else embs
    spread.crossJoin(broadcast(centroids))
      .withColumn("csim",
        round(dot(col("emb"), col("cemb")) / (col("norm") * col("cnorm")), 6))
      .select(col("vec_id"), col("cid"), col("csim"))
  }

  /** IVF cell assignment: each vector goes to its highest-cosine
    * centroid (deterministic tie-break on the lowest centroid id,
    * via the `(csim, -cid)` ordering struct). One broadcast + ONE
    * combinable argmax aggregation — the corpus×centroid similarity
    * evaluates exactly once, and no embedding array ever shuffles. */
  def ivfAssign(embs: DataFrame, centroids: DataFrame): DataFrame =
    centroidSims(embs, centroids)
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("csim"), (-col("cid")).as("nc"))).as("cid"))

  /** IVF search: probe the `nprobe` best cells per query, then exact
    * cosine ranks the candidates within the probed cells only. */
  def ivfSearch(embs: DataFrame, centroids: DataFrame, queryIds: Seq[Long],
      k: Int, nprobe: Int = 2): DataFrame = {
    val assign = ivfAssign(embs, centroids)
    val qvecs = broadcast(embs
      .where(col("vec_id").isin(queryIds.map(x => x: Any): _*))
      .select(col("vec_id").as("qid"), col("emb").as("qemb"),
        col("norm").as("qnorm")))
    val qw = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cid"))
    val qcells = broadcast(
      centroidSims(
        embs.where(col("vec_id").isin(queryIds.map(x => x: Any): _*)), centroids)
        .withColumnRenamed("vec_id", "qid")
        .withColumn("pr", row_number().over(qw))
        .where(col("pr") <= nprobe)
        .select(col("qid"), col("cid")))
    val cands = assign.join(qcells, Seq("cid"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    val scored = cands
      .join(embs, Seq("vec_id"))
      .join(qvecs, Seq("qid"))
      .withColumn("sim",
        round(dot(col("qemb"), col("emb")) / (col("qnorm") * col("norm")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("sim"), col("rank"))
  }

  /** ANN index QUALITY evaluation: recall@k of [[ivfSearch]] against
    * the exact [[knnBrute]] ground truth on a fixed query sample — the
    * measurement that turns "the index is probably fine" into a number
    * a pipeline can gate on (recall collapsing after a re-shard or a
    * centroid refresh is the classic silent ANN regression).
    *
    * Cost shape: the ground truth is |queries|·N — LINEAR in the
    * corpus for a fixed query sample (the calibration price paid once
    * per index build), nothing like x11's all-pairs N². The exact
    * top-k is checkpointed once and feeds both the hit join and the
    * per-query spine, so the brute scan runs exactly once; the hit
    * intersection joins two k·|queries|-row sides. `recall_pct` is
    * integer (`n_hit·100 div k`) — engine-exact.
    *
    * Both rankings break sim ties on the lower neighbor id (the
    * family's total order), so recall is deterministic even when the
    * k-th place is tied. */
  def recallAtK(embs: DataFrame, centroids: DataFrame, queryIds: Seq[Long],
      k: Int, nprobe: Int = 2): DataFrame = {
    val exact = knnBrute(embs,
      embs.where(col("vec_id").isin(queryIds.map(x => x: Any): _*)), k)
      .select(col("qid"), col("neighbor_id"))
      .localCheckpoint(false)
    val approx = ivfSearch(embs, centroids, queryIds, k, nprobe)
      .select(col("qid"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("qid", "neighbor_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
    exact.select("qid").distinct()
      .join(hits, Seq("qid"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("recall_pct", expr(s"n_hit * 100L DIV ${k}L"))
      .select(col("qid"), col("n_hit"), col("recall_pct"))
  }

  /** Per-cell MEDOID selection — the member minimizing the sum of
    * squared distances to its cell — via the algebraic identity
    * `Σ_y ||x−y||² = n·||x||² − 2·x·S + Σ_y ||y||²` (S = the cell's
    * component-wise vector sum): the representative-picking step of
    * corpus summarization WITHOUT the Σ|c|² pair join that x57's
    * dedup legitimately needs. Cost is O(N·d): one assignment pass,
    * one combinable component-sum aggregation (kmeansLite's recipe),
    * one scoring pass against broadcast per-cell stats, one argmin.
    * A hot cell costs linear work here, so no cluster-size guard is
    * needed — the identity IS the guard.
    *
    * Exactness: S and Σ||y||² run through the DECIMAL(28,16)
    * accumulator (partition-order-invariant), per-row dots fold in
    * fixed array order, the score rounds to 6 dp, and the argmin's
    * `(ssd, vec_id)` struct order makes ties engine-stable — the whole
    * selection sits under the oracle gate.
    *
    * Output: (cid, n_members, medoid_id, medoid_ssd). */
  def cellMedoids(embs: DataFrame, centroids: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val members = ivfAssign(embs, centroids).join(embs, Seq("vec_id"))
      .select(col("cid"), col("vec_id"), col("emb"))
      .localCheckpoint(false)
    val comp = members
      .select(col("cid"), posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("v").cast(DecimalType(28, 16))).cast("double").as("s"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        x => x.getField("s")).as("sv"))
    val stats = members
      .select(col("cid"), dot(col("emb"), col("emb")).as("sq"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("sq").cast(DecimalType(28, 16))).cast("double").as("sumsq"))
    members
      .join(broadcast(comp), Seq("cid"))
      .join(broadcast(stats), Seq("cid"))
      .withColumn("ssd",
        round(col("n_members") * dot(col("emb"), col("emb"))
          - lit(2.0) * dot(col("emb"), col("sv")) + col("sumsq"), 6))
      .groupBy(col("cid"))
      .agg(max(col("n_members")).as("n_members"),
        min(struct(col("ssd"), col("vec_id"))).as("m"))
      .select(col("cid"), col("n_members"),
        col("m.vec_id").as("medoid_id"), col("m.ssd").as("medoid_ssd"))
  }

  /** Lloyd refinement of a centroid set: `iters` rounds of assign →
    * element-wise re-average, fully distributed (posexplode + one
    * combinable groupBy per round; centroids stay broadcast-sized).
    * Cells that lose all members drop out; surviving cells keep their
    * ids. The component sums go through an exact DECIMAL accumulator,
    * so the refined centroids are bit-identical regardless of partition
    * order (double summation is association-sensitive) — which both
    * makes reruns reproducible at any parallelism and puts the whole
    * refinement inside the oracle gate (x26). */
  def kmeansLite(embs: DataFrame, initial: DataFrame, iters: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    var centroids = initial
    (0 until iters).foreach { _ =>
      val assign = ivfAssign(embs, centroids)
      val members = assign.join(embs, Seq("vec_id"))
      val avg = members
        .select(col("cid"), posexplode(col("emb")).as(Seq("pos", "v")))
        .groupBy("cid", "pos").agg(
          sum(col("v").cast(DecimalType(28, 16))).cast("double").as("s"),
          count(lit(1)).as("n"))
        .withColumn("m", col("s") / col("n"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cemb"))
      // materialize each round (centroids are broadcast-sized): without
      // this, iteration i's plan re-derives every previous iteration's
      // full-corpus assignment — quadratic recompute in `iters`
      centroids = avg
        .withColumn("cnorm", l2Norm(col("cemb")))
        .select(col("cid"), col("cemb"), col("cnorm"))
        .localCheckpoint(true)
    }
    centroids
  }

  /** Scalar int8 quantization of an embedding column: per-vector
    * symmetric scale (`max|v| / 127`), codes in [-127, 127] — the 4×
    * storage/bandwidth cut that makes a 100 TB embedding corpus
    * shuffle-able and cache-resident, with the reconstruction error
    * REPORTED per vector instead of assumed (`max_abs_err` =
    * max |v − q·scale|, 6 dp). An all-zero vector quantizes to all-zero
    * codes with scale 0 and error 0 (no div-by-zero path).
    *
    * Pure per-row column math — zero shuffle, codegen'd lambdas, and
    * every step (division, HALF_UP round, clamp) is reproducible in
    * ANSI SQL, so the codes themselves sit under the oracle gate.
    * Output: (vec_id, scale, qemb array<int>, max_abs_err). */
  def quantizeInt8(embs: DataFrame): DataFrame = {
    val maxAbs = array_max(transform(col("emb"), v => abs(v)))
    val scale = (maxAbs / 127.0).as("scale")
    embs.select(col("vec_id"), col("emb"), scale)
      .withColumn("qemb",
        when(col("scale") === 0.0,
          transform(col("emb"), _ => lit(0)))
          .otherwise(transform(col("emb"), v =>
            least(greatest(round(v / col("scale"), 0), lit(-127.0)), lit(127.0))
              .cast("int"))))
      .withColumn("max_abs_err",
        round(array_max(zip_with(col("emb"), col("qemb"),
          (v, q) => abs(v - q.cast("double") * col("scale")))), 6))
      .select("vec_id", "scale", "qemb", "max_abs_err")
  }

  // ---- PQ (product quantization) ANN ----

  /** PQ codebooks: subspace `s` of `m` gets the stride-sampled corpus
    * SUBvectors as its codewords — `(sub, cid, cemb)`, broadcast-sized
    * by construction (the deterministic sampled-codebook baseline, like
    * [[seedCentroids]]; swap in kmeansLite-refined subspace codebooks
    * when recall matters more than SQL-reproducibility). */
  def pqCodebooks(embs: DataFrame, m: Int, dim: Int, stride: Int,
      offset: Int = 7): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    // same satisfiability guard as seedCentroids: an unsatisfiable
    // sampling predicate yields ZERO codewords and an empty search
    require(offset >= 0 && offset < stride,
      s"pqCodebooks: offset=$offset is unsatisfiable under stride=$stride " +
        s"(vec_id % $stride == $offset matches no row) — lower `cells`/" +
        s"`offset` or supply refined codebooks")
    val d = dim / m
    val subs = (0 until m).map(s =>
      struct(lit(s).as("sub"), slice(col("emb"), s * d + 1, d).as("cemb")))
    embs.where(pmod(col("vec_id"), lit(stride)) === offset)
      .select(col("vec_id").as("cid"), explode(array(subs: _*)).as("c"))
      .select(col("cid"), col("c.sub").as("sub"), col("c.cemb").as("cemb"))
  }

  /** PQ encoding: per (vector, subspace), the max-dot codeword
    * (deterministic tie-break on the lowest codeword id). The codes
    * table is the whole point at 100 TB: m small ints per vector
    * instead of the full embedding — the corpus compresses ~64× and
    * scoring never touches the vectors. One broadcast + one combinable
    * argmax, same shape as [[ivfAssign]]. */
  def pqEncode(embs: DataFrame, codebooks: DataFrame, m: Int, dim: Int): DataFrame = {
    val d = dim / m
    val subs = (0 until m).map(s =>
      struct(lit(s).as("sub"), slice(col("emb"), s * d + 1, d).as("semb")))
    embs.select(col("vec_id"), explode(array(subs: _*)).as("x"))
      .select(col("vec_id"), col("x.sub").as("sub"), col("x.semb").as("semb"))
      .join(broadcast(codebooks), Seq("sub"))
      .withColumn("psim", round(dot(col("semb"), col("cemb")), 6))
      .groupBy("vec_id", "sub")
      .agg(max_by(col("cid"), struct(col("psim"), (-col("cid")).as("nc"))).as("code"))
  }

  /** PQ-ADC search: approximate score = Σ_subspace (query·codeword)
    * looked up from a broadcast table, then exact cosine re-ranks the
    * top `rerank`·k approximate candidates only. The per-subspace
    * partials are 6-dp-rounded and summed through DECIMAL, so the
    * approximate ranking is bit-stable at any parallelism (and in the
    * oracle engine). */
  def pqSearch(embs: DataFrame, queryIds: Seq[Long], k: Int,
      m: Int = 4, stride: Int = 50, rerank: Int = 3): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dim = embs.select(size(col("emb"))).head().getInt(0)
    val d = dim / m
    val cb = pqCodebooks(embs, m, dim, stride)
    val codes = pqEncode(embs, cb, m, dim)
    val qvecs = broadcast(embs
      .where(col("vec_id").isin(queryIds.map(x => x: Any): _*))
      .select(col("vec_id").as("qid"), col("emb").as("qemb"),
        col("norm").as("qnorm")))
    val qtable = broadcast(qvecs.crossJoin(cb)
      .withColumn("psim",
        round(dot(slice(col("qemb"), col("sub") * lit(d) + 1, lit(d)), col("cemb")), 6))
      .select(col("qid"), col("sub"), col("cid").as("code"), col("psim")))
    val approx = codes.join(qtable, Seq("sub", "code"))
      .where(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id")
      .agg(sum(col("psim").cast(DecimalType(18, 6))).cast("double").as("approx_sim"))
    val aw = Window.partitionBy(col("qid")).orderBy(col("approx_sim").desc, col("vec_id"))
    val cands = approx.withColumn("ar", row_number().over(aw))
      .where(col("ar") <= rerank * k)
      .select("qid", "vec_id")
    val scored = cands
      .join(embs, Seq("vec_id"))
      .join(qvecs, Seq("qid"))
      .withColumn("sim",
        round(dot(col("qemb"), col("emb")) / (col("qnorm") * col("norm")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("sim"), col("rank"))
  }

  /** IVF-PQ: the production ANN composite — IVF bounds WHICH vectors are
    * candidates (only the `nprobe` best cells per query), PQ-ADC bounds
    * the BYTES touched per candidate (m small codes + a broadcast
    * lookup table, never the vector), and the exact cosine re-rank of
    * the top `rerank`·k bounds the approximation error. Full embeddings
    * are touched for exactly rerank·k rows per query; everything else
    * runs on cell ids and codes.
    *
    * Same deterministic ingredients as x21/x33 (stride-sampled
    * centroids and codebooks, 6-dp rounding, DECIMAL partial sums,
    * lowest-id tie-breaks), so the composite stays bit-reproducible and
    * oracle-checkable. */
  def ivfPqSearch(embs: DataFrame, centroids: DataFrame, queryIds: Seq[Long],
      k: Int, nprobe: Int = 2, m: Int = 4, stride: Int = 50,
      rerank: Int = 3, dim: Int = -1): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // dim defaults to the data's own dimensionality (one-row lookup at
    // plan-build time, same contract as knnLsh); pass it explicitly to
    // skip the lookup. Empty corpus → clear error, not a bare
    // NoSuchElementException from head().
    val dimR =
      if (dim > 0) dim
      else embs.select(size(col("emb"))).limit(1).collect().headOption
        .map(_.getInt(0))
        .getOrElse(throw new IllegalArgumentException(
          "ivfPqSearch: empty embeddings input and no explicit dim"))
    val d = dimR / m
    // IVF half: cell assignment + the query's probed cells. The filtered
    // query rows feed TWO consumers (qvecs and the probe's centroidSims)
    // — checkpoint the |queryIds|-sized frame once instead of scanning
    // the corpus for it twice.
    val assign = ivfAssign(embs, centroids)
    val qrows = embs
      .where(col("vec_id").isin(queryIds.map(x => x: Any): _*))
      .localCheckpoint(true)
    val qvecs = broadcast(qrows
      .select(col("vec_id").as("qid"), col("emb").as("qemb"),
        col("norm").as("qnorm")))
    val qw = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cid"))
    val qcells = broadcast(
      centroidSims(qrows, centroids)
        .withColumnRenamed("vec_id", "qid")
        .withColumn("pr", row_number().over(qw))
        .where(col("pr") <= nprobe)
        .select(col("qid"), col("cid")))
    val cands = assign.join(qcells, Seq("cid"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    // PQ half: corpus-wide codes (the precomputed index at scale) +
    // broadcast query lookup table; ADC scores the IVF candidates only
    val cb = pqCodebooks(embs, m, dimR, stride)
    val codes = pqEncode(embs, cb, m, dimR)
    val qtable = broadcast(qvecs.crossJoin(cb)
      .withColumn("psim",
        round(dot(slice(col("qemb"), col("sub") * lit(d) + 1, lit(d)), col("cemb")), 6))
      .select(col("qid"), col("sub"), col("cid").as("code"), col("psim")))
    val approx = cands.join(codes, Seq("vec_id"))
      .join(qtable, Seq("qid", "sub", "code"))
      .groupBy("qid", "vec_id")
      .agg(sum(col("psim").cast(DecimalType(18, 6))).cast("double").as("approx_sim"))
    val aw = Window.partitionBy(col("qid")).orderBy(col("approx_sim").desc, col("vec_id"))
    val top = approx.withColumn("ar", row_number().over(aw))
      .where(col("ar") <= rerank * k)
      .select("qid", "vec_id")
    val scored = top
      .join(embs, Seq("vec_id"))
      .join(qvecs, Seq("qid"))
      .withColumn("sim",
        round(dot(col("qemb"), col("emb")) / (col("qnorm") * col("norm")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("sim"), col("rank"))
  }

  /** Approximate top-k: candidates share an LSH bucket with the query in
    * at least one table; exact cosine ranks the candidates.
    *
    * `dim` defaults to the data's own dimensionality (one-row lookup at
    * plan-build time — NOT a per-row collect); pass it explicitly to
    * skip that lookup. Candidate dedup happens on bare (qid, vec_id)
    * ids — the vectors are re-joined afterwards, so the distinct never
    * shuffles embedding arrays. */
  def knnLsh(embs: DataFrame, queryIds: Seq[Long], k: Int,
      tables: Int = 4, planes: Int = 8, dim: Int = -1): DataFrame = {
    val d =
      if (dim > 0) dim
      else embs.select(size(col("emb"))).head().getInt(0)
    val hp = hyperplanes(tables, planes, d)
    val buckets = lshBuckets(embs, hp)
    val qvecs = broadcast(embs
      .where(col("vec_id").isin(queryIds.map(x => x: Any): _*))
      .select(col("vec_id").as("qid"), col("emb").as("qemb"),
        col("norm").as("qnorm")))
    val qb = broadcast(buckets
      .where(col("vec_id").isin(queryIds.map(x => x: Any): _*))
      .select(col("tbl"), col("bucket"), col("vec_id").as("qid")))
    val cands = buckets.join(qb, Seq("tbl", "bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
      .distinct()
    val scored = cands
      .join(embs, Seq("vec_id"))
      .join(qvecs, Seq("qid"))
      .withColumn("sim",
        round(dot(col("qemb"), col("emb")) / (col("qnorm") * col("norm")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("sim"), col("rank"))
  }

  /** Pairwise cosine similarity between SLICE centroids (slice = any
    * corpus partition key: language, source, time bucket) — the
    * embedding-drift matrix. Two slices whose centroids diverge
    * (csim ≪ 1) embed different content; a new crawl slice drifting
    * from its predecessor is the retrain/contamination signal.
    *
    * 100 TB posture: the corpus collapses to |slices|·dim rows in one
    * combinable DECIMAL groupBy ([[labelCentroids]]); the pair matrix
    * is a BROADCAST self-join over |slices| rows (a<b, no diagonal).
    * Cosine arithmetic and 6-dp rounding follow [[classOutliers]]'s
    * oracle-exact contract. Output: (slice_a, slice_b, n_a, n_b, csim). */
  def sliceCentroidSim(df: DataFrame, slice: Column, emb: Column): DataFrame = {
    val cents = labelCentroids(df, slice, emb)
    val counts = df.select(slice.as("label")).groupBy("label")
      .agg(count(lit(1)).as("n"))
    val c = cents.join(counts, Seq("label"))
      .select(col("label"), col("cemb"), col("cnorm"), col("n"))
      .localCheckpoint(false) // |slices| rows, consumed by both join sides
    val a = c.select(col("label").as("slice_a"), col("cemb").as("ea"),
      col("cnorm").as("na"), col("n").as("n_a"))
    val b = c.select(col("label").as("slice_b"), col("cemb").as("eb"),
      col("cnorm").as("nb"), col("n").as("n_b"))
    a.join(broadcast(b), col("slice_a") < col("slice_b"))
      .select(col("slice_a"), col("slice_b"), col("n_a"), col("n_b"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("csim"))
  }

  /** MRR evaluation of the LSH index against brute-force ground truth —
    * [[knnLsh]] vs [[knnBrute]], rank-SENSITIVE where x84's recall@k is
    * rank-blind: a retrieval stack cares whether the true nearest
    * neighbor surfaces FIRST, not merely somewhere in the top-k.
    * Reciprocal ranks ride exact fixed point (1e6 DIV rank — both
    * engines truncate identically), a miss scores 0; the one-row
    * report carries hit@1, hit@k, the RR sum, and its floor mean.
    *
    * 100 TB posture: both sides are the already-audited plans (LSH
    * bucket join; brute is |queries|·N with the broadcast query slice)
    * over a FIXED query sample — the eval cost scales with the corpus,
    * never with corpus². The truth↔approx join is |queries| rows,
    * broadcast. Output: (n_queries, n_hit1, n_hitk, mrr_sum_e6,
    * mrr_mean_e6). */
  def annMrr(embs: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val approx = knnLsh(embs, queryIds, k)
      .select(col("qid"), col("neighbor_id"), col("rank"))
    val truth = knnBrute(embs,
        embs.where(col("vec_id").isin(queryIds.map(x => x: Any): _*)), k = 1)
      .select(col("qid"), col("neighbor_id").as("tid"))
    truth.join(broadcast(approx),
        truth("qid") === approx("qid") && col("tid") === col("neighbor_id"),
        "left")
      .select(truth("qid"),
        coalesce(expr("1000000 DIV rank"), lit(0L)).as("rr_e6"),
        when(col("rank") === 1, 1L).otherwise(0L).as("h1"),
        when(col("rank").isNotNull, 1L).otherwise(0L).as("hk"))
      .agg(count(lit(1)).as("n_queries"), sum(col("h1")).as("n_hit1"),
        sum(col("hk")).as("n_hitk"), sum(col("rr_e6")).as("mrr_sum_e6"))
      .withColumn("mrr_mean_e6", expr("mrr_sum_e6 DIV n_queries"))
  }

  /** Average Precision at k of label-match retrieval — the third leg of
    * the retrieval-eval triad: x84's recall@k is rank-blind, x206's MRR
    * sees only the FIRST relevant hit, AP integrates precision over
    * every relevant position. Ranking = exact cosine top-k
    * ([[knnBrute]]'s audited contract: 6-dp-rounded sim, id tiebreak);
    * a neighbor is RELEVANT when it carries the query's label.
    * ap_e6 = (Σ_{rank i relevant} relcum_i·1e6 DIV i) DIV R with
    * R = min(n_label − 1, k) — the classic AP@k denominator; each
    * precision term floors independently (both engines truncate
    * identically), a query whose label has no other member reads NULL.
    *
    * 100 TB posture: the ranking is the already-audited broadcast-query
    * brute plan over a FIXED query sample — eval cost is corpus-linear,
    * never corpus². Everything after lives on |queries|·k rows. Only
    * BOUNDED tables are broadcast: the |labels|-row count table and the
    * query-side label slice (filtered to queryIds BEFORE the hint —
    * |queries| rows). The neighbor-side vec_id→label map is
    * corpus-cardinality, so it joins UNHINTED, keyed on the |queries|·k
    * ranked rows (the recallAtK shape) — the planner may still
    * broadcast it when it measures small, but nothing cements a
    * corpus-size broadcast at scale (round-11 ADVICE fix, x221-pinned).
    * The per-qid cumsum window is |queries| partitions of k rows.
    * Output per query: (qid, label, n_rel_topk, ap_e6). */
  def annMap(embs: DataFrame, labels: DataFrame, queryIds: Seq[Long],
      k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"k=$k out of range")
    val lab = labels.select(col("vec_id"), col("label"))
    val labN = broadcast(lab.groupBy("label").agg(count(lit(1)).as("n_label")))
    val qLab = broadcast(
      lab.where(col("vec_id").isin(queryIds.map(x => x: Any): _*))
        .select(col("vec_id").as("qid"), col("label")))
    val ranked = knnBrute(embs,
        embs.where(col("vec_id").isin(queryIds.map(x => x: Any): _*)), k)
      .join(lab.select(col("vec_id").as("neighbor_id"),
        col("label").as("nlabel")), Seq("neighbor_id"))
      .join(qLab, Seq("qid"))
      .withColumn("rel", when(col("nlabel") === col("label"), 1L).otherwise(0L))
    val w = Window.partitionBy(col("qid")).orderBy(col("rank"))
    ranked
      .withColumn("relcum", sum(col("rel")).over(w))
      .groupBy(col("qid"), col("label"))
      .agg(sum(col("rel")).as("n_rel_topk"),
        sum(when(col("rel") === 1L,
          expr("relcum * 1000000L DIV rank")).otherwise(0L)).as("apsum"))
      .join(labN, Seq("label"))
      .select(col("qid"), col("label"), col("n_rel_topk"),
        expr(s"CASE WHEN least(n_label - 1, ${k}L) > 0 " +
          s"THEN apsum DIV least(n_label - 1, ${k}L) ELSE NULL END")
          .as("ap_e6"))
  }

  /** Truncated-dimension retrieval agreement — the Matryoshka question:
    * if the index keeps only the FIRST `dims` components (the MRL
    * serving trick: one stored vector, many effective sizes), how much
    * of the full-dimension top-k survives? Both rankings are the
    * audited [[knnBrute]] contract (6-dp-rounded cosine, id tiebreak)
    * over the SAME query sample; agreement is exact set overlap —
    * overlap_ppm = |full ∩ trunc|·1e6 DIV k per query. The truncated
    * side renormalizes over its own prefix (slice + fresh norm), as a
    * real truncated index would.
    *
    * 100 TB posture: two corpus-linear broadcast-query brute scans (the
    * eval runs on a FIXED query sample, never corpus²); the overlap
    * join lives on |queries|·k rows. Output per query:
    * (qid, n_common, overlap_ppm). */
  def truncationAgreement(embsRaw: DataFrame, id: Column, emb: Column,
      queryIds: Seq[Long], k: Int, dims: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"k=$k out of range")
    require(dims >= 1, s"dims=$dims must be >= 1")
    val full = withNorm(embsRaw, id, emb)
    val trunc = withNorm(embsRaw, id, slice(emb, 1, dims))
    def topk(e: DataFrame) = knnBrute(e,
      e.where(col("vec_id").isin(queryIds.map(x => x: Any): _*)), k)
      .select(col("qid"), col("neighbor_id"))
    // left join (not semi) so a zero-overlap query still reports 0
    topk(full)
      .join(topk(trunc).withColumn("m", lit(1L)),
        Seq("qid", "neighbor_id"), "left")
      .groupBy("qid").agg(sum(coalesce(col("m"), lit(0L))).as("n_common"))
      .select(col("qid"), col("n_common"),
        expr(s"n_common * 1000000L DIV ${k}L").as("overlap_ppm"))
  }
}
