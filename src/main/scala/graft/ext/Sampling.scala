package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample` is non-reproducible: a retried stage, a different
  * partition count, or a different engine version yields a DIFFERENT
  * corpus — poison for dataset lineage. Hash sampling keys the
  * keep/drop decision on the md5-derived 60-bit hash of the row's id:
  * the same row decides the same way on any cluster on any day, the
  * sample composes with incremental reruns, and the whole decision is
  * reproducible in ANSI SQL (oracle-checkable).
  *
  * 100 TB posture: a pure scan-side filter — zero shuffle, pushes
  * nothing anywhere, scales embarrassingly with partitions.
  */
object Sampling {

  /** Uniform bucket in [0, 10000) from the key's md5 (rate resolution
    * 0.01%).
    *
    * NULL keys: the bucket of a NULL key is NULL, so every `where`
    * built on it DROPS rows with a NULL key — deterministically (the
    * same row always decides the same way: out), and in exact parity
    * with the ANSI oracle form, where `md5(NULL)` is NULL and a NULL
    * comparison never keeps. Callers sampling a corpus with nullable
    * ids who want NULLs kept must supply an explicit surrogate key
    * (e.g. `coalesce(id, fallback)`); a silent built-in sentinel would
    * diverge from the documented SQL contract. */
  def hashBucket(key: Column): Column =
    pmod(Dedup.md5Hash60(key.cast("string")), lit(10000L))

  /** Keep a deterministic `rate` fraction of rows, keyed on `key`. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.where(hashBucket(key) < lit(math.round(rate * 10000)))

  /** Per-stratum rates with a default — e.g. downsample the dominant
    * language, keep tail languages whole. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], default: Double): DataFrame = {
    val rate = rates.foldLeft(lit(math.round(default * 10000)): Column) {
      case (acc, (s, r)) => when(stratum === s, lit(math.round(r * 10000))).otherwise(acc)
    }
    df.where(hashBucket(key) < rate)
  }

  /** Weight-proportional Bernoulli sample: each row keeps with
    * probability `rate10k/10000` where `rate10k` is any integer column
    * in [0, 10000] (e.g. a quality score mapped to a keep rate) — the
    * standard quality-weighted corpus mix. Same determinism story as
    * [[hashSample]], and the comparison is pure integer arithmetic, so
    * parity holds exactly on any engine. */
  def weightedBernoulli(df: DataFrame, key: Column, rate10k: Column): DataFrame =
    df.where(hashBucket(key) < least(greatest(rate10k, lit(0L)), lit(10000L)))

  /** Leakage-free train/val/test split: every row in the same
    * equivalence GROUP lands wholly in one split, because the hash
    * decision is keyed on the group's REPRESENTATIVE (min id), not the
    * row — near-identical documents can never straddle train and test,
    * the classic eval-contamination leak a row-keyed split invites.
    * The group is any equivalence the caller proves: the exact-dup
    * normalization key (x58's nfp), a near-dup cluster label from
    * [[Dedup.connectedComponents]], a source domain.
    *
    * `boundaries` are (name, cumulative-upper-bucket) pairs over the
    * [0, 10000) hash space, strictly increasing and ending at 10000 —
    * e.g. `("train",8000),("val",9000),("test",10000)` is 80/10/10.
    *
    * 100 TB posture: one combinable min-agg to group cardinality, one
    * equi-join back (AQE-broadcast when groups are small); the split
    * decision itself is scan-side integer arithmetic, deterministic on
    * any cluster (same md5 contract as [[hashBucket]]).
    * Output: `(id, grp, rep_id, bucket, split)`. */
  def leakageFreeSplit(df: DataFrame, id: Column, group: Column,
      boundaries: Seq[(String, Long)] =
        Seq(("train", 8000L), ("val", 9000L), ("test", 10000L))): DataFrame = {
    require(boundaries.nonEmpty && boundaries.last._2 == 10000L,
      s"boundaries must end at 10000, got $boundaries")
    require(boundaries.map(_._2) == boundaries.map(_._2).sorted &&
        boundaries.map(_._2).distinct.size == boundaries.size &&
        boundaries.head._2 > 0,
      s"boundaries must be strictly increasing in (0, 10000], got $boundaries")
    val reps = df.select(group.as("grp"), id.as("id"))
      .groupBy(col("grp")).agg(min(col("id")).as("rep_id"))
    val split = boundaries.init.foldRight(lit(boundaries.last._1): Column) {
      case ((name, ub), acc) => when(col("bucket") < ub, lit(name)).otherwise(acc)
    }
    df.select(id.as("id"), group.as("grp"))
      .join(reps, Seq("grp"))
      .withColumn("bucket", hashBucket(col("rep_id")))
      .select(col("id"), col("grp"), col("rep_id"), col("bucket"),
        split.as("split"))
  }

  /** Token-budget corpus mixing: given a TOTAL token budget and target
    * mixture weights per source, derive each source's deterministic
    * keep-rate and flag every document — the "data mixing" step that
    * turns N raw sources into one pretraining corpus with a prescribed
    * composition.
    *
    * Per source s: target tokens `T_s = budget * w10k_s / 10000`, keep
    * rate `rate10k_s = min(10000, T_s * 10000 / tok_s)` — sources with
    * less mass than their target keep everything (rate caps at 10000),
    * over-represented sources downsample toward their share. ALL rate
    * arithmetic is BIGINT division (`DIV`), never float: the computed
    * rates are bit-identical in any ANSI engine, so the whole mix is
    * oracle-checkable and a rerun anywhere reproduces the same corpus
    * (the [[hashBucket]] determinism story, lifted to mixture level).
    *
    * Output: (doc_id, source, n_tokens, rate10k, keep_flag) — one row
    * per input doc; the kept corpus is `keep_flag = 1`.
    *
    * 100 TB posture: token counts are computed scan-side, the
    * per-source totals are a map-side-combinable agg over a
    * source-cardinality-sized frame, and the rates broadcast back —
    * the corpus itself NEVER shuffles; the keep decision is a
    * scan-side predicate. */
  def tokenBudgetMix(docs: DataFrame, id: Column, source: Column, text: Column,
      budgetTokens: Long, weights10k: Map[String, Long],
      defaultWeight10k: Long): DataFrame = {
    // budget * w10k must stay inside Long (w10k <= 10000): the BIGINT
    // arithmetic the determinism story depends on has a ~9.2e14-token
    // ceiling (≈ 40x a 100 TB text corpus) — refuse loudly above it
    // rather than throwing an ANSI overflow mid-job
    require(budgetTokens >= 0 && budgetTokens < Long.MaxValue / 10000L,
      s"budgetTokens=$budgetTokens exceeds the exact-arithmetic ceiling " +
        s"(${Long.MaxValue / 10000L}); denominate the budget in tokens, not bytes")
    (weights10k.values.toSeq :+ defaultWeight10k).foreach(w =>
      require(w >= 0 && w <= 10000L, s"mixture weight $w outside [0, 10000]"))
    val d = docs.select(id.as("doc_id"), source.as("source"),
      TextAnalysis.wsTokenCount(text).cast("long").as("n_tokens"))
    val w = weights10k.foldLeft(lit(defaultWeight10k): Column) {
      case (acc, (s, v)) => when(col("source") === s, lit(v)).otherwise(acc)
    }
    val rates = d.groupBy("source").agg(sum(col("n_tokens")).as("tok"))
      .withColumn("w10k", w)
      // integer division end-to-end; an empty source (tok=0) keeps
      // nothing rather than tripping ANSI div-by-zero
      .withColumn("rate10k",
        when(col("tok") === 0, lit(0L)).otherwise(
          least(lit(10000L),
            expr(s"(($budgetTokens DIV 1) * w10k DIV 10000) * 10000 DIV tok"))))
      .select("source", "rate10k")
    d.join(broadcast(rates), Seq("source"))
      .withColumn("keep_flag", (hashBucket(col("doc_id")) < col("rate10k")).cast("int"))
      .select("doc_id", "source", "n_tokens", "rate10k", "keep_flag")
  }

  /** Temperature-scaled mixture weights (α-sampling as in multilingual
    * pretraining): weight_s ∝ n_s^α with α = 0.5, flattening the source
    * distribution between proportional (α=1) and uniform (α→0) — the
    * knob that stops a dominant source from drowning the tail, computed
    * FROM the data (where [[tokenBudgetMix]] consumes given weights).
    *
    * α is pinned to 0.5 because `sqrt` is the one power IEEE 754
    * requires correctly rounded — `pow(x, α)` for general α carries no
    * such guarantee and would tie the oracle to one libm's last ulp.
    * The weight normalization sums the 8-dp-rounded √n values through
    * an exact DECIMAL(28,8) accumulator (order-free; exact-conversion
    * envelope holds to ~2^53/1e8 ≈ 9e7 per-source √tokens ≈ 8e15 tokens
    * per source — beyond any real corpus).
    *
    * 100 TB posture: token counts scan-side, one map-combinable agg to
    * a source-cardinality frame, the normalizer a broadcast single row.
    * Output: `(source, n_tokens, w_alpha, weight, target_tokens)`. */
  def temperatureWeights(docs: DataFrame, id: Column, source: Column,
      text: Column, budgetTokens: Long): DataFrame = {
    val d = docs.select(id.as("doc_id"), source.as("source"),
      TextAnalysis.wsTokenCount(text).cast("long").as("n_tokens"))
    val per = d.groupBy("source").agg(sum(col("n_tokens")).as("tok"))
    val withW = per.withColumn("w_alpha", round(sqrt(col("tok").cast("double")), 8))
    val tot = withW.agg(
      sum(col("w_alpha").cast(DecimalType(28, 8))).cast("double").as("wsum"))
    withW.crossJoin(broadcast(tot))
      .withColumn("weight", round(col("w_alpha") / col("wsum"), 8))
      .withColumn("target_tokens",
        floor(col("weight") * lit(budgetTokens.toDouble)).cast("long"))
      .select(col("source"), col("tok").as("n_tokens"), col("w_alpha"),
        col("weight"), col("target_tokens"))
  }

  /** Two-phase per-stratum hash rank — the scale-safe core under
    * [[takePerStratum]] and [[distributionMatch]]. A plain
    * `row_number() OVER (PARTITION BY stratum ORDER BY md5)` caps the
    * rank's parallelism at the STRATUM CARDINALITY: a ≤63-bin length
    * profile over a 100 TB pool sorts multi-TB bins in single tasks.
    * Instead the rank decomposes exactly like `Batching.withBatches` /
    * `Profile.winsorizedStats`: one range-partitioned sort on
    * (stratum, hash, key) — a fat stratum SPANS partitions — then
    * per-(partition, stratum) counts to the driver (O(partitions ×
    * strata) rows, loud refusal past 2^20), broadcast prefix offsets,
    * and a (partition, stratum)-local rank window. No plan stage ever
    * partitions corpus-scale data by the bare stratum.
    *
    * Strata are bookkept by an injective string shadow ("n:" for NULL,
    * "v:" + canonical string otherwise) so a NULL stratum is its own
    * rank group (same behavior as SQL's PARTITION BY) and distinct
    * values can't collide with the sentinel. NULLS LAST explicitly on
    * both rank keys: Spark's ASC default is nulls-first while ANSI
    * engines commonly default nulls-last — a NULL key must not claim a
    * budget slot differently per engine.
    *
    * `localCheckpoint` pins ONE sort: the offsets job and the rank job
    * must see identical partition boundaries (range boundaries are
    * sampled — nondeterministic across jobs), the same discipline as
    * [[Profile.globalRank]].
    *
    * Output: the input columns + `__s` (the stratum) + `__rn` (LONG
    * 1-based rank within stratum by (md5Hash60(key), key) asc). */
  private def stratumHashRank(df: DataFrame, stratum: Column,
      key: Column): DataFrame =
    StratumRank.rank(df, stratum,
      Seq(Dedup.md5Hash60(key.cast("string")), key))

  /** Deterministic fixed-BUDGET sampling: keep at most `n` rows per
    * stratum, chosen by md5-hash order (tie: key) — "cap every language
    * at N docs" corpus balancing, where [[stratifiedSample]]'s per-RATE
    * form can't hit an exact count. Same reproducibility story: the
    * hash order is a property of the rows, not the cluster.
    *
    * 100 TB posture: the rank runs through [[stratumHashRank]]'s
    * two-phase decomposition — parallelism is the cluster's partition
    * count, NOT the stratum cardinality, so a pathological mega-stratum
    * (one language owning half the corpus) sorts across the cluster
    * instead of inside one task. */
  def takePerStratum(df: DataFrame, stratum: Column, key: Column,
      n: Int): DataFrame =
    stratumHashRank(df, stratum, key)
      .where(col("__rn") <= n).drop("__rn", "__s")

  /** Distribution-matched sampling — make a pool source LOOK LIKE a
    * target source along a stratum (the pretraining-curation move when
    * mixing corpora whose, e.g., length profiles differ: naive mixing
    * shifts the blend's distribution toward the bigger source; matched
    * sampling takes from the pool EXACTLY the target's per-stratum
    * histogram). Per stratum, quota = the target's row count there;
    * the pool contributes its `quota` rows with the smallest
    * deterministic hash (the [[takePerStratum]] pick rule — md5 order,
    * key tie-break, NULLS LAST), so the selection is reproducible on
    * any engine and unbiased w.r.t. anything correlated with position.
    * Pool strata the target never exhibits are dropped entirely;
    * strata where the pool is short contribute what they have (the
    * residual deficit is the caller's signal to widen the pool).
    * NULL strata are EXCLUDED from matching on both sides (filtered
    * explicitly, not dropped by join accident): a NULL bin is a
    * measurement failure, not a distribution feature — callers who
    * mean "unknown" as a stratum must supply a surrogate value.
    *
    * 100 TB posture: the quota table is stratum-cardinality rows
    * (log2-length bins ≤ 63, language ids, …) — broadcast; the pool's
    * rank runs through [[stratumHashRank]]'s two-phase decomposition,
    * so the selection's parallelism is the cluster's partition count,
    * NOT the ≤63-bin stratum cardinality — no single-task multi-TB bin
    * sorts at any scale. `matched_rank` is LONG on purpose: the quota
    * bound is the target stratum's row count, which exceeds
    * Int.MaxValue at the documented scale.
    * Output: the selected pool rows + (stratum, matched_rank). */
  def distributionMatch(target: DataFrame, pool: DataFrame,
      stratum: Column, key: Column): DataFrame = {
    val quotas = broadcast(target.where(stratum.isNotNull)
      .groupBy(stratum.as("__s"))
      .agg(count(lit(1)).as("__quota")))
    stratumHashRank(pool.where(stratum.isNotNull), stratum, key)
      .join(quotas, Seq("__s"))
      .where(col("__rn") <= col("__quota"))
      .drop("__quota")
      .withColumnRenamed("__s", "stratum")
      // LONG on purpose: the quota bound is the target stratum's row
      // count, which exceeds Int.MaxValue at the documented scale
      .withColumn("matched_rank", col("__rn"))
      .drop("__rn")
  }

  /** Rendezvous (highest-random-weight) shard assignment: the row goes
    * to `argmax over s in [0, shards) of h(key, s)` (Thaler/Ravishankar
    * 1996) — the consistent-placement scheme behind bounded-load
    * sharded writes. The property a plain `hash(key) % shards` lacks:
    * growing `shards` by one moves only ~1/(shards+1) of rows (a row
    * moves ONLY if the new shard's hash wins its rendezvous), so a
    * resize re-shuffles a sliver of the corpus instead of nearly all
    * of it.
    *
    * Determinism: the per-candidate hash is the family's md5-derived
    * 60-bit value over `key || ':' || s` (same contract as
    * [[hashBucket]]), a hash tie falls to the larger shard id via the
    * struct comparison — a total order with no engine-varying
    * tie-break.
    *
    * 100 TB posture: pure scan-side arithmetic — `shards` codegen'd
    * md5s per row (a `greatest` over literal-seeded structs, no
    * higher-order lambda), zero shuffle, zero state. The linear-in-
    * shards cost is the standard HRW trade; cap at 4096 where a
    * two-level rendezvous (groups, then members) takes over. */
  /** DSIR-style target-affinity scoring (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how target-like its HASHED bigram features are,
    * so a quality/domain slice can be up-weighted by importance
    * resampling. DSIR's log-weight `Σ count(f)·log(p_tgt(f)/p_raw(f))`
    * becomes the family's rational surrogate: each feature carries
    * `r(f) = ⌊scale·(c_tgt(f)+1)/(c_all(f)+1)⌋` (add-one smoothed, no
    * IEEE log) and the doc score is the n_occ-weighted integer mean of
    * `r` over its features — the arithmetic-mean analogue of the
    * geometric importance weight, monotone in "my features look like
    * the target's" and engine-exact.
    *
    * The HASHING is the scale move (straight from the paper): features
    * are `md5(bigram) mod buckets`, so the feature-count table is
    * AT MOST `buckets` rows no matter how large the vocabulary — the
    * join-back is a guaranteed broadcast at any corpus size, and the
    * only corpus-scale exchanges are the two combinable counting
    * aggregations (same checkpoint-once discipline as the bigram LM).
    *
    * Overflow envelope: `(c_tgt+1)·scale ≤ 2^63` → total target-slice
    * bigrams ≤ ~9.2e10 at the default scale (x78's rule).
    *
    * Output: (doc_id, n_feats, dsir_score). */
  def dsirAffinity(docs: DataFrame, id: Column, text: Column,
      inTarget: Column, buckets: Int = 4096,
      scale: Long = 100000000L): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 22),
      s"buckets must be in [2, 2^22], got $buckets")
    require(scale >= 1, s"scale must be positive, got $scale")
    // Spread: the bigram explode off a possibly 1-2-row-group scan
    // (x87 ran at 3.9 cores at sf1)
    val dp = Spread.toClusterWidth(docs, expansion = 100L)
      .select(id.as("doc_id"), inTarget.cast("boolean").as("in_t"),
        split(trim(text), "\\s+").as("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), col("in_t"), explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))"))
        .as("bg"))
      .select(col("doc_id"), col("in_t"),
        pmod(Dedup.md5Hash60(col("bg")), lit(buckets.toLong)).as("h"))
      .groupBy(col("doc_id"), col("in_t"), col("h"))
      .agg(count(lit(1)).as("n_occ"))
      .localCheckpoint(false)
    val feat = dp.groupBy(col("h"))
      .agg(sum(col("n_occ")).as("c_all"),
        sum(when(col("in_t"), col("n_occ")).otherwise(0L)).as("c_tgt"))
      .withColumn("r", expr(s"((c_tgt + 1L) * ${scale}L) DIV (c_all + 1L)"))
      .select(col("h"), col("r"))
    dp.join(broadcast(feat), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ")).as("n_feats"),
        expr("sum(n_occ * r) DIV sum(n_occ)").as("dsir_score"))
      .select(col("doc_id"), col("n_feats"), col("dsir_score"))
  }

  /** Deterministic TOKEN-budget corpus cut: walk each stratum's docs in
    * md5-hash order (tie: key) and keep rows while the RUNNING token
    * total stays within `budget` — "give me at most N tokens per
    * source, reproducibly", the token-exact sibling of
    * [[takePerStratum]]'s row cap (training corpora are sized in
    * tokens, not documents). A doc is kept iff the cumulative count
    * THROUGH ITSELF fits the budget; the first overflowing doc and
    * everything after it drop, so reruns, incremental reprocessing and
    * a different engine cut the identical corpus.
    *
    * The running-sum cutoff rides [[StratumRank.cumsum]]'s two-phase
    * decomposition (round 14 — this op previously carried the
    * documented mega-stratum caveat): per-partition TOKEN-SUM offsets
    * replace the bare-stratum window, so a pathological mega-stratum
    * spans the cluster instead of single-tasking one sort.
    *
    * Output: input columns + `n_tok` (whitespace tokens) + `cum_tok`. */
  def tokenBudgetCut(df: DataFrame, stratum: Column, key: Column,
      text: Column, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be positive, got $budget")
    StratumRank.cumsum(
        df.withColumn("n_tok", size(split(trim(text), "\\s+")).cast("long")),
        stratum,
        Seq(Dedup.md5Hash60(key.cast("string")), key),
        col("n_tok"))
      .withColumnRenamed("__cum", "cum_tok")
      .drop("__s")
      .where(col("cum_tok") <= budget)
  }

  def rendezvousShard(key: Column, shards: Int): Column = {
    require(shards >= 1 && shards <= 4096,
      s"shards must be in [1, 4096], got $shards — for more, nest two rendezvous levels")
    if (shards == 1) lit(0L)
    else {
      val cands = (0 until shards).map { s =>
        struct(
          Dedup.md5Hash60(concat(key.cast("string"), lit(":"), lit(s.toString)))
            .as("h"),
          lit(s.toLong).as("shard"))
      }
      greatest(cands: _*).getField("shard")
    }
  }

  /** Curriculum mixture interleave: a deterministic global training
    * order in which every source appears in proportion to its size at
    * every prefix — the property a streaming trainer needs (stop at any
    * step and the mixture seen so far matches the target mix; no "all
    * of source A, then all of B" pathology).
    *
    * Construction: shuffle each source internally by the id's 60-bit
    * md5 hash (reproducible shuffle, the x27/x89 discipline), rank
    * within source, then scale each rank onto the global axis:
    * `ikey = rn_src · N div c_src` — source s occupies positions spaced
    * ~N/c_s apart, so sorting by `(ikey, source, rn_src)` yields the
    * proportional round-robin. Exact integers (DECIMAL product, one
    * floor), no floats, engine-reproducible.
    *
    * 100 TB posture: the per-source rank runs through
    * [[StratumRank.rank]]'s two-phase decomposition (round 14 — a bare
    * source window would cap parallelism at the source count), the
    * global ORDER is carried by the key (materialized only if a
    * consumer sorts), plus a broadcast per-source count join and a
    * broadcast 1-row total. Output: `(doc_id, source, rn_src, ikey)`. */
  def curriculumInterleave(docs: DataFrame, id: Column, source: Column): DataFrame = {
    val d = docs.select(id.as("doc_id"), source.as("source"),
      Dedup.md5Hash60(id.cast("string")).as("h"))
    val ranked = StratumRank.rank(d, col("source"),
        Seq(col("h"), col("doc_id")))
      .withColumnRenamed("__rn", "rn_src").drop("__s")
    val counts = d.groupBy("source").agg(count(lit(1)).as("cs"))
    val total = d.agg(count(lit(1)).as("n"))
    ranked
      .join(broadcast(counts), Seq("source"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("source"), col("rn_src"),
        expr("CAST(CAST(rn_src AS DECIMAL(38,0)) * n DIV cs AS BIGINT)")
          .as("ikey"))
  }

  /** Per-stratum quantile-rank normalization: replace a raw score with
    * its within-stratum quantile position `q_e6 = rn·1e6 div c_s`
    * (rn = rank by (score, id) — the id tie-break makes it total and
    * rerun-stable). A length threshold that means "top half" should
    * mean top half in EVERY source — raw-score thresholds pick almost
    * everything from the verbose source and almost nothing from the
    * terse one; quantile ranks make one threshold portable across
    * strata. Exact integers, floors only.
    *
    * 100 TB posture: the within-stratum rank runs through
    * [[StratumRank.rank]]'s two-phase decomposition (round 14) plus a
    * broadcast per-stratum count join — no global window, no
    * distribution estimation pass, no bare-stratum funnel. Output:
    * `(doc_id, stratum, score, q_e6)`. */
  def quantileNormalize(df: DataFrame, id: Column, stratum: Column,
      score: Column): DataFrame = {
    val d = df.select(id.as("doc_id"), stratum.as("stratum"),
      score.cast("long").as("score"))
    val ranked = StratumRank.rank(d, col("stratum"),
        Seq(col("score"), col("doc_id")))
      .withColumnRenamed("__rn", "rn").drop("__s")
    val counts = d.groupBy("stratum").agg(count(lit(1)).as("cs"))
    ranked.join(broadcast(counts), Seq("stratum"))
      .select(col("doc_id"), col("stratum"), col("score"),
        expr("rn * 1000000L DIV cs").as("q_e6"))
  }

  /** Proportional stratified sample with EXACT largest-remainder
    * allocation: per-stratum quotas `budget·n_s div N` plus one extra
    * row for the `budget − Σquota` strata with the largest remainders
    * (ties by stratum — total order), rows then chosen by deterministic
    * md5 rank within each stratum. Allocation error vs true proportions
    * is < 1 row per stratum and the total is EXACTLY `budget` — the
    * eval-set builder's contract (x48's fixed per-stratum budget is the
    * other regime).
    *
    * 100 TB posture: quotas live on the |strata|-row aggregate (the
    * remainder rank is a broadcast self-join count, not a global
    * window); row selection ranks through [[StratumRank.rank]]'s
    * two-phase decomposition (round 14 — never a bare-stratum window).
    * Output: (stratum, id, rk) — exactly `budget` rows. */
  def proportionalSample(df: DataFrame, stratum: Column, id: Column,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget=$budget must be >= 1")
    val base = df.select(stratum.cast("string").as("s"), id.as("id"))
      .localCheckpoint(false)
    // loud refusal, not a silent short output: with budget > N the
    // largest-remainder quotas exceed stratum sizes and the EXACTLY-
    // budget-rows contract cannot hold
    val nTotal = base.count()
    require(budget <= nTotal,
      s"proportionalSample: budget=$budget exceeds population n_total=$nTotal" +
        " — the exactly-budget-rows contract is unsatisfiable; cap the budget")
    val sizes = base.groupBy("s").agg(count(lit(1)).as("n_s"))
    val tot = sizes.agg(sum(col("n_s")).as("n_total"))
    val quotas = sizes.crossJoin(broadcast(tot))
      .select(col("s"), col("n_s"),
        expr(s"${budget}L * n_s DIV n_total").as("quota"),
        expr(s"(${budget}L * n_s) % n_total").as("rem"))
      .localCheckpoint(false)
    val leftover = broadcast(quotas
      .agg((lit(budget) - sum(col("quota"))).as("extra")))
    val ranked = quotas.as("a")
      .join(broadcast(quotas.select(col("s").as("s2"), col("rem").as("rem2"))),
        col("rem2") > col("rem") ||
          (col("rem2") === col("rem") && col("s2") <= col("s")))
      .groupBy(col("a.s"), col("a.quota"))
      .agg(count(lit(1)).as("rrank"))
      .crossJoin(leftover)
      .select(col("s"),
        (col("quota") + when(col("rrank") <= col("extra"), 1L).otherwise(0L))
          .as("final_quota"))
    StratumRank.rank(base, col("s"),
        Seq(md5(col("id").cast("string")), col("id")))
      .withColumnRenamed("__rn", "rk").drop("__s")
      .join(broadcast(ranked), Seq("s"))
      .where(col("rk") <= col("final_quota"))
      .select(col("s").as("stratum"), col("id"), col("rk"))
  }

  /** Deterministic NEGATIVE sampling for contrastive training: for each
    * doc, `k` ring negatives — the docs at positions `(p + j·step) mod
    * N` of the id-sorted slice — minus any candidate that is actually a
    * NEAR-DUP of the anchor (MinHash pairs: a "negative" that is a
    * duplicate poisons the loss; exact dups are a subset). Ring
    * spacing with a step coprime-ish to N spreads negatives across the
    * corpus; everything is reproducible arithmetic, no RNG.
    *
    * Plan: positions from the two-phase global rank
    * ([[Profile.globalRank]]: range sort + broadcast prefix offsets —
    * never a global window per the x67 lesson, and never the earlier
    * O(N²) broadcast self-join count, which had no size guard and
    * quadratic work at ANY corpus size); ring lookups are equi-joins on
    * position; the near-dup exclusion is one anti-join against the
    * banded-LSH pair set.
    * Output: (doc_id, j, neg_id). */
  def negativeSamples(docs: DataFrame, id: Column, text: Column,
      k: Int, step: Long): DataFrame = {
    require(k >= 1 && k <= 64, s"k=$k out of range")
    require(step >= 1, s"step=$step must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val d = docs.select(id.cast("long").as("doc_id"), text.as("text"))
      .localCheckpoint(false)
    val ids = d.select(col("doc_id")).localCheckpoint(false)
    val pos = graft.ext.Profile.globalRank(ids, col("doc_id"))
      .select(col("id").as("doc_id"), col("p"))
      .localCheckpoint(false)
    val n = pos.count()
    val js = broadcast((1 to k).map(_.toLong).toDF("j"))
    val wanted = pos.crossJoin(js)
      .select(col("doc_id"), col("j"),
        expr(s"(p + j * ${step}L) % ${n}L").as("np"))
    val byPos = pos.select(col("p").as("np"), col("doc_id").as("neg_id"))
    val cand = wanted.join(byPos, Seq("np"))
      .where(col("neg_id") =!= col("doc_id"))
      .select(col("doc_id"), col("j"), col("neg_id"))
    // near-dup exclusion at CONTENT-REPRESENTATIVE granularity: LSH
    // pairs are emitted between per-content representatives (exact dups
    // collapse first), so map both sides of a candidate to their rep —
    // equal reps = exact dup, paired reps = near dup; both are poison
    val reps = d.groupBy(md5(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("rep"))
    val docRep = d.select(col("doc_id"), md5(col("text")).as("__h"))
      .join(reps, Seq("__h")).select(col("doc_id"), col("rep"))
      .localCheckpoint(false)
    val pairs = graft.ext.Dedup.minhashPairs(d, col("doc_id"), col("text"))
      .select(col("a"), col("b"))
    // symmetrize in ONE pass (round 18): a two-arm union would embed
    // the LSH band join + distinct under both arms — Catalyst
    // duplicates the subtree — so both directions explode from one
    val sym = pairs.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
    cand
      .join(docRep.select(col("doc_id"), col("rep").as("rep_a")), Seq("doc_id"))
      .join(docRep.select(col("doc_id").as("neg_id"), col("rep").as("rep_b")),
        Seq("neg_id"))
      .where(col("rep_a") =!= col("rep_b"))
      .join(sym.select(col("a").as("rep_a"), col("b").as("rep_b")),
        Seq("rep_a", "rep_b"), "left_anti")
      .select(col("doc_id"), col("j"), col("neg_id"))
  }

  /** Consistent-hash RING assignment with virtual nodes: `vnodes`
    * replicas per shard hashed onto the 60-bit ring, every key owned by
    * the first vnode at-or-after its hash (wrapping) — the classic
    * design whose property is MINIMAL MOVEMENT under shard count
    * change, vs [[rendezvousShard]]'s per-key max-score. Reported as a
    * per-shard load profile so the vnode count's variance is visible
    * (more vnodes → tighter balance).
    *
    * Load is DISTINCT-KEY load: repeated key values collapse before
    * assignment (a key occupies one ring position no matter how many
    * rows carry it), so `n_keys`/`load_ppm` profile the keyspace, not
    * the row stream — weight by a row count upstream if you want
    * row-volume balance.
    *
    * Plan: the ring (≤ 4096 vnodes) is deterministic at PLAN BUILD —
    * shard/replica labels hashed with the same [[graft.functions.Md5Hash60]]
    * the rows use — so it is embedded SORTED in a native binary-search
    * [[graft.functions.RingSuccessor]] expression: each key pays one
    * O(log V) lookup inside whole-stage codegen, ZERO row amplification
    * (the earlier keys × ring BroadcastNestedLoopJoin was a ×V
    * materialization — the one plan that fails the 100 TB test). Exact
    * integers end to end; the DuckDB oracle keeps its declarative
    * cross-join form — same semantics, different plan.
    * Output per shard: (shard, n_keys, load_ppm). */
  def hashRingLoad(keys: DataFrame, key: Column, shards: Int,
      vnodes: Int): DataFrame = {
    require(shards >= 2 && vnodes >= 1 && shards * vnodes <= 4096,
      s"ring size ${shards}x$vnodes out of range")
    // sorted by (vh, shard): binary-search ties resolve to the smaller
    // shard, matching the oracle's min(struct(vh, shard)) reduction
    val ring = (0 until shards)
      .flatMap(sh => (0 until vnodes).map(r =>
        (graft.functions.Md5Hash60.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"$sh:$r")), sh)))
      .sorted
    val assigned = keys.select(key.as("k")).distinct()
      .select(graft.functions.RingSuccessor.ring_successor(
        graft.ext.Dedup.md5Hash60(col("k").cast("string")), ring).as("shard"))
    val total = assigned.agg(count(lit(1)).as("n_total"))
    assigned.groupBy("shard").agg(count(lit(1)).as("n_keys"))
      .crossJoin(broadcast(total))
      .select(col("shard").cast("long").as("shard"), col("n_keys"),
        expr("n_keys * 1000000L DIV n_total").as("load_ppm"))
  }

  /** Group-aware (cluster-safe) k-fold assignment: every document
    * lands in the fold of its NEAR-DUP CLUSTER representative — x7's
    * banded-LSH pairs → x39's connected components → fold =
    * md5(rep) mod k — so two near-duplicates can never straddle a
    * train/validation boundary (the cross-validation leakage x80's
    * two-way split guards against, generalized to k folds). Singleton
    * docs are their own representative.
    *
    * The output CARRIES ITS PROOF: `n_cross_pairs` counts LSH pairs
    * whose endpoints fall in different folds, attributed to the `a`
    * endpoint's fold — zero everywhere BY CONSTRUCTION (same cluster →
    * same rep → same fold), and the column makes the gate mechanical
    * rather than trusted.
    *
    * 100 TB posture: the pair/CC machinery is x39's (banded LSH, never
    * all-pairs; pointer-doubling CC); fold mapping is scan-side hash;
    * the audit legs are key-cardinality joins of (doc_id, fold) pairs.
    * Output per fold: (fold, n_docs, n_clusters, load_ppm,
    * n_cross_pairs). */
  def groupedKFold(docs: DataFrame, id: Column, text: Column,
      kf: Int): DataFrame = {
    require(kf >= 2 && kf <= 64, s"kf=$kf out of range [2, 64]")
    val pairs = Dedup.minhashPairs(docs, id, text).localCheckpoint(false)
    val cc = Dedup.connectedComponents(pairs)
    // minhashPairs collapses byte-identical contents to their min-id
    // representative BEFORE pairing, so exact copies never appear in the
    // pair set — the worst leak of all. Fold by content representative
    // first (x1's exact group), then lift the rep to its LSH cluster.
    val src = docs.select(id.as("doc_id"), text.as("__text__"))
    val withCrep = src
      .withColumn("__ch", md5(col("__text__")))
      .join(src.groupBy(md5(col("__text__")).as("__ch"))
        .agg(min(col("doc_id")).as("crep")), Seq("__ch"))
      .select(col("doc_id"), col("crep"))
    val withFold = withCrep
      .join(cc.withColumnRenamed("doc_id", "crep"), Seq("crep"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("crep")).as("rep"))
      .select(col("doc_id"), col("rep"),
        pmod(Dedup.md5Hash60(col("rep").cast("string")), lit(kf.toLong))
          .as("fold"))
      .localCheckpoint(false)
    val perFold = withFold.groupBy("fold")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_clusters"))
    val nTot = withFold.agg(count(lit(1)).as("n_total"))
    val cross = pairs
      .join(withFold.select(col("doc_id").as("a"), col("fold").as("fold_a")),
        Seq("a"))
      .join(withFold.select(col("doc_id").as("b"), col("fold").as("fold_b")),
        Seq("b"))
      .where(col("fold_a") =!= col("fold_b"))
      .groupBy(col("fold_a").as("fold"))
      .agg(count(lit(1)).as("n_cross_pairs"))
    perFold.join(cross, Seq("fold"), "left")
      .na.fill(0L, Seq("n_cross_pairs"))
      .crossJoin(broadcast(nTot))
      .select(col("fold"), col("n_docs"), col("n_clusters"),
        expr("n_docs * 1000000L DIV n_total").as("load_ppm"),
        col("n_cross_pairs"))
  }

  /** Deterministic training-epoch shuffle audit: every epoch re-shards
    * the corpus by `h = md5Hash60(epoch ':' id)` — a fresh pseudorandom
    * permutation per epoch that any engine reproduces bit-identically
    * (no RNG, no materialized shuffle files; the consumer reads shard
    * s in h-order and gets the epoch's permutation). The audit emits,
    * per (epoch, shard): the row count, the shard's first read cursor
    * (min h), an order-insensitive checksum (Σh mod 2^60 — proves the
    * ASSIGNMENT, not just the counts, against the oracle), and the
    * load share vs the whole corpus.
    *
    * 100 TB posture: the epoch replication is a broadcast crossjoin
    * against an |epochs|-row literal (scan-side, bounded small — the
    * audit checks a handful of epochs, training streams one); all
    * aggregates are combinable; no windows, no sort — ordering is the
    * CONSUMER's h-order read, not a plan stage here.
    * Output: (epoch, shard, n_docs, min_h, checksum, load_ppm). */
  def epochShuffle(df: DataFrame, id: Column, epochs: Int,
      shards: Int): DataFrame = {
    require(epochs >= 1 && epochs <= 16, s"epochs=$epochs out of range")
    require(shards >= 2 && shards <= 4096, s"shards=$shards out of range")
    val spark = df.sparkSession
    import spark.implicits._
    val eDf = broadcast((0L until epochs.toLong).toDF("epoch"))
    val base = df.select(id.cast("long").as("id"))
    val nTot = base.agg(count(lit(1)).as("n_total"))
    base.crossJoin(eDf)
      .select(col("epoch"),
        Dedup.md5Hash60(concat(col("epoch"), lit(":"), col("id"))).as("h"))
      .select(col("epoch"), col("h"),
        pmod(col("h"), lit(shards.toLong)).as("shard"))
      .groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n_docs"), min(col("h")).as("min_h"),
        expr("CAST(sum(CAST(h AS DECIMAL(38,0))) % 1152921504606846976 " +
          "AS BIGINT)").as("checksum"))
      .crossJoin(broadcast(nTot))
      .select(col("epoch"), col("shard"), col("n_docs"), col("min_h"),
        col("checksum"),
        expr("n_docs * 1000000L DIV n_total").as("load_ppm"))
  }

  /** Leave-one-out target encoding with additive smoothing — the
    * leakage-safe way to turn a categorical into a numeric feature:
    * each row's encoding is its key's target mean computed WITHOUT the
    * row itself (so the feature never memorizes its own label), pulled
    * toward the global mean by `alpha` pseudo-observations:
    *
    *   enc_ppm(i) = (s_k − v_i + alpha·μ) · 1e6 DIV (n_k − 1 + alpha),
    *   μ = Σv DIV N   (global mean, floor — both engines identical)
    *
    * All integer arithmetic on an integer-valued target (cents, a 0/1
    * label, token counts); a singleton key degrades gracefully to the
    * smoothed prior (denominator = alpha > 0). Exact and reproducible
    * on any engine — the property a feature-store backfill needs.
    *
    * 100 TB posture: per-key sums are ONE combinable groupBy over the
    * key's (small) cardinality, broadcast back; the global mean is a
    * 1-row broadcast; the encoding itself is scan-side arithmetic —
    * zero data-scale exchanges beyond the key rollup. Output: one row
    * per input (k, id, enc_ppm); see [[targetEncodeDigest]] for the
    * per-key validation rollup. */
  def targetEncodeLoo(df: DataFrame, key: Column, id: Column,
      value: Column, alpha: Int = 20): DataFrame = {
    require(alpha >= 1 && alpha <= 10000, s"alpha=$alpha out of range")
    val base = df.select(key.as("k"), id.as("id"),
      value.cast("long").as("v"))
    val ks = base.groupBy("k")
      .agg(sum(expr("CAST(v AS DECIMAL(38,0))")).as("sk"),
        count(lit(1)).as("nk"))
    val g = base.agg(sum(expr("CAST(v AS DECIMAL(38,0))")).as("sv"),
      count(lit(1)).as("n"))
    base.join(broadcast(ks), Seq("k"))
      .crossJoin(broadcast(g))
      .select(col("k"), col("id"),
        expr(s"CAST((sk - v + $alpha * (sv DIV n)) * 1000000 " +
          s"DIV (nk - 1 + $alpha) AS BIGINT)").as("enc_ppm"))
  }

  /** Per-key digest of [[targetEncodeLoo]] — proves the row-level
    * encodings (count, min, max, exact sum as a string) without
    * shipping N rows through the verify artifact. Combinable. */
  def targetEncodeDigest(enc: DataFrame): DataFrame =
    enc.groupBy("k")
      .agg(count(lit(1)).as("n"),
        min(col("enc_ppm")).as("enc_min"),
        max(col("enc_ppm")).as("enc_max"),
        expr("CAST(sum(CAST(enc_ppm AS DECIMAL(38,0))) AS STRING)")
          .as("enc_sum"))

  /** Systematic sampling audit: order the corpus by `h = md5Hash60(id)`
    * (a deterministic pseudorandom permutation — the same trick as
    * [[epochShuffle]]) and keep every `k`-th row starting at `offset`.
    * Versus Bernoulli hash sampling ([[hashSample]]-style mod tests),
    * the systematic stride guarantees the sample size EXACTLY
    * (⌈(n−offset)/k⌉ rows, not a binomial draw) — the contract an
    * eval-set builder needs. The audit ships the digest: counts, h
    * range, and the Σh mod 2^60 checksum proving the exact PICK SET
    * against the oracle, not just its size.
    *
    * 100 TB posture: the global h-rank rides [[Profile.globalRank]]'s
    * two-phase discipline (range sort + per-partition driver offsets +
    * broadcast) — no global window, no SinglePartition exchange; the
    * digest is one combinable aggregate. Ties in h (60-bit collisions)
    * are harmless: tied rows carry identical h, so whichever side of
    * the stride boundary they land on, count/min/max/checksum are
    * unchanged on any engine.
    * Output: one row (n_total, n_picked, min_h, max_h, checksum,
    * load_ppm). */
  def systematicSample(df: DataFrame, id: Column, k: Int,
      offset: Int): DataFrame = {
    require(k >= 2 && k <= 1000000, s"k=$k out of range")
    require(offset >= 0 && offset < k, s"offset=$offset not in [0, $k)")
    val h = df.select(Dedup.md5Hash60(id.cast("string")).as("h"))
    val nTot = h.agg(count(lit(1)).as("n_total"))
    val picked = Profile.globalRank(h, col("h"))
      .where(pmod(col("p"), lit(k.toLong)) === offset.toLong)
    picked.agg(count(lit(1)).as("n_picked"),
        min(col("id")).as("min_h"), max(col("id")).as("max_h"),
        expr("CAST(sum(CAST(id AS DECIMAL(38,0))) % 1152921504606846976 " +
          "AS BIGINT)").as("checksum"))
      .crossJoin(broadcast(nTot))
      .select(col("n_total"), col("n_picked"), col("min_h"), col("max_h"),
        col("checksum"),
        expr("n_picked * 1000000L DIV n_total").as("load_ppm"))
  }

  /** Shard-uniformity certification: the χ² goodness-of-fit of
    * [[rendezvousShard]] loads against the uniform expectation — the
    * closing audit of the sharding family (x82 assigns, x110/x174
    * report load, THIS says whether the spread is statistically
    * uniform or the hash is broken). χ² = Σ(k·c − N)²/(k·N) is
    * rational; shards the assignment never hit contribute the closed
    * form (k−occ)·N² (the x201 absent-mass trick), so only occupied
    * shards are touched. `chi2_per_dof_ppm` ≈ 1e6 for a healthy hash;
    * `skewed` flags > 2e6 (χ²/df at 99% stays below ~1.7 for df ≥ 30 —
    * a documented heuristic bound, not a fitted constant).
    *
    * 100 TB posture: one combinable data-scale rollup (the shard
    * groupBy — the rendezvous hash is scan-side arithmetic); the χ²
    * runs on ≤ `shards` rows. Output: one row (shards, n,
    * shards_occupied, min_load, max_load, chi2_ppm, chi2_per_dof_ppm,
    * skewed). */
  def shardUniformity(df: DataFrame, key: Column, shards: Int)
      : DataFrame = {
    require(shards >= 2 && shards <= 4096, s"shards=$shards out of range")
    val loads = df.select(rendezvousShard(key, shards).as("shard"))
      .groupBy("shard").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // total + χ² both read the tiny load table
    val tot = loads.agg(sum(col("c")).as("n"), count(lit(1)).as("occ"))
    loads.crossJoin(broadcast(tot))
      .groupBy("n", "occ")
      .agg(min(col("c")).as("min_load"), max(col("c")).as("max_load"),
        sum(expr(s"(CAST(c AS DECIMAL(38,0)) * $shards - n) " +
          s"* (CAST(c AS DECIMAL(38,0)) * $shards - n)")).as("__ss"))
      .select(lit(shards.toLong).as("shards"), col("n"),
        col("occ").as("shards_occupied"), col("min_load"), col("max_load"),
        expr(s"CAST((__ss + ($shards - occ) * CAST(n AS DECIMAL(38,0)) * n) " +
          s"* 1000000 DIV ($shards * CAST(n AS DECIMAL(38,0))) AS BIGINT)")
          .as("chi2_ppm"))
      .withColumn("chi2_per_dof_ppm",
        expr(s"chi2_ppm DIV ${shards - 1}"))
      .withColumn("skewed",
        when(col("chi2_per_dof_ppm") > 2000000L, 1).otherwise(0).cast("int"))
  }
}
