package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenizer-vocabulary induction: byte-pair encoding (Sennrich et al.
  * 2016) as a DataFrame pipeline — the LLM-pipeline step that turns a
  * corpus into a merge table. Each round counts adjacent symbol pairs
  * corpus-wide (frequency-weighted, every adjacent position like the
  * reference implementation's get_stats), picks the argmax pair under a
  * total order (count desc, pair asc — deterministic), and merges its
  * non-overlapping occurrences greedily left-to-right in every word.
  *
  * The greedy overlap rule is set-based, not iterative: within a RUN of
  * consecutive candidate positions (only possible for self-pairs like
  * 'a a' in "aaaa"), left-to-right merging keeps exactly the
  * even-offset candidates — an islands window computes that directly.
  *
  * Exactness: symbols are strings, counts are integers, ranks are
  * windows — every step is engine-exact, so a 3-round unrolled oracle
  * reproduces the output hash-identically.
  *
  * 100 TB posture: state is the (word, freq) VOCABULARY (distinct
  * words pre-aggregated with counts — at web scale millions of rows,
  * not the corpus), symbol rows explode it ~5×; per round: one short
  * per-word window pass, one map-combinable pair count, ONE argmax row
  * to the driver (the same plan-build lookup discipline as
  * strideForCells), and a per-round localCheckpoint so round k+1 plans
  * over materialized symbols instead of k stacked window passes. */
object Vocab {

  /** `rounds` BPE merges over the (word, freq) vocabulary; returns the
    * final symbol rows `(word, freq, pos, sym)`, pos dense from 0. */
  def bpeRounds(words: DataFrame, rounds: Int): DataFrame = {
    var syms = words
      .select(col("word"), col("freq"), posexplode(split(col("word"), "")))
      .select(col("word"), col("freq"), col("pos").cast("long").as("pos"),
        col("col").as("sym"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) syms = mergeRound(syms).localCheckpoint(false)
    syms
  }

  private def mergeRound(syms: DataFrame): DataFrame = {
    val byWord = Window.partitionBy(col("word")).orderBy(col("pos"))
    val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(byWord))
    val counts = withNext.where(col("nxt").isNotNull)
      .groupBy(concat(col("sym"), lit(" "), col("nxt")).as("pair"))
      .agg(sum(col("freq")).as("cnt"))
    // one argmax row to the driver — the merge decision is global by
    // definition; everything downstream stays distributed
    val bestRow = counts.orderBy(col("cnt").desc, col("pair")).limit(1).collect()
    if (bestRow.isEmpty) return syms
    val best = bestRow.head.getString(0)
    val cand = withNext.withColumn("isc",
      concat(col("sym"), lit(" "), col("nxt")) === lit(best))
    val heads = cand.where(col("isc"))
      .withColumn("grp", col("pos") - row_number().over(byWord))
      .withColumn("off",
        col("pos") - min(col("pos")).over(Window.partitionBy(col("word"), col("grp"))))
      .where(col("off") % 2 === 0)
      .select(col("word"), col("pos"))
    val consumed = heads.select(col("word"), (col("pos") + 1L).as("pos"))
    cand
      .join(heads.withColumn("is_head", lit(1)), Seq("word", "pos"), "left")
      .join(consumed.withColumn("is_consumed", lit(1)), Seq("word", "pos"), "left")
      .where(col("is_consumed").isNull)
      .select(col("word"), col("freq"), col("pos"),
        when(col("is_head") === 1, concat(col("sym"), col("nxt")))
          .otherwise(col("sym")).as("sym"))
      .withColumn("pos2", (row_number().over(byWord) - 1).cast("long"))
      .select(col("word"), col("freq"), col("pos2").as("pos"), col("sym"))
  }

  /** Collocation mining: top-`k` adjacent word pairs ranked by a
    * RATIONAL PMI surrogate. True PMI is `log(p(ab) / (p(a)·p(b)))`;
    * with the corpus-constant factor dropped and the monotone `log`
    * removed (x41/x67's engine-portability reasoning — IEEE `log` is
    * not correctly-rounded, a rational score is exact on any engine),
    * the ranking-equivalent score is `scale·c(ab) / (c(a)·c(b))`,
    * computed in integer arithmetic as the SEQUENTIAL floor division
    * `(c(ab)·scale) div c(a) div c(b)` — for positive integers
    * `⌊⌊a/b⌋/c⌋ = ⌊a/(b·c)⌋`, so the value is identical to dividing by
    * the product, but `c(a)·c(b)` (which overflows signed-64 first:
    * two ~3e9-count unigrams exceed 2^63) is never formed. The one
    * remaining overflow envelope is `c(ab)·scale ≤ 9.2e18`: total
    * bigrams ≤ ~9.2e10 at the default scale — beyond that, shrink
    * `scale` (ranking is unchanged as long as the quotient keeps
    * enough bits).
    *
    * `minCount` floors the pair count: a pair seen once between two
    * hapax words scores maximal PMI on pure noise — the standard
    * collocation-mining fix.
    *
    * 100 TB posture: bigrams are generated scan-side from each doc's
    * token array (no self-join on position), so the only corpus-scale
    * shuffles are the two token-keyed counting aggregations; the pair →
    * unigram joins carry (word, count) pairs, and the final top-k is a
    * TakeOrderedAndProject, never a global sort of all pairs.
    */
  def bigramPmi(docs: DataFrame, text: Column, k: Int,
      minCount: Long = 3L, scale: Long = 100000000L): DataFrame = {
    require(k > 0 && minCount >= 1 && scale >= 1)
    val toks = docs.select(split(trim(text), "\\s+").as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    // adjacent pairs via an index transform over the array — emitted
    // from the scan, zero join
    val pairs = toks.where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))"))
        .as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_pair"))
      .where(col("c_pair") >= minCount)
    pairs
      .join(uni.select(col("w").as("w1"), col("cw").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cw").as("c2")), Seq("w2"))
      .withColumn("pmi_score",
        expr(s"(c_pair * ${scale}L) DIV c1 DIV c2"))
      .select(col("w1"), col("w2"), col("c_pair"), col("c1"), col("c2"),
        col("pmi_score"))
      .orderBy(col("pmi_score").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Per-document fluency score under the corpus's own bigram language
    * model — the classic perplexity-filter signal (a doc whose adjacent
    * word pairs are RARE given their first word is noise/garble; one
    * whose pairs are maximally predictable is boilerplate), with the
    * IEEE-log perplexity replaced by the rational surrogate that the
    * whole text family uses (x41/x67/x78): each bigram contributes the
    * scaled MLE conditional `⌊scale·c(w1w2)/c(w1)⌋` and the doc score
    * is the integer mean over its bigram positions — exact on any
    * engine, no float anywhere.
    *
    * Overflow envelope (x78's): `c_pair·scale ≤ 2^63` → total corpus
    * bigrams ≤ ~9.2e10 at the default scale; shrink `scale` beyond
    * that. Per-doc sums are bounded by doc_len·scale.
    *
    * 100 TB posture: the corpus never shuffles as text — tokens are
    * split scan-side, and the only corpus-scale exchanges are the two
    * combinable counting aggregations (per-doc pairs, corpus unigrams).
    * The per-doc pair table `(doc_id, w1, w2, n_occ)` is checkpointed
    * ONCE and reused for both the corpus pair counts and the join-back
    * (the x56/x79 discipline), so shingling runs once; the count joins
    * are equi-joins where the count side has exactly one row per key —
    * no multiplicity blow-up, no skew amplification. */
  def bigramLmScore(docs: DataFrame, id: Column, text: Column,
      scale: Long = 100000000L): DataFrame = {
    require(scale >= 1, s"scale must be positive, got $scale")
    // Spread: the bigram explode multiplies rows ~100x off a possibly
    // 1-2-row-group scan (x81 ran at 3.6 cores at sf1)
    val toks = Spread.toClusterWidth(docs, expansion = 100L)
      .select(id.as("doc_id"), split(trim(text), "\\s+").as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val docPairs = toks.where(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))"))
        .as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_occ"))
      .localCheckpoint(false)
    val pairCounts = docPairs.groupBy(col("w1"), col("w2"))
      .agg(sum(col("n_occ")).as("c_pair"))
    docPairs
      .join(pairCounts, Seq("w1", "w2"))
      .join(uni.select(col("w").as("w1"), col("cw").as("c1")), Seq("w1"))
      .withColumn("contrib", expr(s"(c_pair * ${scale}L) DIV c1"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ")).as("n_bigrams"),
        expr("sum(n_occ * contrib) DIV sum(n_occ)").as("lm_score"))
      .select(col("doc_id"), col("n_bigrams"), col("lm_score"))
  }

  /** Vocabulary coverage / out-of-vocabulary report: build the top-`v`
    * corpus vocabulary (by occurrence count, word-ascending tie-break —
    * fully deterministic) and score each document's OOV rate against it
    * in exact per-million integers. The tokenizer-design feedback loop:
    * how much of each doc a fixed-size vocab fails to cover, and where
    * coverage collapses (non-target-language and boilerplate-junk docs
    * surface at the top of the OOV ranking).
    *
    * Plan: one tokenize scan feeds BOTH the global count (map-side-
    * combinable groupBy) and the per-doc scoring; the top-v cut is
    * `orderBy(count desc, w).limit(v)` — TakeOrderedAndProject, a
    * per-partition heap + driver merge of v rows, never a global sort —
    * and the v-row vocab broadcasts to a hash-lookup join. Output:
    * `(doc_id, n_tok, n_in_vocab, oov_e6)`, floors, no floats. */
  def oovRates(docs: DataFrame, id: Column, text: Column, v: Int): DataFrame = {
    require(v >= 1, s"vocab size v=$v must be >= 1")
    val toks = docs.where(trim(text) =!= "")
      .select(id.as("doc_id"), explode(split(trim(text), "\\s+")).as("w"))
      .localCheckpoint(false) // one tokenize, two consumers
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cw"))
      .orderBy(col("cw").desc, col("w")).limit(v)
      .select(col("w"), lit(1L).as("inv"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(coalesce(col("inv"), lit(0L))).as("n_in_vocab"))
      .withColumn("oov_e6",
        expr("(n_tok - n_in_vocab) * 1000000L DIV n_tok"))
      .select(col("doc_id"), col("n_tok"), col("n_in_vocab"), col("oov_e6"))
  }

  /** Sliding-window co-occurrence counts (the word2vec/GloVe context
    * statistic): every UNORDERED word pair within `window` positions of
    * each other, counted corpus-wide, floored at `minCount`, top-`k` by
    * count (ties broken by the pair string — a deterministic total
    * order). Where [[bigramPmi]] sees only ADJACENT pairs, this sees the
    * whole context window — the association table a co-occurrence
    * embedding trains on.
    *
    * 100 TB posture: pairs are generated SCAN-SIDE from each doc's token
    * array (one nested transform — N·window emissions, never a position
    * self-join; the oracle pays that join, this plan doesn't), the count
    * is one combinable groupBy, and the top-k cut is
    * TakeOrderedAndProject (per-partition heaps, no global sort).
    * Output: (pair string, cnt bigint). */
  def cooccurTopK(docs: DataFrame, text: Column, window: Int, k: Int,
      minCount: Long = 2L): DataFrame = {
    require(window >= 1 && k >= 1, s"cooccurTopK(window=$window, k=$k)")
    // Spread: the windowed pair explode is ~window x tokens per doc
    // (x114 ran at 1.2 cores at sf1 off a 1-row-group scan)
    val pairs = Spread.toClusterWidth(docs, expansion = 100L)
      .select(when(length(trim(text)) === 0, array().cast("array<string>"))
        .otherwise(split(trim(text), "\\s+")).as("w"))
      .select(explode(when(size(col("w")) >= 2,
        expr(s"""flatten(transform(sequence(0, size(w) - 2), i ->
                |  transform(sequence(i + 1, least(i + $window, size(w) - 1)), j ->
                |    concat(least(w[i], w[j]), ' ', greatest(w[i], w[j])))))"""
          .stripMargin))
        .otherwise(array().cast("array<string>"))).as("pair"))
    pairs.groupBy("pair").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    * PageRank over the word co-occurrence graph. Candidate words are
    * `[a-z0-9]+` runs of the lowercased text of length >= `minLen`
    * (the POS-filter surrogate — short function words drop out);
    * edges connect candidates within `window` positions of the
    * FILTERED sequence, weighted by co-occurrence count; rank is
    * r_{k+1}(v) = (1−d)/N + d·Σ_u r_k(u)·w(u,v)/W(u) with W(u) the
    * node's total edge weight.
    *
    * Exactness contract (hardened from [[Graph.pageRank]]'s): each
    * contribution is the fixed double chain `r / W * w · 1e15` FLOORED
    * to an exact integer — floor is engine-identical where a
    * double→DECIMAL cast is not (Spark rounds HALF_UP, DuckDB half-even;
    * with the extra weight multiply a tie actually lands on the
    * boundary). Per-node sums stay < 1e15 < 2^53, so the integer sum,
    * its double cast, and the /1e15 + damping blend are all IEEE-exact
    * and order-independent — k unrolled iterations stay hash-exact
    * against the oracle.
    *
    * 100 TB posture: pairs expand scan-side from the token array (no
    * position self-join), the graph is VOCABULARY²-bounded (and far
    * sparser — only within-window pairs), per iteration one equi-join
    * + one combinable groupBy over checkpointed edges, TakeOrdered
    * top-k at the end. Output: (word, tw, pr) — top `k` by rank. */
  def textRank(docs: DataFrame, text: Column, window: Int, iters: Int,
      k: Int, minLen: Int = 5, damping: Double = 0.85): DataFrame = {
    require(window >= 1 && iters >= 1 && iters <= 8 && k >= 1 && minLen >= 1,
      s"textRank(window=$window, iters=$iters, k=$k, minLen=$minLen)")
    val pairs = docs
      .select(filter(regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0)),
        w => length(w) >= minLen).as("w"))
      .select(explode(when(size(col("w")) >= 2,
        expr(s"""flatten(transform(sequence(0, size(w) - 2), i ->
                |  transform(sequence(i + 1, least(i + $window, size(w) - 1)), j ->
                |    concat(least(w[i], w[j]), ' ', greatest(w[i], w[j])))))"""
          .stripMargin))
        .otherwise(array().cast("array<string>"))).as("pair"))
    val und = pairs.groupBy("pair").agg(count(lit(1)).as("cnt"))
      .select(split(col("pair"), " ").getItem(0).as("w1"),
        split(col("pair"), " ").getItem(1).as("w2"), col("cnt"))
      .where(col("w1") =!= col("w2")) // no self-loops
    // symmetrize in ONE pass (round 18): the two-arm union embedded
    // the pair explode + groupBy under both arms (Catalyst duplicates
    // the subtree); explode emits both directions from one subtree
    val e = und.select(explode(array(
        struct(col("w1").as("src"), col("w2").as("dst"), col("cnt")),
        struct(col("w2").as("src"), col("w1").as("dst"), col("cnt")))).as("d"))
      .select(col("d.src").as("src"), col("d.dst").as("dst"), col("d.cnt").as("cnt"))
      .localCheckpoint(false)
    val tw = e.groupBy(col("src")).agg(sum(col("cnt")).as("tw"))
    val nRow = tw.agg(count(lit(1)).as("n"))
    val attrs = tw.crossJoin(broadcast(nRow))
      .select(col("src").as("node"), col("tw"), col("n"))
      .localCheckpoint(false)
    var ranks = attrs.select(col("node"), col("tw"),
      (lit(1.0) / col("n").cast("double")).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ranks.join(e, col("node") === col("src"))
        .select(col("dst"),
          floor(col("r") / col("tw").cast("double") * col("cnt").cast("double")
            * lit(1.0e15)).as("c"))
      val inbound = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s15"))
      ranks = attrs.join(inbound, col("node") === col("dst"))
        .select(col("node"), col("tw"),
          ((lit(1.0) - lit(damping)) / col("n").cast("double") +
            lit(damping) * (col("s15").cast("double") / lit(1.0e15))).as("r"))
    }
    ranks.select(col("node").as("word"), col("tw"), col("r").as("pr"))
      .orderBy(col("pr").desc, col("word"))
      .limit(k)
  }

  /** Hashing-trick bag-of-words profile: every whitespace token hashed
    * into one of `buckets` fixed slots ([[graft.functions.PolyHash]] —
    * codegen'd, oracle-reproducible), aggregated per stratum. The
    * fixed-dimension featurization step (Weinberger et al.'s hashing
    * trick) plus its collision report: `n_distinct` per slot tells you
    * whether `buckets` is big enough BEFORE you train on the vectors.
    *
    * 100 TB posture: tokens explode scan-side and immediately collapse
    * into a (stratum × buckets)-key combinable groupBy — output is
    * O(strata · buckets) regardless of corpus size; the distinct-token
    * count shuffles (stratum, bucket, token) once at vocabulary
    * cardinality, never corpus cardinality.
    * Output: (stratum, bucket, n_tokens, n_distinct). */
  def featureHashProfile(docs: DataFrame, text: Column, stratum: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets must be >= 2")
    docs.select(stratum.as("stratum"),
        explode(split(trim(text), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
      .select(col("stratum"),
        pmod(graft.functions.PolyHash.poly_hash(col("tok")), lit(buckets.toLong))
          .cast("int").as("bucket"),
        col("tok"))
      .groupBy("stratum", "bucket")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"))
  }

  /** Vocabulary-growth (Heaps) curve: types vs tokens at `buckets`
    * corpus prefixes in deterministic doc-id order — the curve whose
    * flattening says "more of the same crawl adds words, not
    * vocabulary" (the scaling-decision companion to x170's how-many-
    * missing and Good–Turing's what-mass-missing). Prefixes come from
    * the two-phase global rank over doc ids (never a global window);
    * each type charges its FIRST bucket (min rank of occurrence —
    * combinable), each doc its token count, and both cumulate over the
    * `buckets`-row rollup. ttr_ppm = types·1e6 DIV tokens per prefix.
    *
    * 100 TB posture: one range sort for the rank (localCheckpoint-
    * pinned), one explode→min-rank rollup on (word), one per-doc token
    * count; the cumsums ride a `buckets`-row window. Output per prefix:
    * (bucket, n_docs_cum, n_tokens_cum, n_types_cum, ttr_ppm). */
  def vocabularyGrowth(docs: DataFrame, id: Column, text: Column,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000, s"buckets=$buckets out of range")
    val base = docs.select(id.as("doc_id"), text.as("text"))
      .localCheckpoint(false) // rank + tokens read it twice
    val ranked = graft.ext.Profile.globalRank(
        base.select(col("doc_id")), col("doc_id"))
      .select(col("id").as("doc_id"), col("p"))
      .localCheckpoint(false)
    val n = ranked.count()
    val withB = base.join(ranked, Seq("doc_id"))
      .withColumn("bucket", expr(s"p * ${buckets}L DIV ${n}L"))
    val perDoc = withB.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.ext.TextAnalysis.wsTokenCount(col("text")).cast("long"))
          .as("n_tokens"))
    val firstSeen = withB
      .select(col("bucket"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(min(col("bucket")).as("fb"))
      .groupBy("fb").agg(count(lit(1)).as("n_new_types"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // the cumsum window runs over `buckets` rows — bounded at plan build
    perDoc.join(firstSeen, col("bucket") === col("fb"), "left")
      .na.fill(0L, Seq("n_new_types"))
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        col("n_new_types"))
      .withColumn("n_docs_cum", sum(col("n_docs")).over(w))
      .withColumn("n_tokens_cum", sum(col("n_tokens")).over(w))
      .withColumn("n_types_cum", sum(col("n_new_types")).over(w))
      .select(col("bucket"), col("n_docs_cum"), col("n_tokens_cum"),
        col("n_types_cum"),
        expr("CASE WHEN n_tokens_cum > 0 THEN " +
          "CAST(CAST(n_types_cum AS DECIMAL(38,0)) * 1000000 " +
          "DIV n_tokens_cum AS BIGINT) ELSE NULL END").as("ttr_ppm"))
  }
}
