package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash
  * group), MinHash+LSH near-dup, SimHash, exact n-gram Jaccard.
  *
  * 100 TB posture: exact dedup is one hash-shuffle on a 16-byte digest;
  * MinHash is explode → ONE groupBy (map-side-combinable mins) → band
  * self-join that only shuffles (doc_id, band) pairs — candidate
  * verification touches candidate pairs, never the N² cross product.
  * The brute-force `jaccardPairs` exists as the small-data oracle twin.
  *
  * Hot-bucket guards (two, both engine-reproducible):
  *  1. near-dup runs over DISTINCT contents (exact-dedup first): a
  *     corpus with millions of byte-identical docs would otherwise put
  *     them all in one (band,hash) bucket → quadratic within the
  *     bucket. Identical contents are `exactGroups`' job, not LSH's.
  *  2. any residual bucket larger than `maxBucket` is skipped: with
  *     `bands` independent bands a true near-dup pair loses only one of
  *     its `bands` chances, and a bucket that large over distinct
  *     contents is adversarial, not organic.
  *
  * Hashing discipline: every hash that feeds MinHash/SimHash derives
  * from md5 (both Spark and the DuckDB oracle have bit-identical md5),
  * combined with a 2-universal `(a·h_lo + b·h_hi + c) mod p` family in
  * plain 64-bit-safe integer arithmetic — so the full LSH pipeline is
  * reproducible in ANSI SQL and the driver can oracle-check it.
  */
object Dedup {

  // ---- exact ----

  /** Per-content groups: digest, surviving (minimum) id, copy count. */
  def exactGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keep one row per distinct content (first by id). */
  def exactDedup(df: DataFrame, id: Column, text: Column): DataFrame = {
    val w = Window.partitionBy(md5(text)).orderBy(id)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Incremental exact dedup: rows of `batch` whose content does not
    * already exist in `history`, keeping the minimum-id representative
    * per new content. This is the shape a production pipeline actually
    * runs — yesterday's corpus is a fingerprint STORE, not a rescan:
    * `history` here is any `(text)`-bearing frame, but at scale you
    * persist `exactGroups`' 16-byte digests once and anti-join new
    * batches against that narrow table. One anti join + one group on
    * digests; full text never shuffles. */
  def dedupAgainstHistory(batch: DataFrame, history: DataFrame,
      id: Column, text: Column): DataFrame = {
    // NULL text hashes to NULL; a left_anti would KEEP those rows (NULL
    // never equals) while a SQL `NOT IN` oracle drops them. Filter NULL
    // hashes on both sides so engine and oracle agree on nullable input.
    val b = batch.select(id.as("doc_id"), md5(text).as("content_hash"))
      .where(col("content_hash").isNotNull)
    val seen = history.select(md5(text).as("content_hash"))
      .where(col("content_hash").isNotNull).distinct()
    b.join(seen, Seq("content_hash"), "left_anti")
      .groupBy("content_hash").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id", "content_hash")
  }

  /** Benchmark decontamination: drop training documents that share ANY
    * word `n`-gram with the benchmark corpus — the standard eval-leak
    * sweep before pretraining. Two explodes + a semi join + an anti
    * join, all on 60-bit shingle hashes, so only (id, 8-byte hash)
    * pairs ever shuffle; the benchmark side is dim-sized (distinct
    * shingles of the eval set) and broadcasts. */
  def decontaminate(train: DataFrame, benchmark: DataFrame,
      id: Column, text: Column, n: Int): DataFrame = {
    val t = train.select(id.as("doc_id"), text.as("text"))
    val benchShingles = benchmark
      .select(explode(shingles(text, n)).as("sh"))
      .select(md5Hash60(col("sh")).as("h"))
      .distinct()
    val contaminated = t
      .select(col("doc_id"), explode(shingles(col("text"), n)).as("sh"))
      .select(col("doc_id"), md5Hash60(col("sh")).as("h"))
      .join(benchShingles, Seq("h"), "left_semi")
      .select("doc_id").distinct()
    t.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Scored sibling of [[decontaminate]]: instead of silently DROPPING
    * any doc sharing a benchmark n-gram, report each doc's overlap —
    * `(n_shingles, n_hits, contam_pct)` — the audit view a
    * contamination REVIEW needs (GPT-3's appendix-C style analysis:
    * how contaminated, not just whether), from which any threshold
    * policy can be applied downstream as a plain filter.
    *
    * Same scale shape as the dropper: only (id, 8-byte hash) pairs
    * shuffle, the benchmark shingle set is dim-sized and broadcasts,
    * and the per-doc shingle rows are checkpointed once to feed both
    * the denominator count and the hit semi-join. Ratio is integer
    * (`hits·scale div shingles`) — engine-exact. */
  def contaminationScores(train: DataFrame, benchmark: DataFrame,
      id: Column, text: Column, n: Int, scale: Long = 10000L): DataFrame = {
    require(scale >= 1, s"scale must be positive, got $scale")
    val th = train.select(id.as("doc_id"), explode(shingles(text, n)).as("sh"))
      .select(col("doc_id"), md5Hash60(col("sh")).as("h"))
      .localCheckpoint(false)
    val benchShingles = benchmark
      .select(explode(shingles(text, n)).as("sh"))
      .select(md5Hash60(col("sh")).as("h"))
      .distinct()
    val nSh = th.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hits = th.join(benchShingles, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    nSh.join(hits, Seq("doc_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contam_pct", expr(s"n_hits * ${scale}L DIV n_shingles"))
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        col("contam_pct"))
  }

  /** [[decontaminate]] with a Bloom prefilter on the training side — the
    * sketch-accelerated form a 100 TB sweep actually runs. The benchmark
    * shingle hashes build a driver-side Bloom filter (the eval set is
    * dim-sized by definition; this is the same pattern as Spark's own
    * runtime row-level filtering), which is broadcast and applied to the
    * exploded train shingles BEFORE any shuffle: the overwhelmingly
    * clean majority of (id, hash) pairs dies at the scan, and only
    * Bloom-positive pairs reach the semi join. The exact semi join then
    * removes false positives, so the result is IDENTICAL to the exact
    * form — same oracle, sketch only as an accelerator.
    *
    * Lifecycle note: the broadcast Bloom cannot be destroyed eagerly
    * here (the returned frame is lazy and may execute later); it is
    * released by the ContextCleaner once the frame's plan is
    * unreachable, like any broadcast join side. */
  def decontaminateBloom(train: DataFrame, benchmark: DataFrame,
      id: Column, text: Column, n: Int, fpp: Double = 0.01): DataFrame = {
    val spark = train.sparkSession
    val t = train.select(id.as("doc_id"), text.as("text"))
    val benchShingles = benchmark
      .select(explode(shingles(text, n)).as("sh"))
      .select(md5Hash60(col("sh")).as("h"))
      .distinct()
      .localCheckpoint(false) // consumed twice: sketch build + exact verify
    val expected = math.max(benchShingles.count(), 1L)
    val bloom = benchShingles.stat.bloomFilter("h", expected, fpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    // UDF justified: BloomFilterMightContain is not a public Column
    // function, and the filter is a pure scan-side prefilter whose
    // output never affects correctness (exact verify follows).
    val mightContain = udf((h: Long) => bloomBc.value.mightContainLong(h))
    val contaminated = t
      .select(col("doc_id"), explode(shingles(col("text"), n)).as("sh"))
      .select(col("doc_id"), md5Hash60(col("sh")).as("h"))
      .where(mightContain(col("h")))
      .join(benchShingles, Seq("h"), "left_semi")
      .select("doc_id").distinct()
    t.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** `(doc_id, text)` with one representative (minimum id) per distinct
    * content — the exact-dedup-first guard in front of the LSH ops.
    *
    * Shaped narrow on purpose: the keeper set aggregates only
    * (16-byte digest, id) — the text column itself never rides a wide
    * shuffle (the semi join broadcasts the keeper ids at bench scale;
    * AQE falls back to SMJ when they outgrow the broadcast threshold).
    * `minhashPairs` checkpoints its per-doc derivation so this subtree
    * runs once per query no matter how many branches consume it. */
  def distinctContents(df: DataFrame, id: Column, text: Column): DataFrame = {
    val src = df.select(id.as("doc_id"), text.as("text"))
    val keep = src
      .groupBy(md5(col("text")).as("__ch"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    src.join(keep, Seq("doc_id"), "left_semi")
  }

  // ---- shingling ----

  /** Distinct word n-gram shingles of `text`; docs shorter than n words
    * contribute the whole text as one shingle. Native expression — the
    * composed `transform(sequence(...))` form evaluates its lambdas
    * interpreted and measured ~9 s for one explode at sf0.1. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.WordShingles.word_shingles(text, n)

  /** Substring-level exact dedup (the span form of Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better", at word
    * granularity): every word-`n`-gram occurrence that is NOT the
    * corpus-wide first occurrence of its content is marked, and maximal
    * runs of consecutive marked positions merge into spans — the
    * passages a substring-dedup pass would cut while leaving the rest of
    * the document (and the first copy of the passage anywhere) intact.
    * Output: `(doc_id, span_start, span_end, n_shingles)` with word
    * positions 0-based inclusive, `span_end = last marked pos + n - 1`
    * (docs shorter than n words count as one whole-text shingle at pos
    * 0, so their span_end may point past their last word — consistent,
    * documented, and only reachable for sub-`n` docs).
    *
    * Scale shape: posexplode → ONE map-side-combinable groupBy(hash)
    * (`min(struct(doc_id,pos))` = first occurrence, deliberately NOT a
    * row_number window over the hash — a passage repeated 100M times
    * corpus-wide partial-aggregates per partition here instead of
    * collecting every occurrence in one window task) → join back on the
    * hash (AQE skew-join splits hot hashes) → per-doc islands window
    * bounded by doc length. Only (doc_id, pos, 8-byte hash) rows ever
    * shuffle; nothing is quadratic in corpus size. */
  def duplicateSpans(df: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    // fused shingle→hash expression: 8 bytes/shingle at the explode
    // boundary instead of the ~30-char shingle string hashed row-by-row;
    // the scan is spread to cluster width first (Spread: the per-word
    // explode multiplies rows ~100×, and an under-split corpus file
    // would run it on 1-2 cores)
    val occ = Spread.toClusterWidth(df, expansion = 100L)
      .select(id.as("doc_id"),
        posexplode(graft.functions.WordShingles.word_shingle_hashes_pos(text, n)))
      .select(col("doc_id"), col("pos"), col("col").as("h"))
    val firsts = occ.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("keep"),
        count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= 2)
      .select(col("h"), col("keep"))
    val marked = occ.join(firsts, Seq("h"))
      .where(!(col("doc_id") === col("keep.doc_id") && col("pos") === col("keep.pos")))
      .select(col("doc_id"), col("pos"))
    // gaps-and-islands: pos minus its per-doc rank is constant exactly on
    // a run of consecutive marked positions
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked.withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(n - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_shingles"))
      .drop("grp")
  }

  /** C4-style boilerplate removal accounting: every word-`n`-gram whose
    * corpus-wide DOCUMENT frequency is at least `minDf` is boilerplate
    * (the n-gram analog of C4's "line repeated in ≥3 pages" rule — this
    * corpus has no newlines, so the repeated unit is the shingle), and
    * every word position covered by any boilerplate occurrence is
    * removed. Unlike [[duplicateSpans]] (which keeps the corpus-wide
    * FIRST occurrence and cuts the rest), boilerplate removal cuts ALL
    * occurrences including the first — navigation chrome is noise
    * everywhere, not content once.
    *
    * Output, one row per doc: `(doc_id, n_words, n_covered, n_spans,
    * clean_words, frac_removed)` — covered positions are the interval
    * union of `[pos, pos+n−1]` over boilerplate occurrences (clamped to
    * doc length for the sub-`n` whole-text shingle), merged by the same
    * gaps-and-islands window as [[duplicateSpans]].
    *
    * Scale shape: occurrences posexplode scan-side; the df count is a
    * distinct + map-combinable count on the 8-byte hash (never the
    * string); the join-back AQE-splits hot hashes; coverage is merged
    * by an INTERVAL-UNION window (running max of span ends per doc —
    * an occurrence opens a new island iff it starts past everything
    * seen), deliberately not a per-position explode + distinct: that
    * form costs an n× row blow-up plus a corpus-sized distinct
    * exchange for the identical answer (measured 3.7 s → this one's
    * win at sf0.1). One per-doc window, bounded by doc length; linear
    * in corpus size throughout. */
  def boilerplateCoverage(df: DataFrame, id: Column, text: Column, n: Int,
      minDf: Long): DataFrame = {
    // fused shingle→hash expression (see duplicateSpans): the corpus's
    // shingle strings never leave the generating expression; scan
    // spread to cluster width before the row-multiplying explode
    val occ = Spread.toClusterWidth(df, expansion = 100L)
      .select(id.as("doc_id"),
        size(split(trim(text), "\\s+")).cast("long").as("n_words"),
        posexplode(graft.functions.WordShingles.word_shingle_hashes_pos(text, n)))
      .select(col("doc_id"), col("n_words"), col("pos").cast("long").as("pos"),
        col("col").as("h"))
      // consumed twice (df count + join-back): materialize the slim
      // (id, nw, pos, hash) rows once instead of re-hashing the corpus
      .localCheckpoint(false)
    val boiler = occ.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("dfh"))
      .where(col("dfh") >= minDf)
      .select(col("h"))
    val iv = occ.join(boiler, Seq("h"))
      .select(col("doc_id"), col("pos"),
        least(col("pos") + lit((n - 1).toLong), col("n_words") - lit(1L)).as("end"))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevMax = max(col("end")).over(byPos.rowsBetween(Window.unboundedPreceding, -1))
    val perDoc = iv
      // strictly past prevMax+1: an interval starting exactly at
      // prevMax+1 is ADJACENT and extends the island (the position
      // union is contiguous), only a real gap opens a new one
      .withColumn("opens",
        when(prevMax.isNull || col("pos") > prevMax + lit(1L), 1L).otherwise(0L))
      .withColumn("grp", sum(col("opens")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("s"), max(col("end")).as("e"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + lit(1L)).as("n_covered"))
    df.select(id.as("doc_id"),
        size(split(trim(text), "\\s+")).cast("long").as("n_words"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (col("n_words") - coalesce(col("n_covered"), lit(0L))).as("clean_words"),
        (coalesce(col("n_covered"), lit(0L)).cast("double") /
          col("n_words").cast("double")).as("frac_removed"))
  }

  /** Per-document novelty: the fraction of a doc's DISTINCT word
    * n-gram shingles whose corpus-wide first occurrence (min doc_id —
    * ingestion order as novelty order) is this document. The curation
    * signal behind "new information" weighting: near-copies of earlier
    * docs score ~0, fresh content ~1 — the rank-free complement of
    * [[duplicateSpans]] (which locates the copied passages; this prices
    * the doc). Shares its scale shape: one map-combinable `min` per
    * shingle hash, join back on the 8-byte hash (AQE-split), per-doc
    * counts. Output: `(doc_id, n_shingles, n_novel, novelty_ratio)`
    * with the ratio a single integer-ratio IEEE division. */
  def noveltyScores(df: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    // Spread: the shingle explode multiplies rows ~100x off a scan
    // that may be 1-2 row groups (x71 ran at 1.4 cores at sf1)
    val sh = Spread.toClusterWidth(df, expansion = 100L)
      .select(id.as("doc_id"), explode(shingles(text, n)).as("sh"))
      .select(col("doc_id"), md5Hash60(col("sh")).as("h"))
    val firsts = sh.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(firsts, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum((col("doc_id") === col("first_doc")).cast("long")).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_shingles").cast("double"))
          .as("novelty_ratio"))
  }

  /** Exact pairwise n-gram Jaccard via an inverted shingle index:
    * explode distinct shingles, self-join on the shingle to count common
    * shingles per pair, then `jaccard = common / (|a| + |b| - common)`.
    * Only pairs sharing at least one shingle are ever materialized —
    * the scalable exact algorithm (an N² cross join with per-pair
    * `array_intersect` measured 67 s where this runs in seconds). */
  def jaccardPairs(df: DataFrame, id: Column, text: Column, n: Int,
      threshold: Double): DataFrame = {
    val sh = df.select(id.as("doc_id"), explode(shingles(text, n)).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = sh.select(col("sh"), col("doc_id").as("a"))
      .join(sh.select(col("sh"), col("doc_id").as("b")), Seq("sh"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), Seq("b"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Asymmetric containment near-dup: ordered pairs where the fraction
    * of A's shingles that also appear in B is at least `threshold` —
    * catches subset relations (quote farms, wrapper pages, doc-inside-
    * doc) that symmetric Jaccard dilutes: a 50-word quote inside a
    * 5000-word page has tiny Jaccard but containment 1.0. Same inverted
    * shingle index as [[jaccardPairs]] (only co-shingled pairs ever
    * materialize); the score is one integer-ratio division. */
  def containmentPairs(df: DataFrame, id: Column, text: Column, n: Int,
      threshold: Double): DataFrame = {
    val sh = df.select(id.as("doc_id"), explode(shingles(text, n)).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = sh.select(col("sh"), col("doc_id").as("a"))
      .join(sh.select(col("sh"), col("doc_id").as("b")), Seq("sh"))
      .where(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), Seq("a"))
      .withColumn("containment",
        col("common").cast("double") / col("na").cast("double"))
      .where(col("containment") >= threshold)
      .select(col("a"), col("b"), col("containment"))
  }

  /** Prefix-filtered exact Jaccard join (the PPJoin family —
    * Chaudhuri/Ganti/Kaushik ICDE 2006 prefix filter; Vernica/Carey/Li
    * SIGMOD 2010 for the MapReduce shape): the same output contract as
    * [[jaccardPairs]] (all unordered pairs with Jaccard >= threshold
    * over distinct word-n-gram shingle HASHES), but the inverted index
    * holds only each document's PREFIX — its `|S| - ceil(t*|S|) + 1`
    * rarest shingles under the global (document-frequency, hash)
    * order — instead of all of them.
    *
    * Why that is exact: if J(A,B) >= t then |A∩B| >= ceil(t*max(|A|,|B|))
    * >= ceil(t*|A|), and two sets sharing at least alpha elements must
    * collide inside their first `|S| - alpha + 1` elements of ANY common
    * total order (pigeonhole). So every qualifying pair surfaces as a
    * candidate, and the verify step (exact intersection of the full
    * hash sets) discards every false positive. A length filter
    * (`t*na <= nb <= na/t`, also implied by J >= t) prunes candidates
    * before the per-pair verify.
    *
    * 100 TB posture vs [[jaccardPairs]]: the bucket self-join touches
    * only prefix postings — a (1-t) fraction of the index, and the
    * rare-FIRST order puts the surviving postings in the LOW-df buckets,
    * so the quadratic-in-bucket-size blowup lands on df~1 shingles
    * instead of boilerplate. Verification is one row per candidate pair
    * (array_intersect of two per-doc hash arrays), never a re-join of
    * the occurrence table. The per-doc rank window partitions by doc_id
    * (no global window), and everything that shuffles is (doc_id,
    * 8-byte hash) slim rows.
    *
    * Flood contract (the object-header rule applies here with extra
    * force): byte-identical copies all emit the SAME prefix hashes, so
    * a 100k-copy flood puts 100k docs in one prefix bucket — quadratic
    * by construction, and no cap can save it without breaking
    * exactness. Run this over [[distinctContents]] output; identical
    * contents are [[exactGroups]]' job. */
  def prefixJaccardPairs(df: DataFrame, id: Column, text: Column, n: Int,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold=$threshold must be in (0,1] — the prefix length " +
        "|S| - ceil(t*|S|) + 1 is only a valid filter there")
    // consumed three times (document frequencies, prefix postings, full
    // verify sets): materialize the slim distinct (doc_id, hash) rows once
    val sh = df.select(id.as("doc_id"), explode(shingles(text, n)).as("s"))
      .select(col("doc_id"), md5Hash60(col("s")).as("h"))
      .distinct().localCheckpoint(false)
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("dfh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val prefix = sh.join(dfreq, Seq("h"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("dfh"), col("h"))))
      .join(sizes, Seq("doc_id"))
      .where(col("rk") <= col("n") - ceil(lit(threshold) * col("n")) + lit(1))
      .select(col("h"), col("doc_id"), col("n"))
    val cand = prefix.select(col("h"), col("doc_id").as("a"), col("n").as("na"))
      .join(prefix.select(col("h"), col("doc_id").as("b"), col("n").as("nb")),
        Seq("h"))
      .where(col("a") < col("b") &&
        col("nb").cast("double") >= lit(threshold) * col("na").cast("double") &&
        col("na").cast("double") >= lit(threshold) * col("nb").cast("double"))
      .select("a", "b").distinct()
    val sets = sh.groupBy("doc_id")
      .agg(sort_array(collect_list(col("h"))).as("hs"), count(lit(1)).as("n"))
    cand
      .join(sets.select(col("doc_id").as("a"), col("hs").as("ha"),
        col("n").as("na")), Seq("a"))
      .join(sets.select(col("doc_id").as("b"), col("hs").as("hb"),
        col("n").as("nb")), Seq("b"))
      .withColumn("common", size(array_intersect(col("ha"), col("hb"))).cast("long"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("na") + col("nb") - col("common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Sorted-neighborhood dedup candidates (Hernández/Stolfo SIGMOD 1995,
    * the merge/purge method): sort the corpus by a cheap blocking key
    * (the first `keyLen` chars of the lowercased text), slide a window
    * of `window` consecutive rows over the sorted order, and score only
    * the pairs that co-occur inside a window — N·(window-1) candidates
    * total, by construction, no matter how skewed the data. The pairs
    * that score >= `threshold` exact shingle-hash Jaccard are returned
    * as `(a, b, jaccard)` with a < b.
    *
    * This is the third candidate-generation regime next to the inverted
    * index (x6/x91: exact, cost ~ posting-list volume) and MinHash LSH
    * (x7: probabilistic, cost ~ band buckets): SNM's cost is EXACTLY
    * linear in N and its recall is whatever the blocking key earns —
    * near-dups whose first `keyLen` chars diverge sort apart and are
    * missed, which is the documented trade (run multiple passes with
    * different keys to recover, as the original paper does).
    *
    * 100 TB posture: the global order comes from the two-phase rank
    * (range-partitioned sort + per-partition row_number + broadcast
    * offsets — `Batching.withBatches`' shape, no global window); the
    * window pairing is an equi-join on `rn + k = rn'` with the (window-1)
    * offsets exploded scan-side; scoring joins two slim per-doc hash
    * arrays per candidate. Nothing is quadratic, nothing funnels through
    * one task. */
  def sortedNeighborPairs(df: DataFrame, id: Column, text: Column,
      keyLen: Int, window: Int, n: Int, threshold: Double): DataFrame = {
    require(window >= 2, s"window=$window: need at least adjacent pairs")
    require(keyLen >= 1, s"keyLen=$keyLen must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(id.as("doc_id"), text.as("__t"))
      .withColumn("k", substring(lower(trim(col("__t"))), 1, keyLen))
    // two-phase global rank over (k, doc_id): range sort, partition-local
    // row_number, broadcast per-partition offsets (numPartitions rows on
    // the driver — not data)
    val sorted = base.sort(col("k"), col("doc_id"))
      .withColumn("_pid", spark_partition_id())
    val counts = sorted.groupBy("_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val off = acc; acc += c; (pid, off) }
    val ranked = sorted
      .withColumn("_lrn", row_number().over(
        Window.partitionBy(col("_pid")).orderBy(col("k"), col("doc_id"))))
      .join(broadcast(offsets.toSeq.toDF("_pid", "_off")), "_pid")
      .withColumn("rn", col("_off") + col("_lrn"))
      .select(col("doc_id"), col("rn"))
    val cand = ranked
      .withColumn("off", explode(sequence(lit(1L), lit((window - 1).toLong))))
      .withColumn("rnb", col("rn") + col("off"))
      .select(col("doc_id").as("da"), col("rnb"))
      .join(ranked.select(col("doc_id").as("db"), col("rn").as("rnb")), Seq("rnb"))
      .select(least(col("da"), col("db")).as("a"),
        greatest(col("da"), col("db")).as("b"))
    val sets = df.select(id.as("doc_id"), explode(shingles(text, n)).as("s"))
      .select(col("doc_id"), md5Hash60(col("s")).as("h")).distinct()
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("h"))).as("hs"), count(lit(1)).as("nn"))
    cand
      .join(sets.select(col("doc_id").as("a"), col("hs").as("ha"),
        col("nn").as("na")), Seq("a"))
      .join(sets.select(col("doc_id").as("b"), col("hs").as("hb"),
        col("nn").as("nb")), Seq("b"))
      .withColumn("common", size(array_intersect(col("ha"), col("hb"))).cast("long"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("na") + col("nb") - col("common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    * the MOSS scheme): hash every positional word-`n`-gram, slide a
    * window of `w` consecutive hashes over the document, and keep each
    * window's MINIMUM — the guarantee is that any shared run of at
    * least `w + n − 1` words between two documents yields at least one
    * shared fingerprint, while the kept set is only ~`2/(w+1)` of the
    * hashes (vs ALL of them in the x6 inverted index). The selected
    * set is a pure function of hash VALUES (window minima, duplicates
    * collapsed per doc), so no tie-break rule is needed and the whole
    * selection is reproducible in list SQL.
    *
    * Sub-`w`-window docs (fewer than `w` shingles) contribute their
    * single global minimum; the whole-text shingle rule for sub-`n`
    * docs is inherited from [[shingles]].
    *
    * 100 TB posture: fingerprint selection is entirely scan-side
    * (per-doc array ops, m·w comparisons per doc, no shuffle); only
    * the (doc_id, 8-byte fp) pairs leave the scan. Output: one row per
    * distinct (doc_id, fp). */
  def winnowFingerprints(df: DataFrame, id: Column, text: Column,
      n: Int, w: Int): DataFrame = {
    require(n >= 1 && w >= 1, s"n=$n and w=$w must be >= 1")
    val hs = transform(
      graft.functions.WordShingles.word_shingles_pos(text, n),
      s => md5Hash60(s))
    val m = size(col("__hs"))
    val fps = array_distinct(
      when(m <= w, array(array_min(col("__hs"))))
        .otherwise(transform(sequence(lit(1), m - w + 1),
          i => array_min(slice(col("__hs"), i, lit(w))))))
    df.select(id.as("doc_id"), hs.as("__hs"))
      .select(col("doc_id"), explode(fps).as("fp"))
  }

  /** Cross-doc similarity pairs from shared winnowing fingerprints —
    * the x6 shape at winnowed density: the inverted index holds
    * ~`2/(w+1)` of the n-gram postings, so the bucket self-join
    * touches proportionally fewer rows for the same ≥(w+n−1)-word
    * overlap guarantee. Same hot-bucket stop-gram cap as
    * [[jaccardPairs]] (`maxFpDf`): a boilerplate fingerprint shared by
    * 100k docs would emit 10^10 pairs from one bucket; capped, each
    * contributes ≤ maxFpDf². Output: `(doc_a, doc_b, n_shared)`,
    * doc_a < doc_b. */
  def sharedFingerprintPairs(df: DataFrame, id: Column, text: Column,
      n: Int, w: Int, maxFpDf: Long = 64L): DataFrame = {
    // consumed three times (df count + both sides of the self-join):
    // materialize the slim (doc_id, 8-byte fp) rows once instead of
    // re-shingling and re-hashing the corpus per consumer
    val fp = winnowFingerprints(df, id, text, n, w).localCheckpoint(false)
    val kept = fp.groupBy(col("fp")).agg(count(lit(1)).as("dfp"))
      .where(col("dfp") <= maxFpDf)
      .select(col("fp"))
    val occ = fp.join(kept, Seq("fp"))
    occ.select(col("fp"), col("doc_id").as("doc_a"))
      .join(occ.select(col("fp"), col("doc_id").as("doc_b")), Seq("fp"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  // ---- engine-reproducible hashing ----

  /** 60-bit base hash: the first 15 hex chars of md5, as a BIGINT.
    * Reproducible anywhere md5 exists (DuckDB:
    * `('0x' || substring(md5(x),1,15))::BIGINT`); 60 bits keeps every
    * downstream product inside signed-64 range under ANSI mode. Native
    * expression — digest straight to long, no hex-string round-trip
    * (the composed `conv(substring(md5(x),1,15),16,10)` form measured
    * ~2× slower on the x7/x8 bench). */
  def md5Hash60(c: Column): Column =
    graft.functions.Md5Hash60.md5_hash60(c)

  /** Modulus of the 2-universal seeded family (31-bit prime). */
  val HashP: Long = 1000000007L

  /** Deterministic per-seed coefficients (a, b, c) with a,b in [1,p-1],
    * c in [0,p-1] — splitmix64 from a fixed seed, so the identical table
    * can be embedded as literals in oracle SQL. */
  def hashCoeffs(k: Int): Seq[(Long, Long, Long)] = {
    var x = 1313L
    def next(): Long = {
      x += -7046029254386353131L
      var z = x
      z = (z ^ (z >>> 30)) * -4658895280553007687L
      z = (z ^ (z >>> 27)) * -7723592293110705685L
      z ^ (z >>> 31)
    }
    Seq.fill(k)((
      (next() >>> 11) % (HashP - 1) + 1,
      (next() >>> 11) % (HashP - 1) + 1,
      (next() >>> 11) % HashP))
  }

  /** Seeded hash i of a 60-bit base hash: split into two 30-bit halves,
    * `(a·lo + b·hi + c) mod p`. All intermediates < 2^61 — ANSI-safe. */
  private def seededHash(h: Column, abc: (Long, Long, Long)): Column = {
    val lo = h.bitwiseAND(lit((1L << 30) - 1))
    val hi = shiftright(h, 30)
    (lit(abc._1) * lo + lit(abc._2) * hi + lit(abc._3)) % lit(HashP)
  }

  // ---- MinHash + LSH ----

  /** MinHash signatures: one row per doc with `numHashes` min-hash
    * columns `mh_0..mh_{k-1}`, computed with a single explode + groupBy
    * (each min is map-side combinable). */
  def minhashSignatures(df: DataFrame, id: Column, text: Column,
      n: Int, numHashes: Int): DataFrame = {
    val coeffs = hashCoeffs(numHashes)
    val exploded = df
      .select(id.as("doc_id"), explode(shingles(text, n)).as("sh"))
      .withColumn("h", md5Hash60(col("sh")))
    val mins = coeffs.zipWithIndex.map { case (abc, i) =>
      min(seededHash(col("h"), abc)).as(s"mh_$i")
    }
    exploded.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** Near-duplicate pairs via banded LSH over MinHash signatures, then
    * exact-Jaccard verification of the candidates only. Runs over
    * distinct contents and skips buckets > `maxBucket` (see the
    * hot-bucket guards in the object doc).
    *
    * With `numHashes = bands * rowsPerBand`, a pair with Jaccard j is a
    * candidate with probability 1-(1-j^rows)^bands (e.g. 32 bands × 2
    * rows ⇒ ~99.99% at j=0.5).
    *
    * One pass over the text: the scan → distinct-contents → shingle →
    * md5 subtree is locally checkpointed as the narrow `(doc_id, h)`
    * hash stream (16 bytes/shingle, no strings), and BOTH downstream
    * aggregations — the 64-way min signature and the per-doc distinct
    * hash set — read those materialized blocks. Keeping `collect_set`
    * in its own aggregate (instead of alongside the mins) matters: one
    * TypedImperativeAggregate would force the whole 65-buffer aggregate
    * off the codegen HashAggregate path. Verification Jaccard is over
    * the HASHED shingles — identical to string Jaccard absent a 60-bit
    * collision, and the oracle hashes with the same md5 derivation, so
    * the contract is symmetric either way. */
  def minhashPairs(df: DataFrame, id: Column, text: Column,
      n: Int = 3, numHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.5, maxBucket: Int = 1 << 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    require(rows <= 2, "band packing mh0*p+mh1 holds <= 2 rows per band")
    val coeffs = hashCoeffs(numHashes)
    val hashed = distinctContents(df, id, text)
      .select(col("doc_id"), explode(shingles(col("text"), n)).as("sh"))
      .select(col("doc_id"), md5Hash60(col("sh")).as("h"))
      .localCheckpoint(false)
    val mins = coeffs.zipWithIndex.map { case (abc, i) =>
      min(seededHash(col("h"), abc)).as(s"mh_$i")
    }
    val sigs = hashed.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    // pinned (round 18): the a-side and b-side verify joins below each
    // embed this collect_set aggregation — without the pin it ran
    // twice per query (exchange reuse across differently-named aliases
    // is not guaranteed). Doc-cardinality rows, same posture as the
    // `hashed` checkpoint above.
    val hsets = hashed.groupBy(col("doc_id"))
      .agg(collect_set(col("h")).as("hs"))
      .localCheckpoint(false)
    // band hash packs the band's mins exactly (each min < p): mh0*p + mh1
    val bandCols = (0 until bands).map { bIdx =>
      val bh = (0 until rows).map(r => col(s"mh_${bIdx * rows + r}"))
        .reduce((acc, m) => acc * lit(HashP) + m)
      struct(lit(bIdx).as("band"), bh.as("bh"))
    }
    // bucket-size guard as a count window over the SAME (band,bh) hash
    // partitioning the self-join needs — no extra aggregation branch,
    // no semi join, and the join reuses the window's exchange
    val bucketW = Window.partitionBy(col("band"), col("bh"))
    val guarded = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
      .withColumn("__n", count(lit(1)).over(bucketW))
      .where(col("__n") <= maxBucket)
      .drop("__n")
      // pinned (round 18): both self-join sides embed the 64-aggregate
      // signature groupBy — without the pin it ran twice per query.
      // `bands` narrow rows per doc.
      .localCheckpoint(false)
    val l = guarded.select(col("band"), col("bh"), col("doc_id").as("a"))
    val r = guarded.select(col("band"), col("bh"), col("doc_id").as("b"))
    val candidates = l.join(r, Seq("band", "bh")).where(col("a") < col("b"))
      .select("a", "b").distinct()
    // verify candidates with exact Jaccard over the hashed shingle sets
    candidates
      .join(hsets.select(col("doc_id").as("a"), col("hs").as("ha")), Seq("a"))
      .join(hsets.select(col("doc_id").as("b"), col("hs").as("hb")), Seq("b"))
      .withColumn("jaccard",
        size(array_intersect(col("ha"), col("hb"))).cast("double") /
          size(array_union(col("ha"), col("hb"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** LSH estimator-calibration audit: for every banded candidate pair,
    * compare the SIGNATURE estimate of Jaccard (fraction of matching
    * MinHash components — the number the banding decision is implicitly
    * trusting) against the exact Jaccard over the hashed shingle sets,
    * folded into estimate deciles. The output is the reliability table a
    * dedup pipeline reads before picking `threshold`/`bands`: if decile
    * 5 (est 0.5–0.6) shows mean-absolute-error of 0.2, the band
    * parameters are lying and the downstream keep/drop boundary is
    * noise. Columns: `(decile, n_pairs, mae_e6, mean_exact_e6)` — all
    * exact integers (est/exact in e6 fixed point, means by integer DIV).
    *
    * 100 TB posture: candidate generation is byte-identical to
    * [[minhashPairs]] (distinct contents → one checkpointed hash stream
    * → banded buckets with the `maxBucket` hot-bucket guard), so the
    * audit costs the SAME plan the production pairer runs plus two slim
    * per-pair hash joins on doc id (signatures: numHashes longs/row;
    * sets: the verification payload the pairer already carries) and one
    * combinable 11-key decile rollup. Nothing new is quadratic; the
    * audit rides the guards that bound the pairer.
    *
    * Reference contract: calibrates the estimator of Broder's MinHash
    * (resemblance estimation) as used by `minhashPairs`
    * (reference behavior: StreamTest.cpp has no near-dup machinery —
    * this is the beyond-reference LLM-pipeline surface). */
  def lshCalibration(df: DataFrame, id: Column, text: Column,
      n: Int = 3, numHashes: Int = 64, bands: Int = 32,
      maxBucket: Int = 1 << 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    require(rows <= 2, "band packing mh0*p+mh1 holds <= 2 rows per band")
    val coeffs = hashCoeffs(numHashes)
    val hashed = distinctContents(df, id, text)
      .select(col("doc_id"), explode(shingles(col("text"), n)).as("sh"))
      .select(col("doc_id"), md5Hash60(col("sh")).as("h"))
      .localCheckpoint(false)
    val mins = coeffs.zipWithIndex.map { case (abc, i) =>
      min(seededHash(col("h"), abc)).as(s"mh_$i")
    }
    val sigs = hashed.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .localCheckpoint(false)
    val hsets = hashed.groupBy(col("doc_id"))
      .agg(collect_set(col("h")).as("hs"))
    val bandCols = (0 until bands).map { bIdx =>
      val bh = (0 until rows).map(r => col(s"mh_${bIdx * rows + r}"))
        .reduce((acc, m) => acc * lit(HashP) + m)
      struct(lit(bIdx).as("band"), bh.as("bh"))
    }
    val bucketW = Window.partitionBy(col("band"), col("bh"))
    val guarded = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
      .withColumn("__n", count(lit(1)).over(bucketW))
      .where(col("__n") <= maxBucket)
      .drop("__n")
      // pinned (round 18): both self-join sides embed the 64-aggregate
      // signature groupBy — without the pin it ran twice per query.
      // `bands` narrow rows per doc.
      .localCheckpoint(false)
    val l = guarded.select(col("band"), col("bh"), col("doc_id").as("a"))
    val r = guarded.select(col("band"), col("bh"), col("doc_id").as("b"))
    val candidates = l.join(r, Seq("band", "bh")).where(col("a") < col("b"))
      .select("a", "b").distinct()
    val sa = sigs.select(
      (col("doc_id").as("a") +:
        (0 until numHashes).map(i => col(s"mh_$i").as(s"sa_$i"))): _*)
    val sb = sigs.select(
      (col("doc_id").as("b") +:
        (0 until numHashes).map(i => col(s"mh_$i").as(s"sb_$i"))): _*)
    val matchCol = (0 until numHashes)
      .map(i => when(col(s"sa_$i") === col(s"sb_$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val est = candidates.join(sa, Seq("a")).join(sb, Seq("b"))
      .select(col("a"), col("b"), matchCol.as("matches"))
      .withColumn("est_e6", expr(s"matches * 1000000 DIV $numHashes"))
    val ex = candidates
      .join(hsets.select(col("doc_id").as("a"), col("hs").as("ha")), Seq("a"))
      .join(hsets.select(col("doc_id").as("b"), col("hs").as("hb")), Seq("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("ha"), col("hb"))).cast("long").as("ni"),
        size(array_union(col("ha"), col("hb"))).cast("long").as("nu"))
      .withColumn("exact_e6", expr("ni * 1000000 DIV nu"))
    est.join(ex, Seq("a", "b"))
      .withColumn("decile", expr("CAST(est_e6 DIV 100000 AS INT)"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("abs(est_e6 - exact_e6)")).as("__sae"),
        sum(col("exact_e6")).as("__se"))
      .withColumn("mae_e6", expr("__sae DIV n_pairs"))
      .withColumn("mean_exact_e6", expr("__se DIV n_pairs"))
      .select("decile", "n_pairs", "mae_e6", "mean_exact_e6")
  }

  // ---- near-dup clustering ----

  /** Connected components over a near-dup pair set via min-label
    * propagation: every node's label converges to the minimum doc id in
    * its component — which IS the keep-decision for cluster dedup (keep
    * the label row, drop the rest). Each iteration is one distributed
    * join + combinable min-aggregate over checkpointed labels; the loop
    * runs to fixpoint (bounded by `maxIters`, erroring rather than
    * returning a half-converged labeling). Each round is a neighbor-min
    * relaxation followed by a pointer-doubling hop (`label :=
    * label(label)` over the already-relaxed table), so effective
    * propagation distance roughly doubles per round: convergence is
    * O(log diameter) — the large-star/small-star bound — and a
    * 1000-link chain closes in ~11 rounds. Only (node, label) longs
    * ever shuffle. Output: `(doc_id, cluster)` for every doc appearing
    * in a pair; singletons are their own implicit cluster. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    // Materialize the (possibly expensive) pair pipeline ONCE before the
    // symmetrizing union: without this the union's two branches each
    // embed the full pairs subtree and only exchange reuse — which AQE
    // doesn't always manage across union arms — saves the second run.
    val p = pairs.select(col("a"), col("b")).localCheckpoint(false)
    val edges = p.select(col("a").as("u"), col("b").as("v"))
      .unionAll(p.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(false)
    // lazy checkpoints throughout the loop (round-16 job-count audit):
    // each round's convergence count is the first action and computes
    // every partition, so lineage cuts exactly as before — minus two
    // materialization jobs per round (x39/x64/x86/x158-family constant)
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("v"), col("label")), Seq("v"))
        .groupBy(col("u").as("id")).agg(min(col("label")).as("nbr_label"))
      // Carry the old label through the checkpoint: the convergence
      // check then is a filter-count over already-materialized rows —
      // one job per iteration instead of two (the old second job
      // re-joined next against labels just to find changed rows).
      val relaxed = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        // relaxed stays EAGER: the pointer-doubling self-join reads it
        // TWICE in one stage, and a lazy checkpoint's partitions racing
        // to cache would compute the nbrMin join roughly twice
        .localCheckpoint(true)
      // Pointer-doubling shortcut: label := label(label). Labels only
      // ever decrease and every label VALUE is itself a node id present
      // in this table (ids propagate, nothing is invented), so the
      // labels-only self-join resolves one more hop — and because the
      // parent side is already post-relaxation, effective propagation
      // distance roughly DOUBLES each round. Convergence drops from
      // O(diameter) to O(log diameter) — the large-star/small-star
      // bound — without touching the edge set: a 1000-link chain
      // converges in ~11 rounds where plain min-propagation errored at
      // maxIters=25. Cost: one extra labels-sized hash join per round
      // (no edges scan; `relaxed` is materialized so nbrMin runs once).
      val next = relaxed
        .join(relaxed.select(col("id").as("label"), col("label").as("hop2")),
          Seq("label"), "left")
        .select(col("id"), col("old"),
          coalesce(col("hop2"), col("label")).as("label"))
        .localCheckpoint(false)
      changed = next.where(col("label") =!= col("old")).count()
      // `next` is independently materialized, so the previous round's
      // checkpoint blocks are dead weight from here on — free them
      // eagerly instead of waiting for session GC (on a large pair set
      // every retained round is a full (node,label) copy in block store).
      freeLocalCheckpoint(labels)
      freeLocalCheckpoint(relaxed)
      labels = next.select(col("id"), col("label"))
      it += 1
    }
    require(changed == 0,
      s"connectedComponents did not converge in $maxIters iterations")
    labels.select(col("id").as("doc_id"), col("label").as("cluster"))
  }

  /** Eagerly drop the block-store copy behind a `localCheckpoint`ed
    * frame. `Dataset.unpersist()` only clears cache-manager entries, not
    * checkpoint RDD blocks (those normally live until the RDD is GC'd),
    * so reach through the plan's `LogicalRDD` leaf instead. */
  private def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  // ---- SimHash ----

  /** 60-bit SimHash per doc: tokens md5-hashed to 60 bits; each bit of
    * the fingerprint is the sign of the per-bit vote sum. One explode +
    * one groupBy (60 map-side-combinable sums). */
  def simhash(df: DataFrame, id: Column, text: Column): DataFrame = {
    val exploded = df
      .select(id.as("doc_id"), explode(split(trim(text), "\\s+")).as("tok"))
      .withColumn("h", md5Hash60(col("tok")))
    val votes = (0 until 60).map { j =>
      sum(when(getbit(col("h"), lit(j)) === 1, 1).otherwise(-1)).as(s"v_$j")
    }
    val bits: Seq[Column] = (0 until 60).map { j =>
      when(col(s"v_$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }
    exploded.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
  }

  /** Pairs within `maxHamming` of each other, found by 4×15-bit block
    * LSH (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 blocks equal).
    * Buckets larger than `maxBucket` are skipped (hot-bucket guard;
    * compose with `distinctContents` upstream so byte-identical docs
    * can't flood a block). */
  def simhashPairs(sigs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 1 << 16): DataFrame = {
    val blocks = (0 until 4).map { blk =>
      struct(lit(blk).as("blk"),
        (shiftright(col("simhash"), blk * 15).bitwiseAND(lit(0x7FFFL))).as("key"))
    }
    val bucketW = Window.partitionBy(col("blk"), col("key"))
    val guarded = sigs
      .select(col("doc_id"), col("simhash"), explode(array(blocks: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.blk").as("blk"), col("b.key").as("key"))
      .withColumn("__n", count(lit(1)).over(bucketW))
      .where(col("__n") <= maxBucket)
      .drop("__n")
      // pinned (round 18): both self-join sides embed this subtree —
      // without the pin the upstream hashing + bucket-guard window ran
      // twice per query (exchange reuse across differently-projected
      // aliases is not guaranteed). 4 narrow rows per doc.
      .localCheckpoint(false)
    val l = guarded.select(col("blk"), col("key"), col("doc_id").as("a"), col("simhash").as("sa"))
    val r = guarded.select(col("blk"), col("key"), col("doc_id").as("b"), col("simhash").as("sb"))
    l.join(r, Seq("blk", "key")).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Character-level fuzzy-dup pairs: exact Levenshtein distance over
    * length-band-blocked candidates. Each doc lands in its own length
    * band (`length div bandWidth`) AND the next one up, so near-dups
    * straddling a band boundary still meet; pairs are then deduped, the
    * distance is computed once per pair on a `prefixLen`-char prefix
    * (bounding the O(p²) DP), and only pairs within `maxDist` survive.
    * The record-linkage baseline MinHash can't give you — an exact edit
    * metric, not a set overlap.
    *
    * 100 TB posture: banding restores an equi-join (never all-pairs);
    * bands fatter than `maxBand` candidates are DROPPED with the same
    * loud-refusal contract as the LSH bucket caps (a single band of m
    * docs is m²/2 DP runs — the cap bounds the worst band). Both the
    * cap and the two-band probe are mirrored verbatim in the oracle.
    * Output: (id_a, id_b, dist int). */
  def editDistancePairs(docs: DataFrame, id: Column, text: Column,
      bandWidth: Int = 32, prefixLen: Int = 200, maxDist: Int = 48,
      maxBand: Int = 128): DataFrame = {
    require(bandWidth >= 1 && prefixLen >= 1 && maxDist >= 0 && maxBand >= 2,
      s"editDistancePairs(bandWidth=$bandWidth, prefixLen=$prefixLen, " +
        s"maxDist=$maxDist, maxBand=$maxBand): all knobs must be positive")
    val base = docs.select(id.as("doc_id"),
      substring(text, 1, prefixLen).as("p"),
      (length(text).cast("long") / bandWidth).cast("long").as("band"))
    // both band copies (home + band+1 shadow) explode from ONE pass
    // over the scan (round 18 — the two-arm union embedded the scan +
    // prefix projection under both arms)
    val cand = base.select(col("doc_id"), col("p"),
        explode(array(col("band"), col("band") + 1)).as("band"))
      // three consumers (band counts + both join sides): checkpoint so
      // the doc scan + prefix projection is paid once
      .localCheckpoint(false)
    // band-size guard as a combinable count join, NOT a window: bands
    // are length-shaped (low-cardinality), so a count-over window on
    // the bare band would funnel the whole candidate set through
    // |bands| tasks (round 14). NO broadcast hint (round 18): the
    // counts table's cardinality is a property of the DATA (max doc
    // length / bandWidth) — AQE broadcasts it while small and falls
    // back to a shuffle join if a pathological corpus ever makes it
    // large, instead of forcing an unbounded driver-side build
    val bandCounts = cand.groupBy("band").agg(count(lit(1)).as("__n"))
    val guarded = cand.join(bandCounts, Seq("band"))
      .where(col("__n") <= maxBand).drop("__n")
    val l = guarded.select(col("band"), col("doc_id").as("id_a"), col("p").as("pa"))
    val r = guarded.select(col("band"), col("doc_id").as("id_b"), col("p").as("pb"))
    l.join(r, Seq("band")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("pa"), col("pb"))
      .distinct()
      // banded DP: the threshold overload early-exits any pair whose
      // distance exceeds maxDist (returning -1), cutting the per-pair
      // cost from O(p²) to O(p·maxDist) — same surviving pairs, same
      // exact distances, ~4× less work on the dominant reject path
      .select(col("id_a"), col("id_b"),
        levenshtein(col("pa"), col("pb"), maxDist).cast("int").as("dist"))
      .where(col("dist") >= 0)
  }

  /** Corpus saturation curve: split the corpus into `buckets` doc-id
    * slices and measure, per slice, how many word-5-gram OCCURRENCES it
    * contributes vs how many of its n-grams are NEW (first seen in that
    * slice) — the diminishing-returns readout that tells you whether
    * the next 10% of a crawl still adds content or just repeats it
    * (the corpus-level integral of [[noveltyScores]]'s per-doc ratio).
    *
    * `nDocs` is resolved once at plan build (the [[graft.ext.Similarity.strideForCells]]
    * doctrine) so the slicing is scale-invariant; the oracle mirrors it
    * as a scalar subquery. Two combinable counting aggs over the hash
    * stream + a `buckets`-row broadcast self-join for the cumulative —
    * no window anywhere. Output: (bucket, n_occ, n_new, new_e6,
    * cum_new) ordered by bucket. */
  def noveltyCurve(df: DataFrame, id: Column, text: Column,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets must be >= 2")
    val nDocs = df.count()
    require(nDocs > 0, "noveltyCurve: empty corpus")
    def bucketOf(name: String): Column = // integer floor, mirrored as `// n` in SQL
      least(expr(s"$name * $buckets DIV ${nDocs}L"), lit(buckets - 1)).cast("long")
    val occ = df.select(id.as("doc_id"),
        explode(graft.functions.WordShingles.word_shingles(text, 5)).as("g"))
      .select(col("doc_id"), md5Hash60(col("g")).as("h"))
    val perBucket = occ.groupBy(bucketOf("doc_id").as("bucket"))
      .agg(count(lit(1)).as("n_occ"))
    val news = occ.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(bucketOf("first_doc").as("bucket"))
      .agg(count(lit(1)).as("n_new"))
    val base = perBucket.join(news, Seq("bucket"), "left")
      .select(col("bucket"), col("n_occ"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val cum = base.select(col("bucket").as("b2"), col("n_new").as("nn2"))
    base.join(broadcast(cum), col("b2") <= col("bucket"))
      .groupBy("bucket", "n_occ", "n_new")
      .agg(sum(col("nn2")).as("cum_new"))
      .select(col("bucket"), col("n_occ"), col("n_new"),
        expr("n_new * 1000000L DIV n_occ").as("new_e6"), col("cum_new"))
  }

  /** Normalization-aware exact dedup: canonicalize (lowercase, strip
    * sentence punctuation, collapse whitespace runs, trim) BEFORE
    * hashing, so trivially-reformatted copies that byte-exact dedup
    * ([[exactGroups]]) misses land in one group. `n_raw_variants`
    * counts the distinct RAW byte contents inside each group — the
    * measure of what canonicalization bought over x1.
    *
    * Same 100 TB shape as exactGroups: the normalize is scan-side
    * column math, then ONE combinable groupBy on the 16-byte digest
    * (raw variants via a distinct-digest count, still one exchange).
    * Output: (norm_hash, keep_id, n_copies, n_raw_variants). */
  def normalizedGroups(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val canon = trim(regexp_replace(
      regexp_replace(lower(text), "[.,!?;:]", ""), "\\s+", " "))
    docs.select(id.as("doc_id"), md5(canon).as("norm_hash"),
      md5(text).as("raw_hash"))
      .groupBy("norm_hash")
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        count_distinct(col("raw_hash")).as("n_raw_variants"))
  }

  /** Cluster-level dedup keeper election: x39's connected components
    * joined back to a quality measure, electing per cluster the member
    * with the HIGHEST quality (ties to the lowest id — total order) and
    * reporting what dropping the rest saves. Pairs tell you what is
    * duplicated; this is the table the actual delete runs from.
    *
    * 100 TB posture: components ship (id, cluster) longs only; the
    * quality join is an equi-join at member cardinality; the election
    * is ONE combinable max(struct) groupBy — never a cluster window.
    * Output: (cluster, keeper_id, n_members, chars_total, chars_saved). */
  def clusterKeepers(pairs: DataFrame, quality: DataFrame, id: Column,
      measure: Column): DataFrame = {
    val cc = connectedComponents(pairs)
    val q = quality.select(id.cast("long").as("doc_id"),
      measure.cast("long").as("m"))
    cc.join(q, Seq("doc_id"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("m")).as("chars_total"),
        max(struct(col("m"), (-col("doc_id")).as("nid"))).as("peak"))
      .select(col("cluster"),
        (-col("peak.nid")).as("keeper_id"),
        col("n_members"), col("chars_total"),
        (col("chars_total") - col("peak.m")).as("chars_saved"))
  }

  /** Content-defined chunking at WORD granularity — the Rabin/LBFS idea
    * with the repo's reproducible hash as the boundary oracle: a word
    * whose `md5Hash60 mod mask == 0` OPENS a new chunk (expected chunk
    * length ≈ `mask` words), so an insertion early in a document shifts
    * only the chunk it lands in — every later boundary re-synchronizes,
    * which is exactly why CDC beats fixed-size blocks for storage-level
    * dedup of edited corpora. Position 0 always opens chunk 0.
    *
    * 100 TB posture: boundary detection is pure scan-side column math
    * on the exploded words; chunk assembly is ONE per-document
    * gaps-and-islands window (running sum of boundary flags, bounded by
    * doc length) + a group-local sorted fold into the chunk hash (the
    * [[graft.ext.Curation.merkleFingerprint]] idiom) — no self-join, no
    * global anything. Chunk-hash equality across docs then powers
    * chunk-level dedup accounting at a groupBy.
    * Output: (doc_id, chunk_idx, start_pos, n_words, chunk_hash). */
  def cdcChunks(docs: DataFrame, id: Column, text: Column,
      mask: Int = 64): DataFrame = {
    require(mask >= 2 && mask <= 65536, s"mask=$mask out of range")
    val w = docs
      .select(id.as("doc_id"), posexplode(split(trim(text), "\\s+")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("word"))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w.withColumn("opens",
        when(col("pos") > 0 &&
          pmod(md5Hash60(col("word")), lit(mask.toLong)) === 0, 1L)
          .otherwise(0L))
      .withColumn("chunk_idx", sum(col("opens")).over(byPos))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(min(col("pos")).as("start_pos"),
        count(lit(1)).as("n_words"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("word")))),
          x => x.getField("word")))).as("chunk_hash"))
  }

  /** Chunk-level exact dedup accounting — the paragraph/block-dedup
    * move (RefinedWeb/CCNet-style) that sits BETWEEN whole-document
    * exact dedup (x1: misses partial copies) and substring/boilerplate
    * dedup (x56/x66: shingle machinery): documents split into fixed
    * `window`-char non-overlapping blocks on [[graft.ext.Packing.chunk]]'s
    * exact grid, a block VALUE is cross-doc-duplicated when it occurs in
    * >= `minDocs` DISTINCT documents, and each document reports how much
    * of it is duplicated mass. The cheap first-pass filter a pipeline
    * runs before spending near-dup budget.
    *
    * 100 TB posture: text never shuffles — the wire carries (doc_id,
    * 32-hex-char md5) pairs, collapsed to (hash, doc) CELLS before
    * anything joins; the distinct-doc count and the join back both run
    * at cell cardinality, and a VIRAL block (the skew corpus's 210k-doc
    * flood) is one cell per doc with a broadcast-size hot key, never a
    * row explosion.
    *
    * Empty/NULL content (round-16, advisor find): zero-length chunks
    * carry no content, so hashing them would declare every pair of
    * empty/NULL-text documents mutual 100%-duplicates — semantically
    * wrong for a curation op. Empty and NULL chunks are FILTERED before
    * hashing; a document with no non-empty content has no chunk
    * accounting and emits NO row (mirrored in the x259 oracle).
    * Output: (doc_id, n_chunks, n_dup_chunks, dup_ppm). */
  def chunkDedup(docs: DataFrame, id: Column, text: Column,
      window: Int = 200, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"chunkDedup: minDocs=$minDocs must be >= 2")
    val cells = graft.ext.Packing.chunk(docs.select(id.as("doc_id"), text.as("text")),
        col("doc_id"), col("text"), window = window, overlap = 0)
      .where(col("chunk").isNotNull && length(col("chunk")) > 0)
      .select(col("doc_id"), md5(col("chunk")).as("h"))
      .groupBy("h", "doc_id").agg(count(lit(1)).as("c"))
    val nd = cells.groupBy("h").agg(count(lit(1)).as("nd"))
    cells.join(nd, Seq("h"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_chunks"),
        sum(when(col("nd") >= minDocs, col("c")).otherwise(0L))
          .as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        expr("n_dup_chunks * 1000000L DIV n_chunks").as("dup_ppm"))
  }
}
