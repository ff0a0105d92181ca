package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sketch summaries with a DETERMINISTIC hash, so the sketch
  * itself — not just what it estimates — is reproducible on any engine
  * that has md5. Spark's own `approx_count_distinct` (HLL++) is the
  * production default, but its xxhash-based registers are opaque to a
  * cross-engine oracle; this family trades its bias corrections for a
  * sketch whose every register, and therefore every estimate, can be
  * recomputed bit-identically in plain SQL. That makes it the rare
  * sketch with a hard correctness gate instead of an epsilon assertion.
  *
  * 100 TB posture: the whole pipeline is two map-side-combinable
  * aggregations — `(key, bucket) → max(rho)` collapses to at most
  * `m = 64` fixed-size register rows per key per partition BEFORE the
  * exchange, and the per-key fold sums 64 exact integers. Nothing about
  * the corpus size reaches the shuffle: wire traffic is
  * O(keys × 64) regardless of row count, the same contract as Spark's
  * built-in HLL. The estimate arithmetic is a single exact-integer
  * denominator (Σ 2^(55−M_j) ≤ 64·2^55 < 2^63, no float accumulation
  * order anywhere) followed by one fixed chain of IEEE-double ops.
  */
object Sketches {

  /** Number of HLL registers (2^6). */
  val M = 64

  /** Raw HyperLogLog distinct-count estimate of `element` per `key`.
    *
    * Register assignment from the 60-bit md5 base hash
    * ([[Dedup.md5Hash60]]): bucket = low 6 bits, the remaining 54 bits
    * are the rank field; rho = 1 + leading zeros of the 54-bit field
    * (computed exactly as `55 - length(bin(w))`, no floating log).
    * Estimate is Flajolet's raw estimator
    * `alpha_64 · m² / Σ 2^(−M_j)` with the denominator scaled by 2^55
    * into exact BIGINT arithmetic. No small/large-range correction —
    * documented choice, keeps the oracle one expression; the exact
    * distinct count ships alongside precisely so the estimator's error
    * is visible in the output rather than hidden.
    *
    * Output: `(key, n_exact, hll_estimate, rel_err)` — n_exact is the
    * true distinct count (the expensive baseline, kept for the gate and
    * the error column), hll_estimate the sketch value, rel_err the
    * relative error, all deterministic.
    */
  def hllDistinct(elements: DataFrame, key: Column, element: Column): DataFrame = {
    val base = elements.select(key.as("key"), element.as("el"))
    val exact = base.groupBy(col("key")).agg(count_distinct(col("el")).as("n_exact"))
    exact.join(hllEstimate(hllRegisters(elements, key, element)), Seq("key"))
      .select(col("key"), col("n_exact"), col("hll_estimate"),
        (abs(col("hll_estimate") - col("n_exact").cast("double")) /
          col("n_exact").cast("double")).as("rel_err"))
  }

  /** The m=64 register table of `element` per `key`: `(key, bucket,
    * mj)`. `max(rho)` is monotone and map-side combinable — which also
    * makes this frame a VALID STRUCTURED-STREAMING aggregation (update /
    * complete mode): the sketch maintains itself incrementally with at
    * most 64 state rows per key, no reprocessing, and the streamed state
    * is bit-identical to the batch sketch over the union of batches
    * (pinned in StreamingSketchSpec). That is the 100 TB ingest shape:
    * registers fold at the edge, estimates read off the tiny state. */
  def hllRegisters(elements: DataFrame, key: Column, element: Column): DataFrame = {
    val base = elements.select(key.as("key"), element.as("el"))
    val h = Dedup.md5Hash60(col("el"))
    val fields = base.select(col("key"),
      h.bitwiseAND(lit(63L)).as("bucket"),
      shiftright(h, 6).as("w"))
    fields.select(col("key"), col("bucket"),
        when(col("w") === 0L, lit(55)).otherwise(lit(55) - length(bin(col("w")))).as("rho"))
      .groupBy(col("key"), col("bucket")).agg(max(col("rho")).as("mj"))
  }

  /** Raw estimate from a register table — batch-built, stream-collected,
    * or merged (elementwise max) across shards; `(key, hll_estimate)`. */
  def hllEstimate(regs: DataFrame): DataFrame = {
    val folded = regs.groupBy(col("key"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mj AS INT))")).as("present_sum"),
        count(lit(1)).as("n_present"))
    folded.select(col("key"),
        (col("present_sum") + (lit(64L) - col("n_present")) * lit(1L << 55)).as("denom"))
      .withColumn("hll_estimate",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0)) * lit(4096.0) *
          lit((1L << 55).toDouble) / col("denom").cast("double"))
      .select(col("key"), col("hll_estimate"))
  }

  /** The `d × w` count-min counter table of `element`: one row per
    * (seed row i, bucket) with the collision-inflated count. Fixed-size
    * (≤ d·w rows) and map-side combinable — at 100 TB the exchange
    * carries at most d·w partial counters per partition, never a row
    * per element. Buckets come from the same md5-base + 2-universal
    * seeded family as the MinHash pipeline ([[Dedup.hashCoeffs]]), so
    * the whole table is embeddable as literal VALUES in oracle SQL.
    * Counter tables are MERGEABLE by elementwise (i, bucket) sum —
    * pinned in the spec; that is the property that lets per-shard
    * sketches fold into a corpus sketch without re-reading data. */
  def cmsCounters(elements: DataFrame, element: Column,
      d: Int = 4, w: Int = 1024): DataFrame = {
    val spark = elements.sparkSession
    import spark.implicits._
    val seeds = Dedup.hashCoeffs(d).zipWithIndex
      .map { case ((a, b, c), i) => (i, a, b, c) }.toDF("i", "a", "b", "c")
    elements.select(Dedup.md5Hash60(element).as("h"))
      .crossJoin(broadcast(seeds))
      .select(col("i"), cmsBucket(w).as("bucket"))
      .groupBy(col("i"), col("bucket")).agg(count(lit(1)).as("c"))
  }

  /** Bucket of the pre-computed base hash `h` for seed row (a, b, c):
    * `((a·(h & 2^30−1) + b·(h >> 30) + c) mod P) mod w` — the exact
    * arithmetic x7's oracle already proves stays in signed-64 range. */
  private def cmsBucket(w: Int): Column =
    ((col("a") * col("h").bitwiseAND(lit(1073741823L)) +
      col("b") * shiftright(col("h"), 30) + col("c")) % lit(Dedup.HashP)) % lit(w.toLong)

  /** Count-min heavy hitters: top-`k` elements by sketch-estimated
    * count (`min` over the d counter rows — never an undercount,
    * overcount bounded by collisions), with the exact count alongside
    * as the visible error baseline, same contract as [[hllDistinct]].
    * Integer-only arithmetic end to end → hash-exact on any engine.
    *
    * The candidate set here is the distinct elements themselves (the
    * exact baseline computes them anyway); a pure-sketch deployment
    * would keep a bounded candidate heap instead and skip the exact
    * branch entirely — the counter table is the scale-invariant part.
    *
    * Output: `(term, n_exact, cms_estimate, overcount)`. */
  def cmsTopK(elements: DataFrame, element: Column, k: Int,
      d: Int = 4, w: Int = 1024): DataFrame = {
    val spark = elements.sparkSession
    import spark.implicits._
    val seeds = Dedup.hashCoeffs(d).zipWithIndex
      .map { case ((a, b, c), i) => (i, a, b, c) }.toDF("i", "a", "b", "c")
    val counters = cmsCounters(elements, element, d, w)
    val exact = elements.select(element.as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
    exact.select(col("term"), col("n_exact"), Dedup.md5Hash60(col("term")).as("h"))
      .crossJoin(broadcast(seeds))
      .select(col("term"), col("n_exact"), col("i"), cmsBucket(w).as("bucket"))
      .join(counters, Seq("i", "bucket"))
      .groupBy(col("term"), col("n_exact"))
      .agg(min(col("c")).as("cms_estimate"))
      .orderBy(col("cms_estimate").desc, col("term"))
      .limit(k)
      .select(col("term"), col("n_exact"), col("cms_estimate"),
        (col("cms_estimate") - col("n_exact")).as("overcount"))
  }

  /** Fixed-grid histogram quantile sketch: per-`key` quantile estimates
    * of `value` from equi-width bucket counts. The estimate for
    * quantile num/den is the lower edge of the first bucket where
    * `den·cum ≥ num·n` — integer arithmetic end to end, so unlike
    * t-digest/KLL the sketch is deterministic, mergeable (bucket counts
    * just add), and hash-exact on any engine; error is bounded by
    * `width`, chosen by the caller. Same family contract as
    * [[hllDistinct]]/[[cmsTopK]]: `approx_percentile` stays the opaque
    * production default, this is the variant an oracle can replay.
    *
    * 100 TB posture: one map-side-combinable `(key, bucket) → count`
    * aggregation — wire traffic O(keys × buckets) regardless of row
    * count — then a window + fold over the tiny histogram itself.
    *
    * Output: `(key, n_rows, <one BIGINT lower-edge column per
    * quantile>)`. */
  def histogramQuantiles(rows: DataFrame, key: Column, value: Column,
      width: Long,
      quantiles: Seq[(String, Int, Int)] =
        Seq(("p50_est", 1, 2), ("p90_est", 9, 10), ("p99_est", 99, 100)))
      : DataFrame =
    histogramQuantilesFromBuckets(
      histogramBuckets(rows, key, value, width), width, quantiles)

  /** The sketch STATE of [[histogramQuantiles]]: per-(key, bucket) row
    * counts. A pure sum-aggregate, so — by the same argument that makes
    * [[hllRegisters]] (max) and [[cmsCounters]] (sum) streamable — it
    * runs unchanged as a structured-streaming aggregation: arriving
    * batches fold in, union-equals-batch (StreamingSketchSpec), and
    * the finisher below replays quantiles off the materialized state. */
  def histogramBuckets(rows: DataFrame, key: Column, value: Column,
      width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    rows.select(key.as("key"),
        floor(value.cast("double") / width).cast("long").as("bucket"))
      .groupBy(col("key"), col("bucket")).agg(count(lit(1)).as("c"))
  }

  /** Finisher: quantile lower edges from a `(key, bucket, c)` histogram
    * (the window + fold run over the tiny sketch, never the corpus). */
  def histogramQuantilesFromBuckets(hist: DataFrame, width: Long,
      quantiles: Seq[(String, Int, Int)] =
        Seq(("p50_est", 1, 2), ("p90_est", 9, 10), ("p99_est", 99, 100)))
      : DataFrame = {
    require(width > 0, "bucket width must be positive")
    quantiles.foreach { case (_, num, den) =>
      require(num > 0 && num <= den, s"quantile $num/$den out of (0,1]") }
    val byKey = org.apache.spark.sql.expressions.Window.partitionBy("key")
    val cum = hist
      .withColumn("cum", sum(col("c")).over(byKey.orderBy("bucket")))
      .withColumn("n", sum(col("c")).over(byKey))
    // last bucket always has cum = n ≥ num/den·n, so no quantile column
    // can come out NULL
    val qCols = quantiles.map { case (name, num, den) =>
      min(when(col("cum") * den >= col("n") * num, col("bucket") * width))
        .as(name)
    }
    cum.groupBy(col("key")).agg(max(col("n")).as("n_rows"), qCols: _*)
  }

  /** Pairwise vocabulary-overlap estimate between keys from MERGED HLL
    * registers: for every key pair (a < b), the two single-key
    * estimates, the UNION estimate read off the elementwise-max
    * register table (the sketch-merge law — no data re-read), the
    * inclusion-exclusion overlap `est_a + est_b − est_union`, and the
    * exact overlap baseline so the estimator's error is visible.
    *
    * This is why mergeable sketches exist at 100 TB: per-key register
    * tables are built ONCE (64 rows per key), and any of the k·(k−1)/2
    * pair unions folds those fixed-size states — the exact path pays a
    * vocabulary-cardinality self-join per pair.
    * Output: (ka, kb, est_a, est_b, est_union, overlap_est, n_overlap_exact). */
  def hllOverlap(elements: DataFrame, key: Column, element: Column): DataFrame = {
    val base = elements.select(key.as("key"), element.as("el"))
    val regs = hllRegisters(base, col("key"), col("el")).localCheckpoint(false)
    val singles = hllEstimate(regs)
    val keys = regs.select(col("key")).distinct()
    val pairs = keys.as("x").join(keys.as("y"),
        col("x.key") < col("y.key"))
      .select(col("x.key").as("ka"), col("y.key").as("kb"))
    val merged = broadcast(pairs).join(regs,
        col("key") === col("ka") || col("key") === col("kb"))
      .groupBy(col("ka"), col("kb"), col("bucket"))
      .agg(max(col("mj")).as("mj"))
      .select(struct(col("ka"), col("kb")).as("key"),
        col("bucket"), col("mj"))
    val uest = hllEstimate(merged)
      .select(col("key.ka").as("ka"), col("key.kb").as("kb"),
        col("hll_estimate").as("est_union"))
    val dd = base.distinct().localCheckpoint(false)
    val exact = dd.as("u").join(dd.as("v"),
        col("u.el") === col("v.el") && col("u.key") < col("v.key"))
      .groupBy(col("u.key").as("ka"), col("v.key").as("kb"))
      .agg(count(lit(1)).as("n_overlap_exact"))
    uest
      .join(singles.select(col("key").as("ka"), col("hll_estimate").as("est_a")), Seq("ka"))
      .join(singles.select(col("key").as("kb"), col("hll_estimate").as("est_b")), Seq("kb"))
      .join(exact, Seq("ka", "kb"), "left")
      .na.fill(0L, Seq("n_overlap_exact"))
      .select(col("ka"), col("kb"), col("est_a"), col("est_b"),
        col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("overlap_est"),
        col("n_overlap_exact"))
  }

  /** Exportable deterministic Bloom filter: `words`·64 bits over the
    * element stream, `d` seeded hashes per element (same 2-universal
    * family as the CMS), materialized as one BIGINT bitmask row per
    * word — the artifact you hand to ANOTHER system (a scan prefilter,
    * a router, next week's decontamination run) rather than an opaque
    * in-plan `bloom_filter_agg`. Duplicates are absorbed by OR, so the
    * input needs no pre-distinct.
    *
    * `bit_or` is a monotone combinable aggregate → the table is
    * map-side combined to ≤ `words` rows per partition before the
    * exchange, per-shard filters merge by elementwise OR, and the SAME
    * frame runs as a structured-streaming aggregation (pinned in
    * StreamingSketchSpec). Every word emits a row (zeros included) —
    * an exported filter's width is part of its contract.
    *
    * Layout: 62 bits per word, not 64 — the top two bit positions are
    * never used, so every mask (and every OR of masks) stays a
    * POSITIVE int64. That keeps the artifact readable in any engine
    * without two's-complement gymnastics (ANSI engines overflow-check
    * `1 << 63`; DuckDB refuses it outright).
    * Output: (word_idx, bits, n_set). */
  def bloomBits(elements: DataFrame, element: Column,
      words: Int = 16, d: Int = 3): DataFrame = {
    val spark = elements.sparkSession
    import spark.implicits._
    val allWords = (0L until words.toLong).toDF("word_idx")
    bloomWords(elements, element, words, d)
      .join(broadcast(allWords), Seq("word_idx"), "right")
      .na.fill(0L, Seq("bits"))
      .select(col("word_idx"), col("bits"),
        bit_count(col("bits")).as("n_set"))
  }

  /** The occupied-word aggregate alone — the STREAMING-safe core (the
    * width-completing outer join above is a batch finisher; streams
    * read their zero words off the absent state rows). One combinable
    * bit_or groupBy; ≤ `words` state rows total. */
  def bloomWords(elements: DataFrame, element: Column,
      words: Int, d: Int): DataFrame = {
    require(words >= 1 && words <= 1024, s"words=$words out of range")
    require(d >= 1 && d <= 8, s"d=$d out of range")
    val spark = elements.sparkSession
    import spark.implicits._
    val nbits = words * 62L
    val seeds = Dedup.hashCoeffs(d).zipWithIndex
      .map { case ((a, b, c), i) => (i, a, b, c) }.toDF("i", "a", "b", "c")
    elements.select(Dedup.md5Hash60(element).as("h"))
      .crossJoin(broadcast(seeds))
      .select((((col("a") * col("h").bitwiseAND(lit(1073741823L)) +
        col("b") * shiftright(col("h"), 30) + col("c")) % lit(Dedup.HashP))
        % lit(nbits)).as("bit"))
      .select(expr("bit DIV 62").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 62 AS INT))").as("mask"))
      .groupBy("word_idx").agg(expr("bit_or(mask)").as("bits"))
  }

  /** KMV (k-minimum-values) distinct sketch per key, audited against
    * the exact distinct count. The sketch is the k smallest DISTINCT
    * 60-bit hashes of `element` ([[graft.functions.KMinValuesAgg]]);
    * with hashes uniform on [0, 2^60) the estimator is
    * `est = (k-1) · 2^60 / h_(k)` when the buffer filled, else the
    * buffer size IS the exact count. All arithmetic DECIMAL(38) →
    * BIGINT, so the estimate — not just the sketch — is bit-identical
    * to the oracle's order-statistics SQL.
    *
    * Why KMV next to [[hllDistinct]]: same O(1)-per-key wire, but the
    * sketch VALUES compose — the k smallest of a union are the merge
    * of the operands' buffers (the Aggregator's merge law, pinned in
    * StreamingSketchSpec), so per-shard sketches roll up losslessly,
    * and the kth order statistic doubles as a uniform sample of the
    * key's distinct elements.
    *
    * 100 TB posture: ONE exchange; the aggregator dedups inside its
    * O(k) buffer, so there is no pre-distinct pass and each partition
    * ships ≤ k longs per key. The exact leg (distinct + count) exists
    * for the AUDIT only — a production rollup drops it. Output:
    * (key, n_exact, n_sketch, kth_min, est_distinct, err_ppm). */
  def kmvDistinct(elements: DataFrame, key: Column, element: Column,
      k: Int = 64): DataFrame = {
    val base = elements.select(key.as("key"),
      Dedup.md5Hash60(element.cast("string")).as("h"))
    val sk = kmvMins(base, col("key"), col("h"), k, prehashed = true)
      .select(col("key"), size(col("mins")).cast("long").as("n_sketch"),
        element_at(col("mins"), -1).as("kth_min"))
    val exact = base.distinct().groupBy("key").agg(count(lit(1)).as("n_exact"))
    sk.join(exact, Seq("key"))
      .withColumn("est_distinct",
        when(col("n_sketch") < k, col("n_sketch"))
          .otherwise(expr(s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) " +
            "* 1152921504606846976 DIV kth_min AS BIGINT)")))
      .select(col("key"), col("n_exact"), col("n_sketch"), col("kth_min"),
        col("est_distinct"),
        expr("CAST(CAST(abs(est_distinct - n_exact) AS DECIMAL(38,0)) " +
          "* 1000000 DIV n_exact AS BIGINT)").as("err_ppm"))
  }

  /** KMV sketch ALGEBRA: estimate two key sets' distinct sizes, their
    * union, and their overlap — the join-cardinality question ("how
    * many customer keys will this orders scan actually hit?") answered
    * from two O(k) sketches instead of a key-scale join. The union
    * sketch is the k smallest of the two operands' buffers — valid
    * because any of the union's k smallest hashes must sit in one
    * side's bottom-k (the KMV merge law); overlap follows by
    * inclusion–exclusion, clamped at 0. The exact legs (distinct
    * counts + the hash-equality overlap) ship alongside for the audit,
    * as everywhere in this module.
    *
    * 100 TB posture: both sides fold to ≤ k longs via one combinable
    * aggregation (side tag = the grouping key, partial agg collapses
    * each partition before the exchange); the union re-sketch runs on
    * 2k rows. The exact-overlap audit leg is the only key-cardinality
    * exchange — a production estimate drops it. Output, ONE row:
    * (n_a_exact, n_b_exact, n_overlap_exact, est_a, est_b, est_union,
    * overlap_est, err_ppm). */
  def kmvOverlap(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
      k: Int = 256): DataFrame = {
    require(k >= 2 && k <= 4096, s"k=$k out of range [2, 4096]")
    val ha = a.select(Dedup.md5Hash60(aKey.cast("string")).as("h"),
      lit("a").as("side"))
    val hb = b.select(Dedup.md5Hash60(bKey.cast("string")).as("h"),
      lit("b").as("side"))
    val sk = kmvMins(ha.unionAll(hb), col("side"), col("h"), k,
      prehashed = true).localCheckpoint(false)
    val merged = kmvMins(
      sk.select(explode(col("mins")).as("h"), lit("u").as("side")),
      col("side"), col("h"), k, prehashed = true)
    val ests = sk.unionByName(merged)
      .select(col("key"), size(col("mins")).cast("long").as("n_sk"),
        element_at(col("mins"), -1).as("kth"))
      .select(col("key"),
        when(col("n_sk") < k, col("n_sk"))
          .otherwise(expr(s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) " +
            "* 1152921504606846976 DIV kth AS BIGINT)")).as("est"))
      .groupBy()
      .agg(max(when(col("key") === "a", col("est"))).as("est_a"),
        max(when(col("key") === "b", col("est"))).as("est_b"),
        max(when(col("key") === "u", col("est"))).as("est_union"))
    val da = ha.select("h").distinct().localCheckpoint(false)
    val db = hb.select("h").distinct().localCheckpoint(false)
    val exact = da.agg(count(lit(1)).as("n_a_exact"))
      .crossJoin(db.agg(count(lit(1)).as("n_b_exact")))
      .crossJoin(da.join(db, Seq("h")).agg(count(lit(1)).as("n_overlap_exact")))
    broadcast(exact).crossJoin(broadcast(ests))
      .withColumn("overlap_est",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
      .select(col("n_a_exact"), col("n_b_exact"), col("n_overlap_exact"),
        col("est_a"), col("est_b"), col("est_union"), col("overlap_est"),
        expr("CAST(CAST(abs(overlap_est - n_overlap_exact) AS DECIMAL(38,0)) " +
          "* 1000000 DIV greatest(1L, n_overlap_exact) AS BIGINT)")
          .as("err_ppm"))
  }

  /** The streaming-safe KMV core alone: `(key, mins)` with `mins` the
    * sorted ≤ k smallest distinct 60-bit hashes. ONE combinable
    * aggregation with O(k) state — runs unchanged as a
    * structured-streaming complete-mode aggregation (merge law pinned
    * in StreamingSketchSpec); [[kmvDistinct]]'s exact-audit leg is a
    * batch finisher. `prehashed = true` means `element` already IS the
    * 60-bit hash column. */
  def kmvMins(elements: DataFrame, key: Column, element: Column, k: Int,
      prehashed: Boolean = false): DataFrame = {
    require(k >= 2 && k <= 4096, s"k=$k out of range [2, 4096]")
    val agg = udaf(new graft.functions.KMinValuesAgg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val h = if (prehashed) element else Dedup.md5Hash60(element.cast("string"))
    elements.select(key.as("key"), h.as("h"))
      .groupBy("key").agg(agg(col("h")).as("mins"))
  }

  /** Bloom-pruned semi-join audit — the classic distributed semi-join
    * reduction, with its error EXACTLY accounted: build the 62-bit-word
    * filter over the DIM keys ([[bloomWords]] layout), probe every FACT
    * key, and report what a bloom-pruned scan would keep vs the true
    * semi-join. Output, ONE row: (n_fact, n_pass, n_match, n_false_pos,
    * fp_ppm) with `n_pass = n_match + n_false_pos` (no false negatives,
    * ever — the property the audit makes visible).
    *
    * 100 TB posture: the filter is ≤ 8 KiB, collected at PLAN BUILD and
    * embedded in a codegen'd [[graft.functions.BloomContains]] probe —
    * the fact side pays d multiply-mod-tests per row scan-side, no join
    * and no shuffle for the pruning decision itself; the exact-truth
    * leg (needed only by the AUDIT, not by a production prune) is one
    * broadcast left-semi against the distinct dim keys. This is the
    * operator you run once to size `words`/`d` before wiring the same
    * expression in front of a 100 TB shuffle. */
  def bloomPruneAudit(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, words: Int, d: Int): DataFrame = {
    val dimKeys = dim.select(dimKey.cast("string").as("k")).distinct()
      .localCheckpoint(false)
    val wordRows = bloomWords(dimKeys, col("k"), words, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val wordArr = (0 until words).map(i => wordRows.getOrElse(i.toLong, 0L))
    val seeds = Dedup.hashCoeffs(d)
    val probe = fact.select(factKey.cast("string").as("k"))
      .select(col("k"),
        graft.functions.BloomContains.bloom_contains(
          Dedup.md5Hash60(col("k")), wordArr, seeds).as("pass"))
    probe
      .join(broadcast(dimKeys.select(col("k"), lit(1L).as("m"))), Seq("k"), "left")
      .agg(count(lit(1)).as("n_fact"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("m").isNotNull, 1L).otherwise(0L)).as("n_match"),
        sum(when(col("pass") && col("m").isNull, 1L).otherwise(0L))
          .as("n_false_pos"))
      .select(col("n_fact"), col("n_pass"), col("n_match"), col("n_false_pos"),
        expr("CASE WHEN n_fact - n_match = 0 THEN 0L " +
          "ELSE n_false_pos * 1000000L DIV (n_fact - n_match) END").as("fp_ppm"))
  }
}
