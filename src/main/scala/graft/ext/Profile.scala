package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling: per-column summary statistics in ONE table pass.
  *
  * The reference engine has no profiling surface (its 29-column CSV
  * report is a fixed query, `StreamTest.cpp` has no schema
  * introspection); any engine curating 100 TB needs one — you profile
  * BEFORE you write the dedup/filter config, not after.
  *
  * 100 TB posture: a single scan producing one wide row of aggregates
  * (the multi-distinct plans as one Expand pass — k× row inflation
  * map-side, never a per-column rescan), then a driver-free `stack`
  * unpivot of that single row into the k-row result. No joins, one
  * aggregation exchange, output size O(columns).
  */
object Profile {

  /** Profile `cols` of `df`: row count, null count, exact distinct
    * count, and min/max (rendered as strings so heterogeneous column
    * types share one schema). Restrict to exact-render types (integers,
    * strings) when cross-engine string parity matters — float and
    * timestamp formatting is engine-specific.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // the unpivot below interpolates names into a SQL string: a name
    // containing a quote/space/dot would break parsing — or inject an
    // arbitrary expression into the plan — unless every identifier is
    // backtick-quoted and every label literal is escaped. A backtick
    // inside a name cannot itself be backtick-quoted portably; reject.
    cols.foreach(c => require(!c.contains("`"),
      s"profile: column name ${c} contains a backtick and cannot be " +
        "safely quoted in the unpivot expression — rename it upstream"))
    // plan-side lookups go through col("`name`") / backticked aliases,
    // so dots in source names never parse as struct-field access
    def q(name: String): String = s"`$name`"
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(q(c)).isNull.cast("long")).as(s"__null_$c"),
        countDistinct(col(q(c))).as(s"__nd_$c"),
        min(col(q(c))).cast("string").as(s"__min_$c"),
        max(col(q(c))).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // one literal label per column; stack unpivots the single wide row.
    // Labels are backslash-escaped string literals, aggregate
    // references backtick-quoted identifiers.
    val stackArgs = cols.map { c =>
      val label = c.replace("\\", "\\\\").replace("'", "\\'")
      s"'$label', ${q(s"__null_$c")}, ${q(s"__nd_$c")}, " +
        s"${q(s"__min_$c")}, ${q(s"__max_$c")}"
    }.mkString(", ")
    wide.select(col("__n"), expr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_val, max_val)"))
      .select(col("col_name"), col("__n").as("n_rows"), col("n_null"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  /** Log2-binned histogram of a positive integer measure: one row per
    * occupied bucket `[2^b, 2^(b+1))` with the entity count and the
    * measure total inside the bucket. The standard way to LOOK at a
    * heavy-tailed distribution (duplicate-cluster sizes, degree
    * distributions, doc lengths) without 10^6 distinct-value rows.
    *
    * Bucketing is EXACT integer arithmetic: values join a broadcast
    * 63-row power-of-two table on a range predicate — no
    * floor(log2(x)) float, whose rounding at exact powers of two
    * differs across engines. One combinable groupBy after a broadcast
    * range join; nothing scales with distinct values. */
  def log2Hist(df: DataFrame, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val buckets = (0 until 63).map(b => (1L << b,
      if (b == 62) Long.MaxValue else (1L << (b + 1)) - 1)).toDF("lo", "hi")
    df.select(value.cast("long").as("v"))
      .join(broadcast(buckets), col("v") >= col("lo") && col("v") <= col("hi"))
      .groupBy(col("lo").as("bucket_lo"))
      .agg(count(lit(1)).as("n_entities"), sum(col("v")).as("total"))
      .select(col("bucket_lo"), col("n_entities"), col("total"))
  }

  /** Exact per-stratum order-statistic quantiles of an integer
    * measure: for each percentile p in `pcts`, the value at sorted
    * position `ceil(p·n/100)` (= `(p·n + 99) div 100`, 1-based) — the
    * classic discrete quantile, engine-reproducible because it is a
    * POSITION in the sorted multiset, not an interpolation (the value
    * at a position is deterministic even under ties). The data-card
    * numbers a corpus README quotes.
    *
    * Plan (round 18): ONE combinable groupBy compresses the corpus to
    * a (stratum, value, count) HISTOGRAM — the only pass that touches
    * row cardinality — then a running-count cumsum over the histogram
    * locates each position pick. Cumsum strategy by stratum
    * cardinality (round 14's contract): `lowCardStrata = true` routes
    * through [[StratumRank.cumsum]]'s two-phase decomposition
    * (REQUIRED when strata are source/day/type-shaped — a bare-stratum
    * window caps parallelism at the stratum cardinality); `false`
    * keeps the plain hash window, the RIGHT plan when strata are
    * user/entity-keyed (cardinality ≫ partitions; two-phase's
    * (partitions × strata) driver offset table would refuse). The
    * stratum count rides the cumsum (no separate count pass), then one
    * conditional-aggregate groupBy — no global window, no approximate
    * sketch, columns `p<pct>` in `pcts` order. Value-identical to a
    * full row rank: tied rows share the value, so the histogram row
    * whose running count first covers the position carries exactly the
    * picked value. */
  def groupQuantiles(df: DataFrame, stratum: Column, value: Column,
      pcts: Seq[Int], lowCardStrata: Boolean = false): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts=$pcts must be percentiles in [1, 100]")
    // HISTOGRAM pre-aggregation (round 18): a position pick only needs
    // the sorted MULTISET, and the multiset compresses to one
    // (stratum, v, count) row per distinct value under a combinable
    // groupBy — so the corpus is touched exactly once by a map-side-
    // combining aggregate, and every downstream rank/cumsum runs on
    // distinct-value cardinality instead of row cardinality (measured
    // sf1: x161 6M rows → 24k histogram rows, x156 1M → ~1k). The
    // value at position k is the histogram row whose running count
    // first reaches k — identical to the row-rank pick under ties by
    // construction (tied rows share the value). `cs` (stratum row
    // count) rides the cumsum for free: the two-phase path exports its
    // driver-known totals, the hash-window path reads a total-weight
    // window over the row_number's own partitioning.
    val d = df.select(stratum.as("stratum"), value.cast("long").as("v"))
    val hist = d.groupBy("stratum", "v").agg(count(lit(1)).as("cnt"))
    val cum =
      if (lowCardStrata)
        StratumRank.cumsum(hist, col("stratum"), Seq(col("v")), col("cnt"),
            withTotal = true)
          .withColumnRenamed("__cum", "cum").withColumnRenamed("__cs", "cs")
          .drop("__s")
      else {
        val byS = org.apache.spark.sql.expressions.Window
          .partitionBy(col("stratum"))
        // NULLS LAST explicitly: StratumRank pins it (ANSI default),
        // so both strategies really do return identical rows under
        // NULL values — Spark's bare ASC would put nulls first
        hist.withColumn("cum", sum(col("cnt")).over(
            byS.orderBy(col("v").asc_nulls_last)
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .withColumn("cs", sum(col("cnt")).over(byS))
      }
    val aggs = pcts.map { p =>
      val pos = s"(($p * cs + 99) DIV 100)"
      max(expr(s"CASE WHEN cum - cnt < $pos AND $pos <= cum THEN v END"))
        .as(s"p$p")
    }
    cum.groupBy("stratum")
      .agg(sum(col("cnt")).as("n"), aggs: _*)
  }

  /** Join-key skew profile: the top-`k` heaviest key values plus, on
    * every row, the table-wide skew factor
    * `skew_e6 = max_cnt · n_keys · 1e6 div n_rows` (= hottest key's
    * count over the MEAN key count, per-million — 1e6 means perfectly
    * uniform). This is the measurement you take BEFORE choosing a
    * salting factor (x23) or trusting AQE's skew split: a key with
    * skew_e6 ≫ 1e6 is the partition that will straggle.
    *
    * Plan: one combinable count groupBy; the top-k cut is
    * TakeOrderedAndProject (per-partition heaps, no global sort); the
    * three scalars ride a broadcast 1-row crossJoin. Exact integers
    * (DECIMAL product, envelope `max·keys·1e6 < 10^38`). */
  def keySkew(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val cnt = df.select(key.cast("string").as("key_val"))
      .groupBy("key_val").agg(count(lit(1)).as("cnt"))
    val totals = cnt.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    cnt.orderBy(col("cnt").desc, col("key_val")).limit(k)
      .crossJoin(broadcast(totals))
      .select(col("key_val"), col("cnt"), col("n_keys"), col("n_rows"),
        expr("CAST(CAST(max_cnt AS DECIMAL(38,0)) * n_keys * 1000000 DIV n_rows AS BIGINT)")
          .as("skew_e6"))
  }

  /** Robust per-stratum outlier profile on a DOUBLE measure: the exact
    * lower median, the median absolute deviation around it, and the
    * count of rows deviating more than `nMads`·MAD — the
    * contamination-resistant outlier rule (a mean/stddev z-score moves
    * with the outliers it is hunting; the median/MAD pair does not).
    *
    * Every statistic is an ORDER STATISTIC or a comparison on raw
    * doubles — position `(n+1) div 2` in the sorted multiset, an
    * `abs(v - med)` difference, one `> nMads·mad` predicate. No double
    * is ever SUMMED, so the result is bit-stable under any partitioning
    * and reproducible in any ANSI engine.
    *
    * Plan (round 18): one combinable groupBy compresses the corpus to
    * a (stratum, v, count) histogram — the only row-cardinality pass —
    * then two cumsum position picks (values, then |v−med| deviations)
    * over the tiny histograms + broadcast median joins. No global
    * window, no sketch. Cumsum strategy by stratum cardinality (round
    * 14, same contract as [[groupQuantiles]]): `lowCardStrata = true`
    * → two-phase [[StratumRank.cumsum]] (brand/source-shaped strata);
    * `false` → plain hash window (user/entity-keyed strata, the right
    * plan there). Median picks are value-stable under tie permutation
    * — both strategies return identical rows.
    * Output: (stratum, n, med, mad, n_out). */
  def medianMadOutliers(df: DataFrame, stratum: Column, value: Column,
      nMads: Int = 4, lowCardStrata: Boolean = false): DataFrame = {
    require(nMads >= 1, s"nMads=$nMads must be >= 1")
    // HISTOGRAM form (round 18, same argument as [[groupQuantiles]]):
    // the corpus is touched exactly ONCE — a combinable groupBy down
    // to (stratum, v, count) — and every later stage (median cumsum,
    // deviation build, MAD cumsum, outlier count) runs on
    // distinct-value cardinality (measured sf1: x128's 6M joined rows
    // → 600k histogram rows). The deviation histogram derives from the
    // VALUE histogram: |v − med| with weight cnt, re-grouped because
    // med±x collide. Both medians are position picks on running
    // weights — value-identical to the r17 row-rank form (tied rows
    // share the value).
    def cumsumBy(h: DataFrame, o: String): DataFrame =
      if (lowCardStrata)
        StratumRank.cumsum(h, col("stratum"), Seq(col(o)), col("cnt"),
            withTotal = true)
          .withColumnRenamed("__cum", "cum").withColumnRenamed("__cs", "cs")
          .drop("__s")
      else {
        val byS = org.apache.spark.sql.expressions.Window
          .partitionBy(col("stratum"))
        h.withColumn("cum", sum(col("cnt")).over(
            byS.orderBy(col(o).asc_nulls_last)
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .withColumn("cs", sum(col("cnt")).over(byS))
      }
    // lower median = value at position (n+1) div 2: the histogram row
    // whose running count first covers the position
    def pickAt(cumd: DataFrame, o: String, out: String): DataFrame = {
      val pos = expr("(cs + 1) DIV 2")
      cumd.where(col("cum") - col("cnt") < pos && pos <= col("cum"))
        .select(col("stratum"), col(o).as(out))
    }
    val d = df.select(stratum.as("stratum"), value.cast("double").as("v"))
    val hist0 = d.groupBy("stratum", "v").agg(count(lit(1)).as("cnt"))
    if (lowCardStrata) {
      // CACHE REUSE (round 18, StageProbe-measured): the two-phase
      // cumsum already checkpoints its sorted frame, and that cache
      // CONTAINS the histogram columns — so the deviation histogram
      // derives from cum1's output (a cache read + broadcast rejoin)
      // and the final aggregate reads cum2's output the same way.
      // The separate hist/adevHist localCheckpoints this used to pin
      // were a THIRD and FOURTH copy of the same rows in the block
      // manager (x128: 2×60 MB written and re-read per execution for
      // data sorted1/sorted2 already hold).
      val cum1 = cumsumBy(hist0, "v")
      val med = pickAt(cum1, "v", "med")
      val adevHist = cum1.select(col("stratum"), col("v"), col("cnt"))
        .join(broadcast(med), Seq("stratum"))
        .groupBy(col("stratum"), abs(col("v") - col("med")).as("adev"))
        .agg(sum(col("cnt")).as("cnt"), max(col("med")).as("med"))
      val cum2 = cumsumBy(adevHist, "adev")
      val mad = pickAt(cum2, "adev", "mad")
      cum2.join(broadcast(mad), Seq("stratum"))
        .groupBy("stratum")
        .agg(sum(col("cnt")).as("n"),
          max(col("med")).as("med"), max(col("mad")).as("mad"),
          sum(when(col("adev") > col("mad") * nMads, col("cnt")).otherwise(0L))
            .as("n_out"))
    } else {
      // hash-window path: everything is ONE lazy plan (no collect
      // boundary), so without the checkpoints the corpus-wide groupBy
      // subtree would be DUPLICATED under every consumer — keep them.
      val hist = hist0.localCheckpoint(false)
      val med = pickAt(cumsumBy(hist, "v"), "v", "med")
      val adevHist = hist.join(broadcast(med), Seq("stratum"))
        .groupBy(col("stratum"), abs(col("v") - col("med")).as("adev"))
        .agg(sum(col("cnt")).as("cnt"), max(col("med")).as("med"))
        .localCheckpoint(false)
      val mad = pickAt(
        cumsumBy(adevHist.select(col("stratum"), col("adev"), col("cnt")), "adev"),
        "adev", "mad")
      adevHist.join(broadcast(mad), Seq("stratum"))
        .groupBy("stratum")
        .agg(sum(col("cnt")).as("n"),
          max(col("med")).as("med"), max(col("mad")).as("mad"),
          sum(when(col("adev") > col("mad") * nMads, col("cnt")).otherwise(0L))
            .as("n_out"))
    }
  }

  /** k-anonymity audit over a quasi-identifier tuple: every equivalence
    * class (distinct combination of the `qids` columns) with its size
    * and an `at_risk` flag for classes smaller than `k` — the release
    * gate a governance review runs before a corpus with demographic-ish
    * columns ships. ONE combinable groupBy; the class-count key space
    * is the product of qid cardinalities, not the corpus.
    * Output: (qids..., n, at_risk int). */
  def kAnonymity(df: DataFrame, qids: Seq[Column], k: Int): DataFrame = {
    require(qids.nonEmpty && k >= 2, s"kAnonymity(qids=${qids.size}, k=$k)")
    df.groupBy(qids: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", when(col("n") < k, 1).otherwise(0).cast("int"))
  }

  /** l-diversity audit — [[kAnonymity]]'s sibling gate: a class can be
    * large (k-anonymous) yet still leak if everyone in it shares the
    * SAME sensitive value, so each quasi-identifier equivalence class is
    * scored by how many DISTINCT sensitive values it contains
    * (`l_distinct`), how concentrated the modal value is
    * (`max_share_ppm` — the recursive-(c,l) signal), and an `at_risk`
    * flag for classes under `l` (Machanavajjhala et al. 2007). Exact
    * integers end to end.
    *
    * 100 TB posture: two stacked combinable groupBys — corpus →
    * (qids, sensitive) cells → qid classes — so the only data-scale
    * exchange carries one row per OCCUPIED cell (bounded by the qid ×
    * sensitive key-space product, not the corpus), and the second
    * rollup is |cells| → |classes|. No join anywhere; a hot class is a
    * map-side partial like any other.
    * Output: (qids..., n, l_distinct, max_share_ppm, at_risk). */
  def lDiversity(df: DataFrame, qids: Seq[(String, Column)],
      sensitive: Column, l: Int): DataFrame = {
    require(qids.nonEmpty && l >= 2 && l <= 1000000,
      s"lDiversity(qids=${qids.size}, l=$l)")
    val named = qids.map { case (nm, c) => c.as(nm) }
    val qidCols = qids.map { case (nm, _) => col(nm) }
    val cells = df
      .select((named :+ sensitive.cast("string").as("__s")): _*)
      .groupBy((qidCols :+ col("__s")): _*)
      .agg(count(lit(1)).as("__cnt"))
    cells.groupBy(qidCols: _*)
      .agg(sum(col("__cnt")).as("n"),
        count(lit(1)).as("l_distinct"),
        max(col("__cnt")).as("__maxc"))
      .withColumn("max_share_ppm", expr("__maxc * 1000000 DIV n"))
      .withColumn("at_risk",
        when(col("l_distinct") < l, 1).otherwise(0).cast("int"))
      .drop("__maxc")
  }

  /** Gini concentration of an integer measure across strata (how
    * unevenly tokens spread over sources): the classic rank formula
    * `Σ(2·rank − n − 1)·x_(rank) · 1e6 div (n·Σx)` over the strata
    * sorted by (measure, stratum) — 0 = perfectly even, →1e6 = one
    * stratum owns everything. Exact integers end to end.
    *
    * The rank is computed by a self-join on the per-stratum AGGREGATE
    * (|strata| rows — broadcast, trivial), not a global window: the
    * corpus-sized input sees only one combinable groupBy.
    * Output: one row (n_strata, total, gini_e6). */
  def giniConcentration(df: DataFrame, stratum: Column, measure: Column)
      : DataFrame = {
    val per = df.select(stratum.as("s"), measure.cast("long").as("x"))
      .groupBy("s").agg(sum(col("x")).as("x"))
    val l = per.select(col("s"), col("x"))
    val r = per.select(col("s").as("s2"), col("x").as("x2"))
    val ranked = l.join(broadcast(r),
        col("x2") < col("x") || (col("x2") === col("x") && col("s2") <= col("s")))
      .groupBy("s", "x").agg(count(lit(1)).as("rank"))
    ranked.agg(count(lit(1)).as("n_strata"), sum(col("x")).as("total"),
        sum((col("rank") * 2 - lit(1)) * col("x")).as("wsum"))
      .select(col("n_strata"), col("total"),
        expr("(wsum - n_strata * total) * 1000000L DIV (n_strata * total)")
          .as("gini_e6"))
  }

  /** Decile lift table over an integer measure: entities ranked by
    * (measure DESC, id ASC), split into `buckets` equal-population
    * slices, each with its entity count, measure total, share, and
    * cumulative share — "the top 10% of customers carry X% of revenue".
    *
    * The global rank is the TWO-PHASE kind ([[graft.ops.Batching]]'s
    * contract): a range sort stamps partition ids, per-partition ranks
    * run in parallel, and broadcast prefix offsets make them global —
    * no single task ever holds the whole ranking (the `ntile()` window
    * the oracle runs would). The driver sees only one count row per
    * partition at plan build. Cumulative rides a `buckets`-row
    * broadcast self-join. Output: (bucket, n_entities, total_m,
    * share_e6, cum_share_e6). */
  def decileLift(df: DataFrame, id: Column, measure: Column,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets must be >= 2")
    val perBucket = globalBuckets(df, id, measure, buckets)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_entities"), sum(col("m")).as("total_m"))
    val cum = perBucket.select(col("bucket").as("b2"), col("total_m").as("m2"))
    perBucket.join(broadcast(cum), col("b2") <= col("bucket"))
      .groupBy("bucket", "n_entities", "total_m")
      .agg(sum(col("m2")).as("cum_m"))
      .crossJoin(broadcast(perBucket.agg(sum(col("total_m")).as("grand"))))
      .select(col("bucket"), col("n_entities"), col("total_m"),
        // DECIMAL(38) product: total_m·1e6 overflows int64 once the
        // measure total passes ~9.2e12 (cents at sf1 — MEASURED by the
        // round-10 sf1 run, x127 ARITHMETIC_OVERFLOW)
        expr("CAST(CAST(total_m AS DECIMAL(38,0)) * 1000000 DIV grand AS BIGINT)")
          .as("share_e6"),
        expr("CAST(CAST(cum_m AS DECIMAL(38,0)) * 1000000 DIV grand AS BIGINT)")
          .as("cum_share_e6"))
  }

  /** Per-entity equal-population bucket by global rank (measure DESC,
    * id ASC — bucket 0 = the top slice): the TWO-PHASE global rank
    * shared by [[decileLift]] and RFM-style segmentations. A range sort
    * stamps partition ids, per-partition ranks run in parallel, and
    * broadcast prefix offsets make them global — no single task ever
    * holds the whole ranking (the `ntile()` window an oracle runs
    * would). Output: (id, m, bucket). */
  def globalBuckets(df: DataFrame, id: Column, measure: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(id.as("id"), measure.cast("long").as("m"))
    // CHECKPOINTED: the range sort's partition boundaries are sampled
    // per evaluation — without materializing here, the counts job below
    // and the rank job later can see DIFFERENT boundaries, giving two
    // partitions overlapping offsets and colliding global ranks
    // (measured at sf1: 992 non-empty buckets instead of 1000 before
    // this pin; sf0.1 and below happened to evaluate identically)
    val sorted = base.sort(col("m").desc, col("id"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val counts = sorted.groupBy("_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.iterator.map(_._2).sum
    require(total > 0, "globalBuckets: empty input")
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val off = acc; acc += c; (pid, off) }
    sorted
      .withColumn("_lrn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("_pid")).orderBy(col("m").desc, col("id"))).cast("long"))
      .join(broadcast(offsets.toSeq.toDF("_pid", "_off")), "_pid")
      .withColumn("bucket", // integer floor — `/` on Columns is FP division
        expr(s"least((_off + _lrn - 1) * $buckets DIV ${total}L, ${buckets - 1})"))
      .select(col("id"), col("m"), col("bucket"))
  }

  /** 0-based global POSITION by `id` ascending — the same two-phase
    * range-sort + broadcast-prefix-offset rank as [[globalBuckets]],
    * extracted for callers that need the position itself (x172's ring
    * negatives replaced an O(N²) broadcast self-join count with this).
    * No single task ever holds the whole ranking, and the sort is
    * localCheckpoint-pinned for the same sampled-boundary-determinism
    * reason as [[globalBuckets]]. Output: (id, p). */
  def globalRank(df: DataFrame, id: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df.select(id.as("id")).sort(col("id"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val counts = sorted.groupBy("_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val off = acc; acc += c; (pid, off)
    }
    sorted
      .withColumn("_lrn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("_pid")).orderBy(col("id"))).cast("long"))
      .join(broadcast(offsets.toSeq.toDF("_pid", "_off")), "_pid")
      .select(col("id"), (col("_off") + col("_lrn") - lit(1L)).as("p"))
  }

  /** Per-key winsorized statistics: each key's measure distribution
    * clipped at its own exact [p(tailPct), p(100−tailPct)] boundary
    * VALUES — the robust-mean preprocessing step (a corrupted 1e15-cent
    * order stops dominating its priority class's mean without deleting
    * the row). Boundary ranks are `lo = ceil(n·tailPct/100)`,
    * `hi = n+1−lo` (1-based over (v, id) ascending — id makes ties
    * total); output per key: n, the two cut values, how many rows each
    * tail clamped, and the winsorized sum (DECIMAL(38) accumulator,
    * emitted as a string — cent sums pass 2^63 at the 100 TB design
    * point, the x127 lesson).
    *
    * 100 TB posture: the boundary is found by the [[globalBuckets]]
    * two-phase discipline EXTENDED TO KEYS — one range sort on
    * (k, v, id) (keys stay contiguous), per-(partition, key) counts to
    * the driver (O(partitions × keys) rows, loud refusal past 2^20),
    * broadcast prefix offsets, and a (pid, k)-keyed local rank. NO
    * per-key global window ever exists, so a 5-value key column does
    * not serialize the corpus through 5 tasks — the trap a plain
    * `row_number() OVER (PARTITION BY key)` plan walks into when key
    * cardinality is small. The final clamp+sum is one combinable
    * aggregate over the already-materialized sort. */
  def winsorizedStats(df: DataFrame, key: Column, id: Column,
      measure: Column, tailPct: Int = 10): DataFrame = {
    require(tailPct >= 1 && tailPct <= 49, s"tailPct=$tailPct out of range")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(key.cast("string").as("k"), id.as("id"),
      measure.cast("long").as("v"))
    // checkpointed for the same sampled-range-boundary determinism
    // reason as globalBuckets: counts and rank must see ONE sort
    val sorted = base.sort(col("k"), col("v"), col("id"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val counts = sorted.groupBy("_pid", "k").count().collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._2, t._1))
    require(counts.length <= (1 << 20),
      s"winsorizedStats: ${counts.length} (partition, key) cells — key " +
        "cardinality too high for the driver-side offset table; " +
        "partition the input or bucket the key first")
    val offs = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var curK: String = null
    var acc = 0L
    counts.foreach { case (pid, k, c) =>
      if (k != curK) { curK = k; acc = 0L }
      offs += ((pid, k, acc)); acc += c
    }
    val nK = counts.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
    val ranked = sorted
      .withColumn("_lrn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("_pid"), col("k"))
          .orderBy(col("v"), col("id"))).cast("long"))
      .join(broadcast(offs.toSeq.toDF("_pid", "k", "_off")), Seq("_pid", "k"))
      .join(broadcast(nK.toDF("k", "n_k")), Seq("k"))
      .withColumn("rnk", col("_off") + col("_lrn"))
      .withColumn("lo_rank", expr(s"(n_k * $tailPct + 99) DIV 100"))
      .withColumn("hi_rank", expr("n_k + 1 - lo_rank"))
    val cuts = ranked.groupBy("k")
      .agg(max(when(col("rnk") === col("lo_rank"), col("v"))).as("lo_cut"),
        max(when(col("rnk") === col("hi_rank"), col("v"))).as("hi_cut"))
    sorted.join(broadcast(cuts), Seq("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        max(col("lo_cut")).as("lo_cut"),
        max(col("hi_cut")).as("hi_cut"),
        sum(when(col("v") < col("lo_cut"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("v") > col("hi_cut"), 1L).otherwise(0L)).as("n_hi"),
        sum(expr("CAST(greatest(lo_cut, least(hi_cut, v)) AS DECIMAL(38, 0))"))
          .as("__ws"))
      .withColumn("wsum", col("__ws").cast("string"))
      .drop("__ws")
  }

  /** RFM segmentation: every entity bucketed into `buckets` equal-
    * population slices independently by recency, frequency, and
    * monetary value (bucket 0 = best in each dimension), rolled up to
    * segment cells. Three two-phase global rankings ([[globalBuckets]]
    * — the scale-honest price of data-adaptive cuts; fixed thresholds
    * would be free and wrong), three co-keyed joins at entity
    * cardinality, one ≤`buckets`³-row rollup.
    * Output: (r_bucket, f_bucket, m_bucket, n_entities, monetary_total). */
  def rfmSegments(df: DataFrame, id: Column, recency: Column,
      frequency: Column, monetary: Column, buckets: Int = 4): DataFrame = {
    val base = df.select(id.as("id"), recency.cast("long").as("r"),
      frequency.cast("long").as("f"), monetary.cast("long").as("mv"))
      .localCheckpoint(false)
    val rb = globalBuckets(base, col("id"), col("r"), buckets)
      .select(col("id"), col("bucket").as("r_bucket"))
    val fb = globalBuckets(base, col("id"), col("f"), buckets)
      .select(col("id"), col("bucket").as("f_bucket"))
    val mb = globalBuckets(base, col("id"), col("mv"), buckets)
      .select(col("id"), col("bucket").as("m_bucket"), col("m"))
    rb.join(fb, Seq("id")).join(mb, Seq("id"))
      .groupBy("r_bucket", "f_bucket", "m_bucket")
      .agg(count(lit(1)).as("n_entities"), sum(col("m")).as("monetary_total"))
  }

  /** Approximate functional-dependency strength `lhs → rhs`: per
    * determinant value, the row count, distinct dependent count, the
    * MODE dependent (count desc, value asc — deterministic), and the
    * integer strength `mode_count·1e6 div n` (1e6 = the FD holds
    * exactly). The schema-discovery / data-quality probe: a column
    * pair with strength ≈ 1e6 is a dependency worth enforcing; ≈ 1/|rhs
    * domain| is noise. Two combinable groupBys on (lhs, rhs) — key
    * space is the value-pair domain, not the corpus — and one
    * lhs-partitioned rank for the mode. Output: (lhs, n, n_rhs,
    * mode_rhs, mode_c, strength_e6). */
  def fdStrength(df: DataFrame, lhs: Column, rhs: Column): DataFrame = {
    val g = df.select(lhs.cast("string").as("lhs"), rhs.cast("string").as("rhs"))
      .groupBy("lhs", "rhs").agg(count(lit(1)).as("c"))
    val t = g.groupBy("lhs").agg(sum(col("c")).as("n"),
      count(lit(1)).as("n_rhs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lhs")).orderBy(col("c").desc, col("rhs"))
    val m = g.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("lhs"), col("rhs").as("mode_rhs"), col("c").as("mode_c"))
    t.join(m, Seq("lhs"))
      .select(col("lhs"), col("n"), col("n_rhs"), col("mode_rhs"), col("mode_c"),
        expr("mode_c * 1000000L DIV n").as("strength_e6"))
  }

  /** Per-group top-k rows by an integer measure WITHOUT a rank window:
    * the [[graft.functions.TopKByMeasureAgg]] typed aggregator collapses
    * each group to a ≤k-row sorted state map-side, so the exchange
    * carries k rows per (group × partition) instead of whole groups —
    * the plan `row_number() OVER (PARTITION BY grp)` cannot give you on
    * a 100 TB fact with million-row groups.
    * Output: (grp, rank 1..k, id, m) under (m DESC, id ASC). */
  def groupTopK(df: DataFrame, grp: Column, id: Column, measure: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val agg = udaf(new graft.functions.TopKByMeasureAgg(k),
      ExpressionEncoder[graft.functions.IdMeasure]())
    df.select(grp.as("grp"), id.cast("long").as("id"),
        measure.cast("long").as("m"))
      .groupBy("grp")
      .agg(agg(col("id"), col("m")).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("id"), col("col.m").as("m"))
  }

  /** Candidate-key discovery: per column, the exact distinct and
    * non-null counts → uniqueness ppm and an is-key verdict (a column
    * is a key iff its distinct count equals the ROW count — which also
    * rules out NULLs, since count(distinct) skips them). The schema
    * audit you run before trusting a join key or choosing a bucketing
    * column on a new drop; [[fdStrength]] is the pairwise sequel.
    *
    * 100 TB posture: ONE pass via Spark's multi-count-distinct Expand —
    * ×|cols| row amplification BEFORE the partial distinct absorbs it,
    * with |cols| schema-bounded (single digits), vs |cols| separate
    * scans of a 100 TB fact. The documented trade; the wire after
    * partial aggregation is (value, column-tag) pairs at distinct
    * cardinality. Output: (column_name, n_rows, n_nonnull, n_distinct,
    * uniq_ppm, is_key), one row per audited column. */
  def keyCandidates(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 32,
      s"audit 1..32 columns, got ${cols.size}")
    // column names are spliced into a selectExpr stack() literal — the
    // v-aliases are sanitized below, but the quoted display name must
    // not be able to close the string literal
    cols.foreach { c =>
      require(!c.contains("'"), s"column name '$c' may not contain a quote")
    }
    def safe(c: String): String = c.replaceAll("[^A-Za-z0-9_]", "_")
    val aggs = count(lit(1)).cast("long").as("n_rows") +:
      cols.flatMap(c => Seq(
        count(col(c)).cast("long").as(s"nn_${safe(c)}"),
        countDistinct(col(c)).cast("long").as(s"nd_${safe(c)}")))
    val agg = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', nn_${safe(c)}, nd_${safe(c)}").mkString(", ")
    agg.selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) " +
          "AS (column_name, n_nonnull, n_distinct)")
      .select(col("column_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"),
        expr("n_distinct * 1000000L DIV n_rows").as("uniq_ppm"),
        expr("CAST(CASE WHEN n_distinct = n_rows THEN 1 ELSE 0 END " +
          "AS BIGINT)").as("is_key"))
  }

  /** Referential-integrity audit of one FK edge: child rows whose key
    * has no parent. The child is pre-aggregated to (key, row_count)
    * FIRST, so the anti-join runs at KEY cardinality, not row
    * cardinality — on a 100 TB fact with million-row keys the join
    * input shrinks by that factor before any parent data moves (dims
    * broadcast; fact-fact parents hash-join on keys only). NULL child
    * keys are counted separately (`n_null_rows`), not as orphans — SQL
    * FK semantics. Output: one row (edge, n_rows, n_keys, n_null_rows,
    * n_orphan_keys, n_orphan_rows, orphan_ppm). */
  def riEdge(child: DataFrame, childKey: Column, parent: DataFrame,
      parentKey: Column, edge: String): DataFrame = {
    val g = child.select(childKey.cast("long").as("k"))
      .groupBy("k").agg(count(lit(1)).as("c"))
    val p = parent.select(parentKey.cast("long").as("pk")).distinct()
    val orphans = g.where(col("k").isNotNull)
      .join(p, col("k") === col("pk"), "left_anti")
    val base = g.agg(
      coalesce(sum(col("c")), lit(0L)).as("n_rows"),
      count(col("k")).as("n_keys"),
      coalesce(sum(when(col("k").isNull, col("c"))), lit(0L)).as("n_null_rows"))
    val orph = orphans.agg(
      count(lit(1)).as("n_orphan_keys"),
      coalesce(sum(col("c")), lit(0L)).as("n_orphan_rows"))
    base.crossJoin(broadcast(orph))
      .select(lit(edge).as("edge"), col("n_rows"), col("n_keys"),
        col("n_null_rows"), col("n_orphan_keys"), col("n_orphan_rows"),
        expr("CASE WHEN n_rows = 0 THEN 0L ELSE n_orphan_rows * 1000000L DIV n_rows END")
          .as("orphan_ppm"))
  }

  /** Benford first-digit audit: the leading decimal digit distribution
    * of a positive integer measure vs Benford's law, the fraud /
    * synthetic-data / unit-mixing screen. The digit comes from the
    * integer's STRING head — exact on any engine (no float log10 at
    * bucket boundaries). Expected shares are the canonical rounded ppm
    * constants (they sum to exactly 1e6), shared verbatim with the
    * oracle. One scan-side projection + a 9-row groupBy + a broadcast
    * total — no windows, no second pass. Rows with measure <= 0 are
    * excluded (Benford is defined on positive magnitudes).
    * Output per digit 1..9: (digit, n, obs_ppm, exp_ppm, dev_ppm). */
  val benfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)
  /** Exact pairwise covariance matrix over integer-valued measures in
    * ONE table pass: for every unordered column pair (x, y) — including
    * the diagonal, whose cov is the variance — the row count, the two
    * sums, and the truncated sample covariance
    * `cov_q = (n·Σxy − Σx·Σy) div (n·(n−1))`.
    *
    * The feature-correlation screen a pipeline runs before picking
    * quality-filter thresholds (a signal that is 0.99-correlated with
    * one you already gate on buys nothing). Everything is EXACT
    * integer/DECIMAL arithmetic — the double-accumulation `corr()`
    * built-in is order-dependent and can never hash-match an oracle —
    * and both engines truncate integral division toward zero, so the
    * quotient is reproducible for negative covariances too.
    *
    * 100 TB posture: one scan, one combinable aggregation producing a
    * SINGLE wide row (k + k·(k+1)/2 accumulators), then a driver-free
    * `stack` unpivot of that row into the k·(k+1)/2-row result — no
    * joins, no second pass, no per-pair rescan. Overflow envelope:
    * sums ride DECIMAL(38,0); with per-row |x·y| ≤ 10^14 (two 10^7
    * cent measures) the n·Σxy term stays inside 38 digits up to
    * ~10^17 rows — far past the 100 TB fact.
    *
    * Output: (col_x, col_y, n_rows, sum_x, sum_y, cov_q) with sums as
    * BIGINT (callers keep per-measure totals under 2^63) and pairs in
    * `cols` order. */
  def covMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, s"covMatrix needs >= 2 columns, got ${cols.size}")
    require(cols.forall(c => c._1.matches("[A-Za-z0-9_]+")),
      s"covMatrix column labels must be identifier-safe: ${cols.map(_._1)}")
    import org.apache.spark.sql.types.DecimalType
    val d = df.select(cols.map { case (n, c) => c.cast("long").as(n) }: _*)
    val dec = (n: String) => col(n).cast(DecimalType(38, 0))
    val pairs = for { i <- cols.indices; j <- i until cols.size }
      yield (cols(i)._1, cols(j)._1)
    val aggs =
      cols.map { case (n, _) => sum(dec(n)).as(s"__s_$n") } ++
        pairs.map { case (x, y) =>
          sum(dec(x) * dec(y)).as(s"__d_${x}__$y") }
    val wide = d.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = pairs.map { case (x, y) =>
      s"'$x', '$y', `__s_$x`, `__s_$y`, `__d_${x}__$y`"
    }.mkString(", ")
    wide.select(col("__n").as("n_rows"), expr(
        s"stack(${pairs.size}, $stackArgs) AS (col_x, col_y, __sx, __sy, __dot)"))
      .select(col("col_x"), col("col_y"), col("n_rows"),
        col("__sx").cast("long").as("sum_x"),
        col("__sy").cast("long").as("sum_y"),
        // n < 2 → sample covariance undefined: NULL, never a division
        // error (ANSI) or silent null-by-accident (the trendSlope idiom)
        expr("CASE WHEN n_rows < 2 THEN CAST(NULL AS BIGINT) ELSE " +
          "CAST((CAST(n_rows AS DECIMAL(38,0)) * __dot - __sx * __sy) " +
          "DIV (CAST(n_rows AS DECIMAL(38,0)) * (n_rows - 1)) AS BIGINT) END")
          .as("cov_q"))
  }

  /** Join-cardinality statistics for one equi-join edge WITHOUT
    * materializing the join: both sides pre-aggregate to (key, count)
    * histograms, and `Σ c_left(k)·c_right(k)` over the key-level merge
    * IS the exact equi-join row count — the optimizer-statistics
    * primitive (join reorder, broadcast decisions, skew planning all
    * start from this number, and at 100 TB you cannot afford to learn
    * it by running the join).
    *
    * Plan: two combinable count groupBys (each at its own KEY
    * cardinality), one key-level inner join between the histograms,
    * one final fold to a single row. The fact tables themselves never
    * shuffle — only (key, count) pairs do. Exact integers; the product
    * sum rides DECIMAL(38,0) (envelope: join output < 10^38 rows).
    *
    * Output: one row (edge, n_left, n_right, keys_left, keys_right,
    * keys_matched, join_rows, max_key_rows). */
  def joinCardStats(left: DataFrame, leftKey: Column, right: DataFrame,
      rightKey: Column, edge: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val l = left.select(leftKey.cast("long").as("k"))
      .groupBy("k").agg(count(lit(1)).as("cl"))
    val r = right.select(rightKey.cast("long").as("k"))
      .groupBy("k").agg(count(lit(1)).as("cr"))
    val lt = l.agg(sum(col("cl")).as("n_left"), count(lit(1)).as("keys_left"))
    val rt = r.agg(sum(col("cr")).as("n_right"), count(lit(1)).as("keys_right"))
    val m = l.join(r, Seq("k"))
      .agg(count(lit(1)).as("keys_matched"),
        coalesce(sum(col("cl").cast(DecimalType(38, 0)) * col("cr")), lit(0L))
          .cast(DecimalType(38, 0)).as("join_dec"),
        coalesce(max(col("cl").cast(DecimalType(38, 0)) * col("cr")), lit(0L))
          .cast("long").as("max_key_rows"))
    lt.crossJoin(broadcast(rt)).crossJoin(broadcast(m))
      .select(lit(edge).as("edge"), col("n_left"), col("n_right"),
        col("keys_left"), col("keys_right"), col("keys_matched"),
        col("join_dec").cast("long").as("join_rows"), col("max_key_rows"))
  }

  def benfordAudit(df: DataFrame, measure: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digits = df.select(measure.cast("long").as("m"))
      .where(col("m") > 0)
      .select(substring(col("m").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      // ≤9 rows, consumed twice (report + total): checkpointing the
      // aggregate keeps the claim honest — ONE scan of the fact
      .localCheckpoint(false)
    val exp = broadcast(benfordPpm.toDF("digit", "exp_ppm"))
    // right join from the expected table so digits absent from the data
    // still emit a row (n=0) — the audit must show the hole
    digits.join(exp, Seq("digit"), "right")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(digits.agg(coalesce(sum(col("n")), lit(0L)).as("total"))))
      .select(col("digit"), col("n"),
        expr("CASE WHEN total = 0 THEN 0L ELSE n * 1000000L DIV total END").as("obs_ppm"),
        col("exp_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
  }

  /** Per-stratum WEIGHTED lower median of an integer measure: the
    * smallest value v whose running weight (ordered by value, id)
    * reaches `(W+1) div 2` — "the median document BY TOKENS" instead of
    * by count, the form corpus data cards actually need (a million
    * 10-char stubs should not drag the size median to 10). Exact
    * integer order statistics: reproducible on any engine, no
    * interpolation.
    *
    * Plan: the running weight rides [[StratumRank.cumsum]]'s two-phase
    * decomposition (round 14 — strata here are source-shaped, so a
    * bare-stratum window would single-task a fat stratum's sort) + a
    * broadcast totals join + one conditional-min groupBy — no global
    * window. The (v, id) order is total, so the running sums are
    * identical to the single-window form.
    * Output: (stratum, n, w_total, wmedian). */
  def weightedMedian(df: DataFrame, stratum: Column, value: Column,
      weight: Column, order: Column): DataFrame = {
    val d = df.select(stratum.as("stratum"), value.cast("long").as("v"),
        weight.cast("long").as("wt"), order.as("id"))
    val totals = d.groupBy("stratum")
      .agg(count(lit(1)).as("n"), sum(col("wt")).as("w_total"))
    StratumRank.cumsum(d, col("stratum"), Seq(col("v"), col("id")),
        col("wt"))
      .withColumnRenamed("__cum", "cumw").drop("__s")
      .join(broadcast(totals), Seq("stratum"))
      .where(col("cumw") >= expr("(w_total + 1) DIV 2"))
      .groupBy("stratum", "n", "w_total")
      .agg(min(col("v")).as("wmedian"))
      .select(col("stratum"), col("n"), col("w_total"), col("wmedian"))
  }

  /** Pairwise 1-D earth-mover's distance between strata over the EXACT
    * log2-binned distribution of an integer measure: for every stratum
    * pair, `Σ_bins |cumA·N_B − cumB·N_A|` — the CDF-difference form of
    * EMD, cross-multiplied so it stays in exact integers (divide by
    * N_A·N_B to read it as bins-of-mass moved). Distinguishes
    * distributions that total-variation distance (x94) sees as close
    * when the mass moved FAR.
    *
    * Plan: one combinable (stratum, bin) count, a broadcast 63-row bin
    * spine making the sparse histogram dense (gaps carry constant CDF
    * diff — they must count), a stratum-partitioned cum window over
    * ≤63 rows, one |strata|²·63 pair join — everything after the first
    * aggregate is strata-bounded. Output: (sa, sb, n_a, n_b, emd_x). */
  /** Bucketed two-sample Kolmogorov–Smirnov drift: for each stratum,
    * the KS statistic between ITS value distribution and the REST of
    * the corpus, on [[log2Emd]]'s shared 63-bin log2 grid — KS is the
    * max-deviation lens and EMD the area lens over the same CDFs, and
    * together they answer "does this source's length profile diverge,
    * and is the divergence a spike or a drift".
    *
    * Exact integer cross-multiplication, no float CDFs:
    * `ks_ppm = max_b |cum_s(b)·n_rest − cum_rest(b)·n_s| · 1e6 /
    * (n_s·n_rest)` in DECIMAL(38); `ks_bin` is the argmax bin
    * (smallest bin wins ties — pinned by the struct-max tiebreak).
    * The REST distribution is the global minus the stratum's own
    * cumulative, computed from the SAME 63-bin table — no second pass
    * over the corpus.
    *
    * 100 TB posture: identical to log2Emd — the corpus folds into
    * per-stratum 63-bin counts in one combinable pass; everything
    * after runs on the dimension-sized CDF table. Strata covering the
    * whole corpus (n_rest = 0) drop out, documented.
    * Output: (s, n_s, n_rest, ks_ppm, ks_bin). */
  def log2Ks(df: DataFrame, stratum: Column, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(stratum.cast("string").as("s"),
        value.cast("long").as("v"))
      .where(col("v") >= 1)
      .select(col("s"), (length(bin(col("v"))) - 1).cast("long").as("b"))
      .groupBy("s", "b").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val spine = broadcast((0L until 63L).toDF("b"))
    val strata = counts.select(col("s")).distinct()
    val dense = strata.crossJoin(spine)
      .join(counts, Seq("s", "b"), "left")
      .na.fill(0L, Seq("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s")).orderBy(col("b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = dense.withColumn("cum", sum(col("n")).over(w))
      .localCheckpoint(false)
    val gcum = cum.groupBy("b").agg(sum(col("cum")).as("gcum"))
    val tot = cum.groupBy("s").agg(max(col("cum")).as("n_s"))
    val nTot = tot.agg(sum(col("n_s")).as("n_tot"))
    cum.join(broadcast(gcum), Seq("b"))
      .join(broadcast(tot), Seq("s"))
      .crossJoin(broadcast(nTot))
      .where(col("n_tot") > col("n_s"))
      .select(col("s"), col("n_s"),
        (col("n_tot") - col("n_s")).as("n_rest"),
        expr("abs(CAST(cum AS DECIMAL(38,0)) * (n_tot - n_s) " +
          "- CAST(gcum - cum AS DECIMAL(38,0)) * n_s)").as("dx"),
        (-col("b")).as("nb"))
      .groupBy("s", "n_s", "n_rest")
      .agg(max(struct(col("dx"), col("nb"))).as("m"))
      .select(col("s"), col("n_s"), col("n_rest"),
        expr("CAST(CAST(m.dx AS DECIMAL(38,0)) * 1000000 " +
          "DIV (CAST(n_s AS DECIMAL(38,0)) * n_rest) AS BIGINT)")
          .as("ks_ppm"),
        (-col("m.nb")).as("ks_bin"))
  }

  def log2Emd(df: DataFrame, stratum: Column, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(stratum.cast("string").as("s"),
        value.cast("long").as("v"))
      .where(col("v") >= 1)
      .select(col("s"), (length(bin(col("v"))) - 1).cast("long").as("b"))
      .groupBy("s", "b").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val spine = broadcast((0L until 63L).toDF("b"))
    val strata = counts.select(col("s")).distinct()
    val dense = strata.crossJoin(spine)
      .join(counts, Seq("s", "b"), "left")
      .na.fill(0L, Seq("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s")).orderBy(col("b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = dense.withColumn("cum", sum(col("n")).over(w))
      .localCheckpoint(false)
    val tot = cum.groupBy("s").agg(max(col("cum")).as("nt"))
    val a = cum.join(tot, Seq("s"))
      .select(col("s").as("sa"), col("b"), col("cum").as("ca"), col("nt").as("n_a"))
    val bb = cum.join(tot, Seq("s"))
      .select(col("s").as("sb"), col("b"), col("cum").as("cb"), col("nt").as("n_b"))
    a.join(bb, Seq("b"))
      .where(col("sa") < col("sb"))
      .groupBy("sa", "sb", "n_a", "n_b")
      .agg(sum(abs(col("ca") * col("n_b") - col("cb") * col("n_a"))).as("emd_x"))
      .select(col("sa"), col("sb"), col("n_a"), col("n_b"), col("emd_x"))
  }

  /** Chi-squared association between two categorical columns, exact to
    * the last ppm digit: are `a` and `b` independent, and how far off?
    * The screening test a feature audit runs before trusting (or
    * dropping) a categorical pair — χ² ≈ 0 means `b` adds nothing once
    * `a` is known.
    *
    * Exactness: χ² = Σ_cells (o−e)²/e with e = rowTot·colTot/N expands
    * to Σ_occupied o²·N/(rowTot·colTot) − N (unoccupied cells fold into
    * the −N term because Σo = Σe = N), so only OCCUPIED cells are ever
    * touched and every per-cell term is one integer product and one
    * truncating DIV — both engines truncate identically, no floats.
    * Envelope: o²·N·1e6 must fit DECIMAL(38) → N ≲ 3e9 rows; beyond
    * that, pre-aggregate or drop to e3 scaling (documented, loud).
    *
    * 100 TB posture: ONE data-scale exchange (the contingency groupBy,
    * combinable); margins are groupBys over the CELLS (≤ |a|×|b| rows)
    * joined back broadcast; the final rollup is cells → 1 row. A hot
    * (a,b) cell is a map-side partial like any other count.
    * Output: one row (n, a_levels, b_levels, dof, chi2_ppm,
    * chi2_per_n_ppm). */
  def chi2Assoc(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.select(a.cast("string").as("a"), b.cast("string").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
      .localCheckpoint(false) // margins + terms reuse one cell pass
    val ra = cells.groupBy("a").agg(sum(col("o")).as("ra"))
    val cb = cells.groupBy("b").agg(sum(col("o")).as("cb"))
    val n = cells.agg(sum(col("o")).as("n"), count(lit(1)).as("cells"))
    cells.join(broadcast(ra), Seq("a")).join(broadcast(cb), Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("n"), col("ra"), col("cb"), col("o"),
        expr("CAST(o AS DECIMAL(38,0)) * o * n * 1000000 DIV (CAST(ra AS DECIMAL(38,0)) * cb)")
          .as("t"))
      .groupBy("n")
      .agg(count(lit(1)).as("cells_occupied"), sum(col("t")).as("__tsum"))
      // level counts come from the margin frames (|a| and |b| rows),
      // not a countDistinct over the corpus
      .crossJoin(broadcast(ra.agg(count(lit(1)).as("a_levels"))))
      .crossJoin(broadcast(cb.agg(count(lit(1)).as("b_levels"))))
      .select(col("n"), col("a_levels"), col("b_levels"),
        col("cells_occupied"),
        ((col("a_levels") - 1) * (col("b_levels") - 1)).as("dof"),
        expr("CAST(__tsum - CAST(n AS DECIMAL(38,0)) * 1000000 AS BIGINT)")
          .as("chi2_ppm"))
      .withColumn("chi2_per_n_ppm", expr("chi2_ppm DIV n"))
  }

  /** t-closeness audit — the third leg of the release-gate triad after
    * [[kAnonymity]] (classes big enough) and [[lDiversity]] (classes
    * varied enough): a class can be big AND varied yet still leak if
    * its sensitive-value MIX is skewed vs the corpus (Li et al., ICDE
    * 2007). Each quasi-identifier class is scored by the total
    * variation distance between its sensitive distribution and the
    * global one, exact in ppm: tvd = ½ Σ_s |p_class(s) − p_global(s)|
    * = Σ_s |n_cs·N − g_s·n_c| / (2·n_c·N) — one integer numerator per
    * sensitive value, one truncating DIV per class.
    *
    * Absent values cost nothing extra: a sensitive value missing from
    * a class contributes g_s·n_c to the numerator, and Σ_{s∉class}
    * g_s·n_c = n_c·(N − Σ_{s∈class} g_s), so the whole audit runs on
    * OCCUPIED (class, sensitive) cells only.
    *
    * 100 TB posture: one data-scale exchange (the cell groupBy,
    * combinable); global sensitive counts and per-class totals are
    * cell-scale groupBys joined back broadcast; the final rollup is
    * cells → classes. Output: (qids..., n, tvd_ppm, at_risk). */
  def tCloseness(df: DataFrame, qids: Seq[(String, Column)],
      sensitive: Column, tPpm: Long): DataFrame = {
    require(qids.nonEmpty && tPpm > 0 && tPpm <= 1000000,
      s"tCloseness(qids=${qids.size}, tPpm=$tPpm)")
    val named = qids.map { case (nm, c) => c.as(nm) }
    val qidCols = qids.map { case (nm, _) => col(nm) }
    val cells = df
      .select((named :+ sensitive.cast("string").as("__s")): _*)
      .groupBy((qidCols :+ col("__s")): _*)
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(false) // three cell-scale readers below
    val gs = cells.groupBy("__s").agg(sum(col("__cnt")).as("__gs"))
    val tot = gs.agg(sum(col("__gs")).as("__n"))
    val classes = cells.groupBy(qidCols: _*).agg(sum(col("__cnt")).as("n"))
    cells.join(broadcast(gs), Seq("__s"))
      .join(broadcast(classes), qids.map(_._1))
      .crossJoin(broadcast(tot))
      .groupBy((qidCols :+ col("n") :+ col("__n")): _*)
      .agg(sum(abs(expr("CAST(__cnt AS DECIMAL(38,0)) * __n - CAST(__gs AS DECIMAL(38,0)) * n")))
          .as("__occ"),
        sum(col("__gs")).as("__gsum"))
      .select((qidCols :+ col("n") :+
        expr("CAST((__occ + CAST(n AS DECIMAL(38,0)) * (__n - __gsum)) * 1000000 " +
          "DIV (2 * CAST(n AS DECIMAL(38,0)) * __n) AS BIGINT)").as("tvd_ppm")): _*)
      .withColumn("at_risk",
        when(col("tvd_ppm") > tPpm, 1).otherwise(0).cast("int"))
  }

  /** Market concentration per market: Herfindahl–Hirschman index and
    * CR4 (top-4 firm share), both in exact ppm — the antitrust-style
    * skew report that also reads as a SHARD-BALANCE audit (market =
    * shard key, firm = producer, HHI ≈ 1e6 means one producer owns the
    * shard). HHI = Σ r_i²·1e6 DIV R² in one truncating DIV; revenue
    * totals ride DECIMAL(38) and ship as strings (cent sums pass 2^63
    * at the design point — the x127 lesson).
    *
    * 100 TB posture: ONE data-scale exchange (the (market, firm)
    * rollup, combinable). The ranking window runs over the FIRM-LEVEL
    * AGGREGATE (|firms| rows, keyed by market) — never the fact table;
    * a market's firm list must fit one task, the same per-entity
    * contract as every keyed window here.
    * Output: (m, n_firms, revenue string, hhi_ppm, cr4_ppm). */
  def marketConcentration(df: DataFrame, market: Column, firm: Column,
      revenue: Column): DataFrame = {
    val per = df.select(market.as("m"), firm.as("f"),
        revenue.cast("long").as("r0"))
      .groupBy("m", "f")
      .agg(sum(expr("CAST(r0 AS DECIMAL(38,0))")).as("r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("m")).orderBy(col("r").desc, col("f"))
    per.withColumn("rk", row_number().over(w))
      .groupBy("m")
      .agg(count(lit(1)).as("n_firms"),
        sum(col("r")).as("rev"),
        sum(expr("r * r")).as("r2"),
        sum(when(col("rk") <= 4, col("r"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("top4"))
      .select(col("m"), col("n_firms"),
        expr("CAST(rev AS STRING)").as("revenue"),
        expr("CAST(r2 * 1000000 DIV (rev * rev) AS BIGINT)").as("hhi_ppm"),
        expr("CAST(top4 * 1000000 DIV rev AS BIGINT)").as("cr4_ppm"))
  }

  /** Gini split impurity of a categorical target under a categorical
    * feature — the decision-tree split evaluator, exact in ppm:
    * impurity(f) = 1 − Σ_y p(y|f)² = (n_f² − Σ c²)·1e6 DIV n_f², plus
    * each branch's population-weighted contribution and a `<all>` row
    * carrying the parent impurity, so gain = parent − Σ contribs reads
    * straight off the result. The audit a feature pipeline runs next
    * to [[chi2Assoc]] before keeping a categorical.
    *
    * 100 TB posture: one data-scale exchange (the (feature, target)
    * cell groupBy, combinable); everything after runs on cells.
    * Output: (f, n, n_classes, impurity_ppm, wimp_ppm), one row per
    * feature value + the `<all>` parent row. */
  def giniSplit(df: DataFrame, feature: Column, target: Column)
      : DataFrame = {
    val cells = df.select(feature.cast("string").as("f"),
        target.cast("string").as("y"))
      .groupBy("f", "y").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // per-feature, parent, and total readers
    val perF = cells.groupBy("f")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_classes"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("c2"))
    val parent = cells.groupBy("y").agg(sum(col("c")).as("c"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_classes"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("c2"))
      .select(lit("<all>").as("f"), col("n"), col("n_classes"), col("c2"))
    val nTot = cells.agg(sum(col("c")).as("n_all"))
    perF.select("f", "n", "n_classes", "c2").unionAll(parent)
      .crossJoin(broadcast(nTot))
      .withColumn("impurity_ppm",
        expr("CAST((CAST(n AS DECIMAL(38,0)) * n - c2) * 1000000 " +
          "DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
      .withColumn("wimp_ppm",
        expr("CAST(CAST(impurity_ppm AS DECIMAL(38,0)) * n DIV n_all AS BIGINT)"))
      .select("f", "n", "n_classes", "impurity_ppm", "wimp_ppm")
  }

  /** Mann–Whitney U / ROC-AUC of an integer score against a binary
    * label, exact to the last ppm: AUC = P(score⁺ > score⁻) + ½P(=) —
    * the threshold-free answer to "does this quality score actually
    * separate the classes?". Midrank tie handling is EXACT without any
    * per-tie averaging: after the global row rank, each distinct value
    * group knows its size `n_v`, its positive count `c1`, and its
    * minimum rank, and the doubled midrank sum is
    * Σ c1·(2·(minr−1) + n_v + 1) — integer algebra end to end, so
    * U×2 = that sum − n₁(n₁+1) and auc_ppm needs ONE truncating DIV.
    *
    * 100 TB posture: the global rank is the [[globalBuckets]] two-phase
    * range-sort discipline (checkpoint + per-partition driver offsets +
    * broadcast — no global window, and the tie-break id never affects
    * the result: only min-rank and counts per value survive); after it,
    * one combinable groupBy per distinct value and a 1-row rollup.
    * U×2 ships as a string — n₁·n₀ passes 2^63 long before the design
    * point. Output: one row (n_pos, n_neg, u_x2, auc_ppm). */
  def rankAuc(df: DataFrame, label: Column, value: Column, id: Column)
      : DataFrame = {
    val base = df.select(label.cast("int").as("y"),
      value.cast("long").as("v"), id.as("id"))
    val sorted = base.sort(col("v"), col("id"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // sampled range boundaries must not re-roll
    val counts = sorted.groupBy("_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val off = acc; acc += c; (pid, off) }
    val spark = df.sparkSession
    import spark.implicits._
    sorted
      .withColumn("_lrn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("_pid")).orderBy(col("v"), col("id"))).cast("long"))
      .join(broadcast(offsets.toSeq.toDF("_pid", "_off")), "_pid")
      .withColumn("rnk", col("_off") + col("_lrn"))
      .groupBy("v")
      .agg(count(lit(1)).as("n_v"), sum(col("y")).as("c1"),
        min(col("rnk")).as("minr"))
      .agg(sum(col("c1")).as("n1"), sum(col("n_v") - col("c1")).as("n0"),
        sum(expr("CAST(c1 AS DECIMAL(38,0)) * (2 * (minr - 1) + n_v + 1)"))
          .as("r1_x2"))
      .select(col("n1").as("n_pos"), col("n0").as("n_neg"),
        expr("CAST(r1_x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS STRING)")
          .as("u_x2"),
        expr("CAST((r1_x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)) * 1000000 " +
          "DIV (2 * CAST(n1 AS DECIMAL(38,0)) * n0) AS BIGINT)").as("auc_ppm"))
  }

  /** Two-proportion z² for every segment pair — the A/B readout: does
    * segment i convert differently from segment j, and is the gap
    * significant? z² (= the 2×2 χ², df 1) is rational:
    * z² = (x₁n₂ − x₂n₁)²·N / (n₁n₂·X·(N−X)), X = x₁+x₂, N = n₁+n₂ —
    * one truncating DIV per pair, so the whole table is hash-provable.
    * `significant` flags z² > 3.841459 (χ²₁ at 95%, in ppm).
    *
    * 100 TB posture: ONE data-scale exchange (the per-segment
    * conversion rollup, combinable); the pair matrix is a broadcast
    * self-join over |segments| rows (a < b). Degenerate pairs (zero or
    * all conversions pooled) read NULL, not a crash.
    * Output: (seg_a, seg_b, n_a, x_a, n_b, x_b, diff_ppm, z2_ppm,
    * significant). */
  def twoProportionZ2(df: DataFrame, segment: Column, converted: Column)
      : DataFrame = {
    val per = df.select(segment.cast("string").as("s"),
        converted.cast("int").as("c"))
      .groupBy("s").agg(count(lit(1)).as("n"), sum(col("c")).as("x"))
    val a = per.select(col("s").as("seg_a"), col("n").as("n_a"),
      col("x").as("x_a"))
    val b = per.select(col("s").as("seg_b"), col("n").as("n_b"),
      col("x").as("x_b"))
    a.join(broadcast(b), col("seg_a") < col("seg_b"))
      .withColumn("diff_ppm",
        expr("CAST((CAST(x_a AS DECIMAL(38,0)) * n_b - CAST(x_b AS DECIMAL(38,0)) * n_a) " +
          "* 1000000 DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
      .withColumn("z2_ppm",
        expr("CASE WHEN (x_a + x_b) > 0 AND (x_a + x_b) < (n_a + n_b) THEN " +
          "CAST((CAST(x_a AS DECIMAL(38,0)) * n_b - CAST(x_b AS DECIMAL(38,0)) * n_a) " +
          "* (CAST(x_a AS DECIMAL(38,0)) * n_b - CAST(x_b AS DECIMAL(38,0)) * n_a) " +
          "* (n_a + n_b) * 1000000 DIV (CAST(n_a AS DECIMAL(38,0)) * n_b " +
          "* (x_a + x_b) * (n_a + n_b - x_a - x_b)) AS BIGINT) ELSE NULL END"))
      .withColumn("significant",
        when(col("z2_ppm") > 3841459L, 1).otherwise(0).cast("int"))
      .select("seg_a", "seg_b", "n_a", "x_a", "n_b", "x_b", "diff_ppm",
        "z2_ppm", "significant")
  }

  /** Two-sample χ² drift of each stratum's log2-value histogram against
    * the REST of the corpus — the SIGNIFICANCE member of the drift trio
    * ([[log2Ks]] max-deviation, [[log2Emd]] mass-transport, here "is
    * the difference more than chance"). The two per-bin terms share one
    * numerator (d = n1·N − cb·N1 is the other side's negation), so the
    * whole bin collapses to ONE truncating DIV:
    *
    *   term_ppm(b) = d²·1e6 DIV (cb·N1·N2)
    *
    * REST is global−own from the SAME bin table (no second corpus
    * pass, the x187 discipline); bins the stratum never hit still
    * contribute (the spine is strata × global bins). A stratum that IS
    * the whole corpus reads NULL (N2 = 0), loudly. `drifted` flags
    * χ²/dof > 2e6 (the x211 heuristic). χ² for a 2×k table is bounded
    * by N, so chi2_ppm fits BIGINT to N ≈ 9e9; the d² products need
    * N ≲ 1e12 inside DECIMAL(38).
    *
    * 100 TB posture: one data-scale exchange (the (stratum, bin)
    * rollup); margins, spine, and χ² are all ≤ |strata|×63 rows.
    * Output: (s, n_own, n_rest, bins_occupied, chi2_ppm,
    * chi2_per_dof_ppm, drifted). */
  def log2Chi2Drift(df: DataFrame, stratum: Column, value: Column)
      : DataFrame = {
    val binned = df.select(stratum.cast("string").as("s"),
        value.cast("long").as("v"))
      .where(col("v") >= 1)
      .select(col("s"), (length(bin(col("v"))) - 1).cast("long").as("b"))
      .groupBy("s", "b").agg(count(lit(1)).as("n1"))
      .localCheckpoint(false) // margins + spine share one bin pass
    val gb = binned.groupBy("b").agg(sum(col("n1")).as("cb"))
    val st = binned.groupBy("s").agg(sum(col("n1")).as("n_own"))
    val tot = gb.agg(sum(col("cb")).as("nn"))
    st.crossJoin(broadcast(gb)).crossJoin(broadcast(tot))
      .join(binned, Seq("s", "b"), "left")
      .na.fill(0L, Seq("n1"))
      // the exact (a − a%b)/b DECIMAL floor (the x214 lesson): a DIV
      // quotient here can pass 2^63 when one stratum owns a bin
      .withColumn("__d2",
        expr("(CAST(n1 AS DECIMAL(38,0)) * nn - CAST(cb AS DECIMAL(38,0)) * n_own) " +
          "* (CAST(n1 AS DECIMAL(38,0)) * nn - CAST(cb AS DECIMAL(38,0)) * n_own) " +
          "* 1000000"))
      .withColumn("__den",
        expr("CAST(cb AS DECIMAL(38,0)) * n_own * (nn - n_own)"))
      .withColumn("term",
        expr("CASE WHEN nn > n_own THEN " +
          "CAST((__d2 - __d2 % __den) / __den AS DECIMAL(38,0)) " +
          "ELSE NULL END"))
      .groupBy("s", "n_own", "nn")
      .agg(count(lit(1)).as("bins_occupied"), sum(col("term")).as("__chi"))
      .select(col("s"), col("n_own"), (col("nn") - col("n_own")).as("n_rest"),
        col("bins_occupied"),
        expr("CAST(__chi AS BIGINT)").as("chi2_ppm"))
      .withColumn("chi2_per_dof_ppm",
        expr("CASE WHEN bins_occupied >= 2 THEN chi2_ppm DIV (bins_occupied - 1) " +
          "ELSE NULL END"))
      .withColumn("drifted",
        when(col("chi2_per_dof_ppm") > 2000000L, 1).otherwise(0).cast("int"))
  }

  /** One-way ANOVA F of an integer measure across groups — the
    * numeric×categorical member of the bivariate test quadrant
    * ([[chi2Assoc]] cat×cat, [[rankAuc]] score×binary,
    * [[twoProportionZ2]] proportion pairs): does the group mean differ
    * more than chance? Sums of squares ride e6 fixed point with ONE
    * truncating DIV per group (ssb_q = Σ S_g²·1e6 DIV n_g — mirrored
    * verbatim by the oracle, so deterministic everywhere), and F is
    * computed from the MEAN squares (msb = ssb DIV df1, msw = ssw DIV
    * df2) to keep the product inside DECIMAL(38) — envelope N·v²
    * ≲ 1e26. `fCritPpm` is the caller's critical value (depends on
    * df1 — e.g. F(4, ∞) at 95% = 2.371945 → 2371945).
    *
    * 100 TB posture: ONE combinable data-scale groupBy (per-group
    * n/S/Q moments); everything after is |groups| rows. Degenerate
    * inputs (one group, zero within-variance) read NULL, not a crash.
    * Output: one row (k_groups, n, ssb_e6 string, ssw_e6 string,
    * f_ppm, significant). */
  def oneWayAnova(df: DataFrame, group: Column, value: Column,
      fCritPpm: Long): DataFrame = {
    require(fCritPpm > 0, s"fCritPpm=$fCritPpm must be positive")
    val per = df.select(group.cast("string").as("g"),
        value.cast("long").as("v"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_g"),
        sum(expr("CAST(v AS DECIMAL(38,0))")).as("s_g"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("q_g"))
    // `DIV` returns LONG, and these quotients pass 2^63 (S_g²·1e6/n_g
    // ~ N·v²·1e6) — the exact floor is (a − a % b)/b instead: the
    // subtraction makes the division remainder-free, so the DECIMAL
    // divide is exact and the quotient stays in DECIMAL(38)
    per.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("s_g")).as("s"), sum(col("q_g")).as("q"),
        sum(expr("CAST((s_g * s_g * 1000000 - s_g * s_g * 1000000 % n_g) " +
          "/ n_g AS DECIMAL(38,0))")).as("ssb_q"))
      .withColumn("total_q",
        expr("CAST((s * s * 1000000 - s * s * 1000000 % n) / n " +
          "AS DECIMAL(38,0))"))
      .withColumn("ssb_e6", expr("ssb_q - total_q"))
      .withColumn("ssw_e6", expr("q * 1000000 - ssb_q"))
      .withColumn("f_ppm",
        expr("CASE WHEN k >= 2 AND n > k AND ssw_e6 > 0 THEN " +
          "CAST(CAST((ssb_e6 - ssb_e6 % (k - 1)) / (k - 1) AS DECIMAL(38,0)) " +
          "* 1000000 DIV " +
          "CAST((ssw_e6 - ssw_e6 % (n - k)) / (n - k) AS DECIMAL(38,0)) " +
          "AS BIGINT) ELSE NULL END"))
      .withColumn("significant",
        when(col("f_ppm") > fCritPpm, 1).otherwise(0).cast("int"))
      .select(col("k").as("k_groups"), col("n"),
        expr("CAST(ssb_e6 AS STRING)").as("ssb_e6"),
        expr("CAST(ssw_e6 AS STRING)").as("ssw_e6"),
        col("f_ppm"), col("significant"))
  }

  /** Score-calibration reliability table: entities bucketed into
    * equal-population score deciles (the [[globalBuckets]] two-phase
    * rank — bucket 0 = highest scores), each with its observed positive
    * rate vs its floor-mean score — the table that says WHERE a quality
    * score is over- or under-confident, the companion to [[rankAuc]]'s
    * single-number discrimination.
    *
    * The label rides INSIDE the rank id (id' = id·2 + y), so no
    * data-scale join back is ever needed: bucket rows decode y = id'
    * mod 2 scan-side. Rank ties on (score, id') stay total and
    * deterministic. Output: (bucket, n, n_pos, pos_rate_ppm,
    * sum_score string, mean_score_floor). */
  def calibrationTable(df: DataFrame, id: Column, score: Column,
      label: Column, buckets: Int = 10): DataFrame = {
    val base = df.select((id * 2 + label.cast("long")).as("id2"),
      score.cast("long").as("sc"))
    globalBuckets(base, col("id2"), col("sc"), buckets)
      .select(col("bucket"), col("m"), pmod(col("id"), lit(2L)).as("y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(expr("CAST(m AS DECIMAL(38,0))")).as("sum_sc"))
      .select(col("bucket"), col("n"), col("n_pos"),
        expr("n_pos * 1000000L DIV n").as("pos_rate_ppm"),
        expr("CAST(sum_sc AS STRING)").as("sum_score"),
        expr("CAST(sum_sc DIV n AS BIGINT)").as("mean_score_floor"))
  }

  /** Kruskal–Wallis H — the NONPARAMETRIC one-way test beside
    * [[oneWayAnova]] (same question, "do the k groups share a location?",
    * zero distributional assumptions — the right member of the pair when
    * the measure is heavy-tailed, which money columns are). Midrank ties
    * by integer algebra on per-VALUE groups over the two-phase global
    * rank (the [[rankAuc]] discipline — no averaging, no global window):
    * with S2_g = Σ ranks·2 in group g and deviation
    * d_g = S2_g − n_g(N+1),
    *
    *   H_ppm = (Σ_g ⌊3e6·d_g² / n_g⌋) DIV (N(N+1))
    *
    * (each per-group term floors via the exact (a − a%b)/b DECIMAL
    * floor — the x214 lesson); the tie-corrected
    * h_tie_ppm = H_ppm·(N³−N) DIV (N³−N−ΣT), T_v = n_v³−n_v, NULL when
    * every value ties. `significant` compares against the caller's
    * χ²_{k−1} critical value in ppm (the df varies with k, so the
    * threshold is an argument, [[oneWayAnova]]'s fCritPpm contract).
    *
    * Measure envelope: d_g² ·3e6 must sit inside DECIMAL(38) —
    * N ≲ 10⁷ rows per test, enforced LOUDLY at runtime through the
    * n-column guard (at the 100 TB design point a location test runs on
    * a stratified sample — x27/x205 — never the raw corpus; the sample
    * IS the statistic).
    *
    * 100 TB posture: one range sort (localCheckpoint-pinned sampled
    * boundaries), per-partition counts to the driver (O(partitions)),
    * broadcast offsets, then value-cardinality and group-cardinality
    * combinable rollups. Output: one row
    * (n, k_groups, h_ppm, h_tie_ppm, significant). */
  def kruskalWallis(df: DataFrame, group: Column, value: Column,
      id: Column, chi2CritPpm: Long): DataFrame = {
    require(chi2CritPpm > 0, s"chi2CritPpm=$chi2CritPpm must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(group.cast("string").as("g"),
      value.cast("long").as("v"), id.as("id"))
    val sorted = base.sort(col("v"), col("id"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // sampled range boundaries must not re-roll
    val counts = sorted.groupBy("_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val off = acc; acc += c; (pid, off) }
    val ranked = sorted
      .withColumn("_lrn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("_pid")).orderBy(col("v"), col("id"))).cast("long"))
      .join(broadcast(offsets.toSeq.toDF("_pid", "_off")), "_pid")
      .withColumn("rnk", col("_off") + col("_lrn"))
    val byVal = ranked.groupBy("v")
      .agg(count(lit(1)).as("n_v"), min(col("rnk")).as("minr"))
      .withColumn("mid2", expr("2 * (minr - 1) + n_v + 1"))
      .withColumn("tie", expr("CAST(n_v AS DECIMAL(38,0)) * n_v * n_v - n_v"))
    val perG = ranked.groupBy("v", "g").agg(count(lit(1)).as("c"))
      .join(byVal.select(col("v"), col("mid2")), Seq("v"))
      .groupBy("g")
      .agg(sum(col("c")).as("n_g"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * mid2")).as("s2_g"))
    val ties = byVal.agg(sum(col("tie")).as("sum_t"))
    val tot = perG.agg(sum(col("n_g")).as("n_raw"),
      count(lit(1)).as("k_groups"))
    perG.crossJoin(broadcast(tot)).crossJoin(broadcast(ties))
      .withColumn("d2",
        expr("(s2_g - CAST(n_g AS DECIMAL(38,0)) * (n_raw + 1)) * " +
          "(s2_g - CAST(n_g AS DECIMAL(38,0)) * (n_raw + 1)) * 3000000"))
      .groupBy("sum_t", "k_groups", "n_raw")
      .agg(sum(expr("CAST((d2 - d2 % n_g) / n_g AS DECIMAL(38,0))"))
        .as("hsum"))
      .withColumn("n",
        expr("CASE WHEN n_raw >= 100000000 THEN " +
          "CAST(raise_error('kruskalWallis: N past the DECIMAL(38) " +
          "envelope - run on a stratified sample') AS BIGINT) " +
          "ELSE n_raw END"))
      .withColumn("h_ppm",
        expr("CAST(hsum DIV (CAST(n AS DECIMAL(38,0)) * (n + 1)) AS BIGINT)"))
      .withColumn("n3n", expr("CAST(n AS DECIMAL(38,0)) * n * n - n"))
      .withColumn("h_tie_ppm",
        expr("CASE WHEN n3n - sum_t > 0 THEN " +
          "CAST(CAST(h_ppm AS DECIMAL(38,0)) * n3n DIV (n3n - sum_t) " +
          "AS BIGINT) ELSE NULL END"))
      .withColumn("significant",
        when(col("h_tie_ppm") > chi2CritPpm, 1).otherwise(0).cast("int"))
      .select(col("n"), col("k_groups"), col("h_ppm"), col("h_tie_ppm"),
        col("significant"))
  }

  /** Brier score with the Murphy decomposition, per segment — the PROPER
    * scoring rule for the historical-rate predictor: train-period class
    * rates become the ppm-floored prediction p̂ (a DOCUMENTED
    * quantization: both engines floor to the same grid), test-period
    * outcomes score it. Because p̂ is constant within a segment the
    * decomposition is exact per segment:
    * mean(p̂−y)² = (p̂−ȳ)² + ȳ(1−ȳ) — reliability (calibration error,
    * want 0) plus uncertainty (irreducible class noise) — and every term
    * is one truncating DIV on DECIMAL(38) integers:
    * brier_ppm = ((p̂·m − 1e6·b)² + 1e12·b(m−b)) DIV (1e6·m²).
    * Segments absent from the train period carry no prediction and are
    * dropped (inner join — the honest contract: scoring an unseen
    * segment is a different policy decision).
    *
    * 100 TB posture: two combinable segment rollups (train, test) and a
    * broadcast join over |segments| rows; the corpus never shuffles
    * anything wider than (segment, int). DECIMAL(38) envelope:
    * (p̂·m)² ≈ 1e12·m² ≤ 1e38 → m ≤ 10¹³ test rows per segment.
    * Output: (seg, n_train, x_train, p_ppm, m_test, x_test, ybar_ppm,
    * rel_ppm, unc_ppm, brier_ppm). */
  def brierDecomposition(df: DataFrame, segment: Column, label: Column,
      isTrain: Column): DataFrame = {
    val base = df.select(segment.cast("string").as("seg"),
      label.cast("long").as("y"), isTrain.cast("boolean").as("tr"))
    val train = base.where(col("tr"))
      .groupBy("seg").agg(count(lit(1)).as("n_train"),
        sum(col("y")).as("x_train"))
      .withColumn("p_ppm",
        expr("CAST(CAST(x_train AS DECIMAL(38,0)) * 1000000 DIV n_train " +
          "AS BIGINT)"))
    val test = base.where(!col("tr"))
      .groupBy("seg").agg(count(lit(1)).as("m_test"),
        sum(col("y")).as("x_test"))
    test.join(broadcast(train), Seq("seg"))
      .withColumn("dev",
        expr("CAST(p_ppm AS DECIMAL(38,0)) * m_test - " +
          "CAST(x_test AS DECIMAL(38,0)) * 1000000"))
      .withColumn("m2e6",
        expr("CAST(m_test AS DECIMAL(38,0)) * m_test * 1000000"))
      .select(col("seg"), col("n_train"), col("x_train"), col("p_ppm"),
        col("m_test"), col("x_test"),
        expr("CAST(CAST(x_test AS DECIMAL(38,0)) * 1000000 DIV m_test " +
          "AS BIGINT)").as("ybar_ppm"),
        expr("CAST(dev * dev DIV m2e6 AS BIGINT)").as("rel_ppm"),
        expr("CAST(CAST(x_test AS DECIMAL(38,0)) * (m_test - x_test) " +
          "* 1000000 DIV (CAST(m_test AS DECIMAL(38,0)) * m_test) " +
          "AS BIGINT)").as("unc_ppm"),
        expr("CAST((dev * dev + CAST(x_test AS DECIMAL(38,0)) " +
          "* (m_test - x_test) * 1000000000000) DIV m2e6 AS BIGINT)")
          .as("brier_ppm"))
  }

  /** Cochran–Armitage trend test: does a binary outcome rate move
    * MONOTONICALLY with an ordered factor? [[chi2Assoc]] would spend
    * k−1 degrees of freedom ignoring the order; CA packs the question
    * into one df via integer scores w (0..k−1 in factor order):
    *
    *   D = N·Σwx − X·Σwn,   V = N·Σw²n − (Σwn)²,
    *   z²_ppm = (⌊D²/V⌋·N·1e6) DIV (X(N−X))
    *
    * — the Pearson χ² on a 2×2 when the scores are 0/1 (the spec pins
    * that identity). The two-stage floor (D²/V first — its quotient is
    * bounded by 4N², the tight order) is the DOCUMENTED grid, identical
    * in both engines. `trend` = sign(D) when z² clears χ²₁ @ 95%.
    * Degenerate inputs (all-positive, all-negative, or a single score
    * value → V=0) read NULL. Runtime envelope: N < 1e8 via the loud
    * raise_error guard on the output column ([[kruskalWallis]]'s
    * contract — a trend test at the design point runs on a sample);
    * scores are required ≤ 32 at plan build.
    *
    * 100 TB posture: ONE combinable per-score rollup (k cells), then
    * single-row algebra. Output: one row
    * (n, x_pos, k_scores, d_stat, z2_ppm, trend, significant). */
  def cochranArmitage(df: DataFrame, score: Column, outcome: Column,
      maxScore: Int = 32): DataFrame = {
    require(maxScore >= 1 && maxScore <= 32, s"maxScore=$maxScore out of range")
    val per = df.select(score.cast("long").as("w"),
        outcome.cast("long").as("y"))
      .withColumn("w",
        expr(s"CASE WHEN w < 0 OR w > $maxScore THEN " +
          s"CAST(raise_error('cochranArmitage: score outside [0, $maxScore]') " +
          "AS BIGINT) ELSE w END"))
      .groupBy("w").agg(count(lit(1)).as("n_w"), sum(col("y")).as("x_w"))
    per.agg(count(lit(1)).as("k_scores"), sum(col("n_w")).as("n_raw"),
        sum(col("x_w")).as("x_pos"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * x_w")).as("swx"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * n_w")).as("swn"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * w * n_w")).as("sw2n"))
      .withColumn("n",
        expr("CASE WHEN n_raw >= 100000000 THEN " +
          "CAST(raise_error('cochranArmitage: N past the DECIMAL(38) " +
          "envelope - run on a stratified sample') AS BIGINT) " +
          "ELSE n_raw END"))
      .withColumn("d", expr("CAST(n AS DECIMAL(38,0)) * swx - x_pos * swn"))
      .withColumn("v", expr("CAST(n AS DECIMAL(38,0)) * sw2n - swn * swn"))
      .withColumn("z2_ppm",
        expr("CASE WHEN v > 0 AND x_pos > 0 AND x_pos < n THEN " +
          "CAST(CAST((d * d - d * d % v) / v AS DECIMAL(38,0)) " +
          "* n * 1000000 DIV (CAST(x_pos AS DECIMAL(38,0)) * (n - x_pos)) " +
          "AS BIGINT) ELSE NULL END"))
      .withColumn("trend",
        when(col("z2_ppm") > 3841459L,
          signum(col("d")).cast("int")).otherwise(0).cast("int"))
      .select(col("n"), col("x_pos"), col("k_scores"),
        col("d").cast("string").as("d_stat"), col("z2_ppm"), col("trend"),
        when(col("z2_ppm") > 3841459L, 1).otherwise(0).cast("int")
          .as("significant"))
  }
}
