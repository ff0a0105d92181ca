package graft

import org.apache.spark.sql.execution.{ExplainMode, FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.functions.{col, count, lit, pmod, udf, when}

/** Programmatic versions of PLANS.md's claims: the scale posture is
  * asserted, not narrated. Counts are pinned against Spark 4.1.2's
  * planner output; a regression that adds a shuffle, loses a pushed
  * filter, or widens a read schema fails here before any bench notices.
  */
class PlanAuditSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Simple plan string: every node appears once, with inline args. */
  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  private def formattedOf(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def shuffles(p: String): Int =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(p).length
  private def broadcasts(p: String): Int =
    "BroadcastExchange".r.findAllIn(p).length

  test("q1: both predicates pushed into the parquet scan; 4-column ReadSchema") {
    val p = formattedOf("q1_catalog_scan")
    assert(p.contains("GreaterThanOrEqual(o_custkey,500)"), p)
    assert(p.contains("Not(EqualTo(o_orderstatus,F))"), p)
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(read.split(",").length === 4, read)  // of the table's 6 columns
  }

  test("q12: dim broadcasts, fact never shuffles pre-join; 2 shuffles total") {
    val p = planOf("q12_revenue_join")
    assert(broadcasts(p) === 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(shuffles(p) === 2, p)  // final agg + output sort; the join adds none
  }

  test("x27: sampling is a scan-side filter — the only shuffle is the output sort") {
    val p = planOf("x27_stratified_sample")
    assert(shuffles(p) === 1, p)
    assert(broadcasts(p) === 0, p)
  }

  test("x24: custom as-of = 2 pinned co-partition shuffles + output sort, no window") {
    val p = planOf("x24_asof_custom")
    assert(p.contains("AsofJoin"), p)
    assert(shuffles(p) === 3, p)
    assert(!p.contains("Window"), p)
  }

  test("x9: queries broadcast, corpus streams (no corpus-side shuffle before scoring)") {
    val p = planOf("x9_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(broadcasts(p) === 1, p)
  }

  test("x34: global top-n plans as TakeOrderedAndProject — no global sort") {
    val p = planOf("x34_global_topn")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(shuffles(p) === 0, p)  // per-partition top-n, merged once
  }

  test("x37: packing's cumsum is _pid-local two-phase — no bare-shard window (r15 sweep find)") {
    val df = SparkEntry.queries("x37_seq_packing")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    // round 18: the two-phase running sum is a partition-local
    // MapPartitions scan over the pinned sort — no window at all; any
    // RESIDUAL window must still be _pid-local, never the bare stratum
    assert(specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x46: rank family is _pid-local two-phase — no bare-event_type window (r15 sweep find)") {
    val df = SparkEntry.queries("x46_rank_family")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    // round 18: the two-phase running sum is a partition-local
    // MapPartitions scan over the pinned sort — no window at all; any
    // RESIDUAL window must still be _pid-local, never the bare stratum
    assert(specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x38: benchmark shingle set broadcasts into both semi and anti joins") {
    // the dim-sized sides are aggregates, so their size is only known at
    // runtime — AQE picks the broadcast; assert the FINAL adaptive plan
    val df = SparkEntry.queries("x38_decontaminate")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(p).isDefined, p)
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p).isDefined, p)
  }

  test("x40: sessionize = ONE key shuffle shared by windows and the session agg, plus output sort") {
    val p = planOf("x40_sessionize")
    // hash(user_id) exchange for the windows; the groupBy(key, seq) agg
    // reuses it (partial agg keys are a superset); rangepartitioning for
    // the final ORDER BY
    assert(shuffles(p) === 2, p)
    assert("Window ".r.findAllIn(p).length <= 2, p)
  }

  test("x41: tfidf joins df on term without re-shuffling tf's agg output; corpus size broadcasts") {
    val p = planOf("x41_tfidf")
    assert(broadcasts(p) >= 1, p)  // the single-row n_docs side
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  /** Every node of an executed plan, traversing through the wrappers that
    * hide their real subtree from `TreeNode.children`: AdaptiveSparkPlanExec
    * and QueryStageExec are leaf nodes whose subtree hangs off a field, so a
    * plain `collect` (or any string search over `toString`, which also echoes
    * a full `== Initial Plan ==` copy under AQE) cannot audit them reliably. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
    case q: QueryStageExec        => q +: nodes(q.plan)
    case r: ReusedExchangeExec    => r +: nodes(r.child)
    case other => other +: other.children.flatMap(nodes)
  }

  /** True iff some Filter calling a Scala UDF is scan-side: a parquet scan
    * below it with no shuffle anywhere on the subtree. BroadcastExchange is
    * deliberately NOT a ShuffleExchangeLike — a broadcast below the filter
    * would not move the filtered rows and must not trip this. */
  private def udfFilterIsScanSide(plan: SparkPlan): Boolean =
    nodes(plan).exists {
      case f: FilterExec if f.condition.toString.contains("UDF") =>
        val below = nodes(f).drop(1)
        below.exists(_.isInstanceOf[FileSourceScanExec]) &&
          !below.exists(_.isInstanceOf[ShuffleExchangeLike])
      case _ => false
    }

  test("x43: bloom prefilter sits scan-side, BEFORE any exchange") {
    val df = SparkEntry.queries("x43_bloom_decontaminate")(spark, dir)
    df.collect()
    assert(udfFilterIsScanSide(df.queryExecution.executedPlan),
      df.queryExecution.executedPlan.toString)
  }

  test("x43 guard self-test: a UDF filter hoisted above a shuffle IS caught") {
    // a UDF on an aggregate output cannot be pushed below the agg's
    // shuffle — exactly the regressed shape the x43 assertion must reject
    val mod2 = udf((x: Long) => x % 2 == 0)
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_custkey")).agg(count("*").as("c"))
      .where(mod2(col("c")))
    df.collect()
    assert(!udfFilterIsScanSide(df.queryExecution.executedPlan),
      df.queryExecution.executedPlan.toString)
  }

  test("x45: pivot keeps map-side combine at BOTH levels (count and pivotfirst)") {
    val p = planOf("x45_event_pivot")
    assert(shuffles(p) === 3, p)  // (day,type) count + day pivot + output sort
    assert(p.contains("partial_pivotfirst"), p)  // pivot itself combines map-side
  }

  test("x48: two-phase stratum rank — NO window partitions on the bare stratum") {
    val p = planOf("x48_take_per_stratum")
    // every rank window is (_pid, stratum-shadow)-local: parallelism is
    // the cluster's partition count, never the stratum cardinality
    val wlines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    // round 18: the rank is a partition-local MapPartitions scan over
    // the pinned sort — zero windows, zero rank-side exchanges; any
    // residual window would have to be _pid-local
    wlines.foreach(l => assert(l.contains("_pid"), l))
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("Exchange hashpartitioning(lang"), p)
    // plan reads from the pinned one-sort checkpoint; offsets broadcast
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(shuffles(p) === 1, p) // output sort only (window co-key exchange gone, round 18)
  }

  test("x50: class centroids broadcast; worst-k rank is _pid-local two-phase") {
    val df = SparkEntry.queries("x50_class_outliers")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    // labels are class-count cardinality: the rank must not window on
    // the bare label (round 14)
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    // round 18: two-phase rank = partition-local MapPartitions scan;
    // residual windows (if any) must be _pid-local, never bare-stratum
    assert(specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("MapPartitions"), p)
  }

  test("x52: funnel = ONE fact scan, ONE user-key shuffle shared by all three stages") {
    val p = planOf("x52_funnel")
    assert(shuffles(p) === 2, p)  // hash(user) + output sort
    assert("Scan parquet".r.findAllIn(p).length === 1, p)
  }

  test("x55: NOT IN plans as the null-aware anti join (a plain anti would keep NULL probes)") {
    val p = planOf("x55_null_aware_anti")
    // the BHJ node's trailing boolean is isNullAwareAntiJoin
    assert("BroadcastHashJoin .*LeftAnti, BuildRight, true".r.findFirstIn(p).isDefined, p)
  }

  test("x56: one shingle-hash shuffle, keeper set broadcasts, 2 scans, no extra window") {
    val p = planOf("x56_substring_dedup")
    // hashpartitioning(h) for the first-occurrence agg +
    // hashpartitioning(doc_id) for the islands window + output sort;
    // the (h, keeper) set is small after the n_occ>=2 filter and must
    // BROADCAST back onto the occurrence stream, not shuffle it
    assert(shuffles(p) === 3, p)
    assert(broadcasts(p) === 1, p)
    assert("Scan parquet".r.findAllIn(p).length === 2, p)
    assert("Window ".r.findAllIn(p).length === 1, p)
  }

  test("x57: the cluster assignment is computed ONCE (checkpointed), not per consumer") {
    // semanticDedupWithin feeds the assignment to three consumers; an
    // un-materialized assignment re-derives the corpus×centroid
    // crossjoin + argmax in EACH (3× the most expensive stage — the
    // regression this pins). After the checkpoint the final plan must
    // contain zero crossjoins: only the checkpoint scans, the two
    // vector re-joins, the cid-cid pair join, and the keep-min agg.
    val p = planOf("x57_semantic_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // r17 FAST PATH (the audit corpus has no duplicate vectors, so the
    // memoized existence probe skips the collapse): the checkpointed
    // frames are the assignment (final left join) and the rep-level
    // pair verdict — the famMap checkpoint and the expansion arm's
    // join+union are FOLDED OUT of the plan entirely
    // (PropagateEmptyRelation on the literal-empty members frame);
    // the slow-path census lives in the dup-corpus pin below
    assert("Scan ExistingRDD".r.findAllIn(p).length === 2, p)
    // final left join both sides on vec_id + the keep-min agg + output
    // sort — all two-long rows; the corpus-sized embedding stream
    // still never shuffles (embs re-joins broadcast; the cid-pair join
    // is checkpoint-hidden and evaluated once)
    assert(shuffles(p) <= 6, p)
    assert(!"Exchange [^\\n]*emb".r.findFirstIn(p).isDefined, p)
  }

  test("x57 slow path: a duplicate-vector corpus engages the collapse; the expansion arms are real") {
    // the same operator on a corpus WITH identical vectors must take
    // the exact slow path: famMap + twice-referenced rep-verdict
    // checkpoints (the r16 census), and still zero nested-loop joins
    import spark.implicits._
    val embs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)),
      (4L, Seq(0.0, 1.0)), (5L, Seq(0.6, 0.8))
    ).toDF("vec_id", "emb")
      .withColumn("norm", org.apache.spark.sql.functions.sqrt(
        org.apache.spark.sql.functions.aggregate(col("emb"),
          lit(0.0), (a, x) => a + x * x)))
    val assign = embs.select(col("vec_id"), lit(0L).as("cid"))
    val out = graft.ext.Similarity.semanticDedupWithin(embs, assign, 0.95)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // assignment + famMap + rep-verdict referenced twice = 4
    assert("Scan ExistingRDD".r.findAllIn(p).length === 4, p)
    // and the verdicts themselves: 1,2,3 are an identical family
    val rows = out.orderBy("vec_id").collect()
    assert(rows.map(r => Option(r.get(2)).map(_.toString).orNull).toSeq ===
      Seq(null, "1", "1", null, null))
  }

  test("x58: canonical election is a combinable agg + join, never a fingerprint window") {
    // a window over nfp would buffer a viral doc's entire copy-group in
    // one task; the agg combines map-side and the join's hot bucket
    // streams. Text must not survive past the scan projection either —
    // the exchanges carry slim columns only.
    val p = planOf("x58_curation_pipeline")
    assert(!p.contains("Window"), p)
    // the keeper agg's map-side-combined output broadcasts back onto the
    // un-shuffled doc stream: total exchanges = the agg's nfp shuffle
    // (slim partials) + the output sort. The doc stream itself never
    // moves at this size; at corpus scale AQE falls back to a shuffle
    // join whose hot bucket streams (and skew-splits) instead of
    // buffering like a window would.
    assert(shuffles(p) === 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!"Exchange [^\\n]*text".r.findFirstIn(p).isDefined, p)
  }

  test("x59: the corpus never shuffles — token counts are scan-side, rates broadcast back") {
    // the docs' zero-shuffle claim for the corpus: n_tokens is computed
    // in the scan projection, only the per-source partial agg (a handful
    // of slim rows after map-side combine) crosses an exchange, and the
    // derived rates come back to the corpus via BROADCAST. The only
    // corpus-sized exchange is the oracle-parity output sort, and no
    // exchange may carry `text`.
    val p = planOf("x59_token_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(shuffles(p) === 2, p)  // per-source agg partials + output sort
    assert(!"Exchange [^\\n]*text".r.findFirstIn(p).isDefined, p)
  }

  test("x60: the ADC join carries codes only — full vectors never cross a shuffle") {
    // IVF bounds the candidates, PQ bounds bytes per candidate: every
    // shuffled row is (ids, codes, partial sims). The exact re-rank
    // touches full vectors for rerank*k rows per query via broadcast
    // joins against the streaming corpus — so no ShuffleExchange row may
    // contain the embedding column.
    val p = planOf("x60_knn_ivf_pq")
    assert(!"Exchange (hashpartitioning|rangepartitioning|SinglePartition)[^\\n]*emb#"
      .r.findFirstIn(p).isDefined, p)
    assert(broadcasts(p) >= 1, p)
  }

  test("x62: multi-probe assignment computed ONCE; no crossjoin survives the checkpoint") {
    // same materialization contract as x57's pin: the top-2 assignment
    // feeds three consumers (both exploded pair sides + the final left
    // join), and without the checkpoint each would re-run the
    // corpus×centroid aggregation. After it, the executed plan must
    // contain zero nested-loop joins — only checkpoint scans.
    val p = planOf("x62_semantic_dedup_mp")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // r17 fast path (no duplicate vectors in the audit corpus — see
    // x57's pin): assignment + rep-verdict checkpoints only; the
    // collapse machinery folds out of the plan
    assert("Scan ExistingRDD".r.findAllIn(p).length === 2, p)
    // the post-collapse slim exchanges + the primary/runner-up cell
    // left join on vec_id; nothing corpus×centroid shuffles
    assert(shuffles(p) <= 8, p)
    assert(!"Exchange [^\\n]*emb".r.findFirstIn(p).isDefined, p)
  }

  test("x61: quantization is pure scan-side codegen — zero exchanges of any kind") {
    // the operator itself (per-row lambdas over the embedding array)
    // must plan as a single projection over the scan; the registered
    // query only adds the oracle-parity output sort
    val embs = graft.ext.Similarity.withNorm(
      Tables.embeddings(spark, dir), col("vec_id"), col("embedding"))
    val p = graft.ext.Similarity.quantizeInt8(embs)
      .queryExecution.executedPlan.toString
    assert(shuffles(p) === 0, p)
    assert(broadcasts(p) === 0, p)
    val q = planOf("x61_quantize_int8")
    assert(shuffles(q) === 1, q)  // output sort only
    assert(broadcasts(q) === 0, q)
  }

  test("x63: scale-invariant stride costs ZERO plan overhead vs constant-stride x21") {
    // strideForCells runs ONE count() job at plan build; the query plan
    // itself must be shape-identical to x21's (same shuffles, same
    // broadcasts, same windows) — the scale invariance lives entirely in
    // the centroid seeding, not in extra runtime stages
    val p21 = planOf("x21_knn_ivf")
    val p63 = planOf("x63_knn_ivf_scaled")
    assert(shuffles(p63) === shuffles(p21), p63)
    assert(broadcasts(p63) === broadcasts(p21), p63)
    assert("Window ".r.findAllIn(p63).length ===
      "Window ".r.findAllIn(p21).length, p63)
  }

  test("x64: pagerank iterations reference checkpoints; the attrs crossjoin never re-runs") {
    // 7 ExistingRDD scans = the edge checkpoint consumed once per
    // iteration (3) + the node-attrs checkpoint in r0 and in each
    // iteration's blend join (4). The attrs build contains the only
    // crossJoin (broadcast single-row N) — it must be BEHIND the
    // checkpoint, so the executed plan has no nested-loop join and
    // re-derives neither the edge build nor N per iteration.
    val p = planOf("x64_pagerank")
    assert("Scan ExistingRDD".r.findAllIn(p).length === 7, p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // 3 iterations x (contrib join pair + inbound agg) + blend joins
    // reusing the agg partitioning + the output sort
    assert(shuffles(p) === 11, p)
  }

  test("x65: HLL register exchange is fixed-width — no exchange carries raw text") {
    // shingle strings reach the register mapping scan-side; what crosses
    // for the sketch is (key, bucket, rho). The exact-distinct baseline
    // inside the op does shuffle the 8-byte el hash — but never `text`.
    val p = planOf("x65_hll_distinct")
    assert(!"Exchange [^\\n]*text".r.findFirstIn(p).isDefined, p)
    assert(shuffles(p) === 5, p)
  }

  test("x66: boilerplate join-back is on the 8-byte hash; interval-union windows share one exchange") {
    // the running-max + cumulative-sum windows stack on the SAME per-doc
    // partitioning (one exchange feeds both); the per-position explode +
    // distinct form this replaced cost a 5th, corpus-sized exchange
    val p = planOf("x66_boilerplate")
    assert(!"Exchange [^\\n]*text".r.findFirstIn(p).isDefined, p)
    assert("Window ".r.findAllIn(p).length === 2, p)
    assert(shuffles(p) === 4, p)
  }

  test("x67: bm25 top-k plans as TakeOrderedAndProject; corpus stats broadcast back") {
    val p = planOf("x67_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // the single-row stats side
    assert(!"Exchange [^\\n]*text".r.findFirstIn(p).isDefined, p)
    // rank is read off the TakeOrderedAndProject row position — NO
    // WindowExec anywhere, so no "No Partition Defined" WARN can flood
    // the driver-captured bench stdout tail
    assert(!p.contains("Window"), p)
  }

  test("x69: random projection is one scan-side transform — only the output sort shuffles") {
    val p = planOf("x69_random_projection")
    assert(shuffles(p) === 1, p)
    assert(broadcasts(p) === 0, p)
    assert(!p.contains("Window"), p)
  }

  test("x71/x72/x73: text never crosses an exchange; stats broadcast back") {
    // novelty: combinable min + 8-byte-hash join-back (x56's shape);
    // temperature mix: per-source agg + broadcast single-row normalizer;
    // triangles: id-only hash joins over the edge checkpoint
    val p71 = planOf("x71_novelty")
    assert(!"Exchange [^\\n]*text".r.findFirstIn(p71).isDefined, p71)
    assert(shuffles(p71) === 3, p71)
    val p72 = planOf("x72_temperature_mix")
    assert(!"Exchange [^\\n]*text".r.findFirstIn(p72).isDefined, p72)
    assert(p72.contains("BroadcastNestedLoopJoin"), p72) // single-row wsum
    val p73 = planOf("x73_triangles")
    assert(!"Exchange [^\\n]*text".r.findFirstIn(p73).isDefined, p73)
    assert(!p73.contains("CartesianProduct"), p73)
  }

  test("x74: interval overlap is an equi-join on (key, bin) — no nested loop, bounded shuffles") {
    // the binning exists precisely so Spark does NOT plan the time
    // predicates as a nested-loop/cartesian residual; at most the two
    // join-input exchanges plus the presentation orderBy
    val p = planOf("x74_interval_overlap")
    assert(!p.contains("NestedLoop"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(shuffles(p) <= 3, p)
  }

  test("x79: corpus is shingled once (checkpoint scan); only 8-byte fp rows shuffle") {
    // winnowing selection is scan-side; the slim (doc_id, fp) checkpoint
    // feeds the df-cap agg and both self-join sides, so the md5-per-
    // shingle work never re-runs. Shuffles: 2× df-cap agg + pair agg +
    // output sort; text appears in NO exchange.
    val p = planOf("x79_winnow_pairs")
    assert(!"Exchange [^\\n]*text".r.findFirstIn(p).isDefined, p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(shuffles(p) === 4, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x80: split = one rep agg + join-back + output sort; text never crosses an exchange") {
    // the split decision is scan-side integer arithmetic on the
    // representative's hash; only the 32-char group fingerprint and ids
    // shuffle (rep agg), the join-back broadcasts under AQE
    val p = planOf("x80_leakage_split")
    assert(!"Exchange [^\\n]*text".r.findFirstIn(p).isDefined, p)
    assert(shuffles(p) === 2, p)
    assert(!p.contains("Window"), p)
  }

  test("x81: per-doc pairs materialize once; only count aggs and the doc mean shuffle") {
    // the checkpointed (doc_id, w1, w2, n_occ) table feeds BOTH the
    // corpus pair counts and the join-back (2 ExistingRDD scans), so
    // tokenizing/pair-generation never re-runs; shuffles: pair-count
    // agg + unigram agg + per-doc mean agg + output sort. Count joins
    // broadcast at this size (shuffled-hash on (w1,w2)/(w1) at scale —
    // count side has one row per key, no multiplicity blow-up).
    val p = planOf("x81_bigram_lm_score")
    assert("Scan ExistingRDD".r.findAllIn(p).length === 2, p)
    assert(shuffles(p) === 4, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x84: exact ground truth materializes once; crossJoins are broadcast-centroid only") {
    // the checkpointed brute top-k feeds BOTH the hit join and the
    // per-query spine (2 ExistingRDD scans — the |queries|·N scan runs
    // once); the only nested-loop joins are the two corpus×broadcast-
    // centroid similarity evaluations inside ivfSearch (assignment +
    // query probing), never a member×member pair join
    val p = planOf("x84_ann_recall")
    assert("Scan ExistingRDD".r.findAllIn(p).length === 2, p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length === 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(shuffles(p) === 8, p)
  }

  test("x85: medoids run pair-join-free — the checkpointed members feed three linear passes") {
    // n·||x||² − 2·x·S + Σ||y||² replaces the within-cell pair join:
    // the plan has NO join of members against members (no nested-loop
    // join at all — the assignment crossJoin sits behind the members
    // checkpoint), no window, and exactly the component-sum agg (2),
    // stats agg (1), final argmin agg (1) + output sort exchanges
    val p = planOf("x85_cluster_medoids")
    assert("Scan ExistingRDD".r.findAllIn(p).length === 3, p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(shuffles(p) === 5, p)
  }

  test("x86: the final peel round plans over checkpointed edges — no stacked join trees") {
    // each peel round checkpoints, so the visible plan is ONE edge
    // checkpoint scan + the final degree agg + the output sort; no
    // window, no nested-loop join, (long, long) rows only
    val p = planOf("x86_kcore")
    assert("Scan ExistingRDD".r.findAllIn(p).length === 1, p)
    assert(shuffles(p) === 2, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x87: the hashed feature table joins back as a BROADCAST at any corpus size") {
    // the checkpointed (doc_id, in_t, h, n_occ) table feeds the feature
    // agg and the join-back (2 ExistingRDD scans); the ratio side is
    // capped at `buckets` rows so the join is a BroadcastHashJoin BY
    // CONSTRUCTION, and the only exchanges are feature agg + doc agg +
    // output sort
    val p = planOf("x87_dsir_affinity")
    assert("Scan ExistingRDD".r.findAllIn(p).length === 2, p)
    assert("BroadcastExchange".r.findAllIn(p).length === 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(shuffles(p) === 3, p)
    assert(!p.contains("Window"), p)
  }

  test("AQE skew-join splits a hot key's partition at runtime (when Salting is NOT needed)") {
    // This pins the division of labor with ops/Salting.saltedJoin:
    //   - a skewed SHUFFLE JOIN is AQE's job — the runtime splits the hot
    //     partition into advisory-sized chunks and replicates the matching
    //     build rows, no code change (this test proves it engages);
    //   - Salting stays necessary where AQE skew handling cannot reach:
    //     skewed AGGREGATIONS (no skew-split for partial/final aggs over a
    //     hot group) and joins whose exchange is reused by another stage
    //     (AQE refuses to split a partition feeding two consumers).
    // Thresholds are lowered so a test-sized hot key (100k rows on one
    // key vs ~500 on each other) crosses the same bars a 100 TB hot key
    // crosses in production — factor-over-median AND absolute bytes.
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val left = spark.range(0, 120000).select(
        when(col("id") < 100000, 1L).otherwise(pmod(col("id"), lit(37)) + 2).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 200).select(
        pmod(col("id"), lit(40)).as("k"), (col("id") * 7).as("w"))
      val joined = left.join(right, "k")
      // collect() (not count()) so the inspected QueryExecution is the
      // one that actually ran and finalized its adaptive plan
      val n = joined.collect().length
      assert(n > 100000, s"fixture sanity: hot key must dominate, got $n rows")
      val skewed = nodes(joined.queryExecution.executedPlan).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec if j.isSkewJoin => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec if j.isSkewJoin => j
      }
      assert(skewed.nonEmpty,
        "AQE skew-join did not engage:\n" + joined.queryExecution.executedPlan.toString)
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
  test("x91: prefix join is all hash joins — no cartesian, only the per-doc rank window") {
    val p = planOf("x91_prefix_jaccard")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the prefix rank window materializes once per self-join side (2);
    // every windowspecdefinition must be doc_id-partitioned — an
    // unpartitioned one means the prefix rank regressed to a global sort
    val wins = "windowspecdefinition\\(([^,]*)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(wins.length === 2 && wins.forall(_.startsWith("doc_id")), s"$wins\n$p")
  }

  test("x92: SNM rank windows are _pid-partitioned; offsets broadcast; no cartesian") {
    val p = planOf("x92_sorted_neighborhood")
    assert(!p.contains("CartesianProduct"), p)
    val wins = "windowspecdefinition\\(([^,]*)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(wins.nonEmpty && wins.forall(_.startsWith("_pid")), s"$wins\n$p")
    assert(broadcasts(p) >= 1, p) // the per-partition offset table
  }

  test("x93: pareto sweep windows are _pid-partitioned; corner set broadcasts back") {
    val p = planOf("x93_pareto_frontier")
    val wins = "windowspecdefinition\\(([^,]*)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(wins.nonEmpty && wins.forall(_.startsWith("_pid")), s"$wins\n$p")
    assert(broadcasts(p) >= 2, p) // prefix-max table + frontier corners
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x95: vocab cut is TakeOrderedAndProject and the vocab side broadcasts") {
    val p = planOf("x95_oov_rate")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(broadcasts(p) === 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x96: bucket table broadcasts into the range join; one agg shuffle after") {
    val p = planOf("x96_dup_size_hist")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // 63-row range-predicate join
    assert(broadcasts(p) === 1, p)
  }
  test("x111: band blocking is an equi-join; the band guard is a count join (no window, no forced broadcast)") {
    val p = planOf("x111_edit_distance_pairs")
    assert(!p.contains("CartesianProduct"), p)
    // round 14: the hot-band guard is a combinable groupBy count
    // joined back — NO window at all (bands are length-shaped
    // low-cardinality; a count-over window funneled the candidate
    // set). Round 18: the guard exists but its join strategy is AQE's
    // choice — no pinned broadcast (see ScaleGuardSpec)
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("__n"), p)
  }

  test("x112/x113: grid-fill windows are user-partitioned; the grid join is the only wide join") {
    for (n <- Seq("x112_locf_grid", "x113_lerp_grid")) {
      val p = planOf(n)
      assert(!p.contains("CartesianProduct"), s"$n: $p")
      // every windowspecdefinition names the user_id partition key
      val specs = "windowspecdefinition\\(([^,]*)".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      assert(specs.nonEmpty && specs.forall(_.contains("user_id")), s"$n: $specs")
    }
  }

  test("x114: co-occurrence pairs generate scan-side — zero joins, TakeOrdered cut") {
    val p = planOf("x114_cooccur_topk")
    assert(!p.contains("Join"), p) // the oracle pays a position self-join; this plan must not
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(shuffles(p) === 1, p)   // the single count groupBy
  }

  test("x115: medians join back as broadcasts; histogram cumsum windows are stratum-partitioned") {
    val p = planOf("x115_robust_outliers")
    // round 18 histogram form: the visible tail is the MAD broadcast
    // join over the checkpointed deviation histogram (the med join
    // lives inside that checkpoint's lineage); the cs side-table is
    // gone — the count rides the cumsum's own window
    assert(broadcasts(p) >= 1, p)
    assert(p.contains("Scan ExistingRDD"), p) // the checkpointed histogram
    assert(!p.contains("CartesianProduct"), p)
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("stratum")), specs.toString)
  }

  test("x116: journey lags ride ONE hash(user) window exchange + one count groupBy") {
    val p = planOf("x116_journey_trigrams")
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("user_id")), specs.toString)
    assert(shuffles(p) === 3, p) // window exchange + partial/final agg + output sort
  }

  test("x117: fusion joins top-k lists only; the corpus-side scans broadcast the queries") {
    val p = planOf("x117_rrf_fusion")
    assert(!p.contains("CartesianProduct"), p)
    assert(broadcasts(p) >= 2, p) // the two knnBrute query sides
    assert(p.contains("FullOuter") || p.contains("full_outer") ||
      p.contains("FullOuterJoin") || p.contains(", FullOuter"), p)
  }

  test("x118: normalize is scan-side — one digest groupBy + output sort, no join") {
    val p = planOf("x118_normalized_dedup")
    assert(!p.contains("Join"), p)
    assert(shuffles(p) === 3, p) // partial/final agg exchange + distinct-variant expand + sort
  }

  test("x119: transition totals join back as a BROADCAST; lag window is user-partitioned") {
    val p = planOf("x119_transition_rates")
    assert(p.contains("BroadcastHashJoin"), p)
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("user_id")), specs.toString)
  }

  test("x120: k-anonymity is ONE combinable groupBy + sort — no window, no join") {
    val p = planOf("x120_k_anonymity")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(shuffles(p) === 2, p) // agg exchange + output sort
  }

  test("x121: gini rank rides a broadcast self-join on the 20-row aggregate — no global window") {
    val p = planOf("x121_token_gini")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // inequality rank join, tiny side
    assert(broadcasts(p) === 1, p)
  }

  test("x122: group top-k is a typed ObjectHashAggregate — no rank window anywhere") {
    val p = planOf("x122_group_topk")
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p) // the typed TopK aggregator
    assert(!p.contains("Join"), p)
  }

  test("x123: every funnel/median window is partitioned (user or cohort) — nothing global") {
    val p = planOf("x123_funnel_timing")
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    // cohort medians rank two-phase (_pid) since round 14
    assert(specs.nonEmpty &&
      specs.forall(s => s.contains("user_id") || s.contains("cohort") ||
        s.contains("_pid")), specs.toString)
  }

  test("x124/x125: saturation + rolling actives run window-free, no cartesian") {
    for (n <- Seq("x124_novelty_curve", "x125_rolling_actives")) {
      val p = planOf(n)
      assert(!p.contains("Window"), s"$n: $p")
      assert(!p.contains("CartesianProduct"), s"$n: $p")
    }
    // the 10-row cumulative self-join broadcasts
    assert(planOf("x124_novelty_curve").contains("BroadcastNestedLoopJoin"))
  }

  test("x127: the global rank is _pid-partitioned two-phase — no single-task window") {
    val p = planOf("x127_spend_deciles")
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("rangepartitioning"), p) // the range sort the offsets ride
  }

  test("x128: part dim broadcasts into the unit-price scan; rank windows are _pid-local") {
    val p = planOf("x128_price_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    // brand strata are low-cardinality: the MAD ranks run two-phase —
    // a bare-brand window would cap parallelism at ~25 brands
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    // round 18: two-phase rank = partition-local MapPartitions scan;
    // residual windows (if any) must be _pid-local, never bare-stratum
    assert(specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("MapPartitions"), p)
  }

  test("x129: pairs expand scan-side; supports broadcast back; no position self-join") {
    val p = planOf("x129_basket_pairs")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p) // sup_a, sup_b
    assert(!p.contains("SortMergeJoin"), p) // the oracle's pair join never appears
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.forall(_.contains("key")), specs.toString) // sessionize only
  }

  test("x130: rollup is ONE Expand pass over the fact; three dims broadcast") {
    val df = SparkEntry.queries("x130_rollup_revenue")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Expand"), p) // the rollup grouping-sets pass
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x131: attribution windows are user-partitioned; median is channel-partitioned") {
    val p = planOf("x131_attribution")
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    // the channel median ranks two-phase since round 14; round 18 the
    // two-phase running sum became a window-free MapPartitions scan, so
    // the median contributes NO window to the final plan — any window
    // still visible must be user-partitioned
    assert(specs.forall(s => s.contains("user_id") || s.contains("_pid")),
      specs.toString)
    assert(p.contains("MapPartitions"), p)
  }

  test("x132/x133: PIT and FD windows are entity-partitioned, never global") {
    for ((n, key) <- Seq("x132_pit_features" -> "user_id",
        "x133_fd_strength" -> "lhs")) {
      val specs = "windowspecdefinition\\(([^,]*)".r
        .findAllMatchIn(planOf(n)).map(_.group(1)).toSeq
      assert(specs.nonEmpty && specs.forall(_.contains(key)), s"$n: $specs")
    }
  }

  test("x134: every anti-join runs at key granularity — aggregate below the join") {
    val df = SparkEntry.queries("x134_ri_orphans")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // five edges, each LeftAnti; no plan may anti-join raw fact rows —
    // the child side under every anti join is the (key, count) aggregate.
    // Lower bound only: under suite-wide contention AQE can render a
    // replanned query stage so one join's string appears twice — the
    // invariant is that every edge IS an anti join, not the print count.
    assert("LeftAnti".r.findAllIn(p).length >= 5, p)
    assert(!p.contains("CartesianProduct"), p)
    // the singleton aggregate sides of the final assembly broadcast
    assert(broadcasts(p) >= 5, p)
  }

  test("x135: one fact scan, 9-row digit aggregate, broadcast expected table + total") {
    val df = SparkEntry.queries("x135_benford")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("WindowExec"), p) // no window anywhere
    // lineitem read once: the digit aggregate is checkpointed, so both
    // its consumers (report rows + total) read the 9-row RDD, not the fact
    assert("Scan parquet".r.findAllIn(p).length <= 1, p)
    assert("Scan ExistingRDD".r.findAllIn(p).length >= 2, p)
    assert(broadcasts(p) >= 2, p) // expected-ppm table and the total row
  }

  test("x136: seasonal baseline is two combinable groupBys — no window, no join") {
    val p = planOf("x136_seasonality")
    assert(!p.contains("WindowExec") && !p.contains("Join"), p)
    assert(shuffles(p) <= 3, p) // slot keys, baseline keys, output sort
  }

  test("x137: vocab stats shuffle on (stratum, token) then stratum — no window, no join") {
    val p = planOf("x137_vocab_stats")
    assert(!p.contains("WindowExec") && !p.contains("Join"), p)
    assert(shuffles(p) <= 3, p)
    assert(p.contains("Generate explode"), p) // tokens expand scan-side
  }

  test("x138: textrank plans over checkpointed edges; top-k is TakeOrdered; no cartesian") {
    val p = planOf("x138_textrank")
    assert(p.contains("Scan ExistingRDD"), p) // edges + attrs checkpointed once
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("WindowExec"), p)
  }

  test("x139: every window is user- or day-partitioned — never global") {
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(planOf("x139_window_funnel")).map(_.group(1)).toSeq
    // the per-day span median ranks two-phase (_pid) since round 14
    assert(specs.nonEmpty &&
      specs.forall(s => s.contains("user_id") || s.contains("_pid")), specs.toString)
  }

  test("x140: centroid pair matrix joins only checkpointed slice rows, broadcast") {
    val p = planOf("x140_centroid_drift")
    assert(p.contains("Scan ExistingRDD"), p)  // |slices|-row table checkpointed
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("WindowExec"), p)
  }

  test("x141: block guard is a count JOIN (no window, no forced broadcast); top-k is TakeOrdered; no distinct/checkpoint") {
    val p = planOf("x141_record_linkage")
    // round 14: the block-size guard aggregates then joins back — the
    // probe set never sorts for the guard. Round 18: the guard EXISTS
    // (the __n cap filter) but its join strategy is AQE's choice — the
    // counts table has block cardinality, unbounded at 100 TB, so the
    // plan must not PIN a broadcast (ScaleGuardSpec proves the
    // shuffle-degradation path returns identical rows)
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("__n"), p) // the guard's cap filter is present
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    // round 18: dedup is by origin-band construction — the pair stream
    // must carry NO distinct aggregate and NO checkpointed scan
    assert(!p.contains("Scan ExistingRDD"), p)
  }

  test("x142: cube is ONE Expand pass; customer dim broadcast") {
    val df = SparkEntry.queries("x142_cube_revenue")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(p).length >= 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x106: four dims broadcast; lineitem joins orders as the ONLY shuffled join") {
    // the Q5 shape: AQE sizes the dim sides at runtime — assert the
    // FINAL adaptive plan like the x38 pin does
    val df = SparkEntry.queries("x106_regional_revenue")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p) // cust/supp/nation/region
    assert(!p.contains("CartesianProduct"), p)
    val pushed = "PushedFilters: \\[([^\\]]*)".r.findAllMatchIn(p).mkString
    assert(p.contains("o_orderdate"), p) // date filter reaches the orders scan side
  }

  test("x143: one wide-row aggregate + stack — no joins, 4-column ReadSchema") {
    val p = planOf("x143_cov_matrix")
    assert(!p.contains("Join"), p)
    assert(!p.contains("WindowExec"), p)
    // partial agg + single-partition final + output sort
    assert(shuffles(p) <= 2, p)
    val f = formattedOf("x143_cov_matrix")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(f).get.group(1)
    assert(read.split(",").length === 4, read)
  }

  test("x144: zone map = one block groupBy folding to a single row; 2-column scan") {
    val p = planOf("x144_zone_prune")
    assert(!p.contains("Join"), p)
    assert(!p.contains("WindowExec"), p)
    val f = formattedOf("x144_zone_prune")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(f).get.group(1)
    assert(read.split(",").length === 2, read)
  }

  test("x145: join stats run at KEY cardinality — aggregates sit below every join") {
    val df = SparkEntry.queries("x145_join_card")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the histogram merge is a key-level join; singleton totals broadcast
    assert(broadcasts(p) >= 6, p) // per edge: two totals + matched row
    assert(!p.contains("WindowExec"), p)
  }

  test("x146: feature hashing is scan-side explode + two combinable groupBys") {
    val p = planOf("x146_feature_hash")
    assert(!p.contains("Join"), p)
    assert(!p.contains("WindowExec"), p)
    assert(p.contains("poly_hash"), p) // the native expression, not a UDF
    assert(!p.toLowerCase.contains("batchevalpython"), p)
  }

  test("x147: survival = ONE user-key exchange; thresholds fan out over sessions only") {
    val df = SparkEntry.queries("x147_survival")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // sessionize's windows and the session agg share one user hash exchange
    val userExchanges = "Exchange hashpartitioning\\(user".r.findAllIn(p).length
    assert(userExchanges <= 1, p)
    // the mark fan-out joins the checkpointed SESSION rdd, never the fact
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("CartesianProduct") ||
      "BroadcastNestedLoopJoin".r.findAllIn(p).nonEmpty, p)
  }

  test("x148: link prediction aggregates pairs BEFORE the anti-join; TakeOrdered top-k") {
    val df = SparkEntry.queries("x148_link_pred")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the anti join's left input is the aggregated pair set (cn/ra built
    // below the join), so the anti join never sees the wedge stream
    assert(p.contains("LeftAnti"), p)
    val anti = p.linesIterator.indexWhere(_.contains("LeftAnti"))
    val aggBelow = p.linesIterator.drop(anti + 1)
      .takeWhile(l => !l.contains("LeftAnti"))
      .exists(_.contains("HashAggregate"))
    assert(aggBelow, p)
    // r13 forensics pin (the r12 "x148 slowed 2x" scare was box
    // contention — quiet-box min matches r11): the wedge join must
    // stay a hash-partitioned equi-join on z, never a nested loop,
    // and the agg exchange must keep its map-side partial
    assert(!p.contains("BroadcastNestedLoop"), p)
    assert("SortMergeJoin \\[z#\\d+L?\\]|ShuffledHashJoin \\[z#\\d+L?\\]".r
      .findFirstIn(p).isDefined, p)
    assert(p.contains("partial_count"), p)
  }

  test("x149: EWMA = one key-partitioned rank window + one groupBy; no global window") {
    val p = planOf("x149_ewma_spend")
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("key")), specs.toString)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x150: trend slope = daily pre-agg + ONE moment groupBy; dims broadcast; no window") {
    val df = SparkEntry.queries("x150_trend_slope")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p) // cust/nation/region
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x151: entry/exit = ONE user-key exchange; assembly joins at type cardinality") {
    val df = SparkEntry.queries("x151_entry_exit")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val userExchanges = "Exchange hashpartitioning\\(user".r.findAllIn(p).length
    assert(userExchanges <= 1, p)
    // the three per-type aggregates read the checkpointed SESSION rdd
    assert("Scan ExistingRDD".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x152: overlap folds checkpointed 64-row registers — raw tokens cross one exchange only") {
    val df = SparkEntry.queries("x152_hll_overlap")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // registers and the distinct set are checkpointed once; the pair
    // fan-out (non-equi broadcast join) touches register rows only
    assert("Scan ExistingRDD".r.findAllIn(p).length >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("WindowExec"), p)
  }

  test("x153: cusum windows are key-partitioned; totals broadcast back") {
    val df = SparkEntry.queries("x153_cusum")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("key")), specs.toString)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x154: bloom export = ONE bit_or groupBy; broadcast width completion; no window") {
    val df = SparkEntry.queries("x154_bloom_export")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("bit_or"), p)
    // seeds and the 16-row word table broadcast; tokens shuffle once at
    // word cardinality (partial bit_or combines map-side)
    assert(broadcasts(p) >= 1, p)
    assert("partial_bit_or|bit_or".r.findAllIn(p).nonEmpty, p)
  }

  test("x155: attribution = ONE user-key journey window; rollups at type cardinality") {
    val df = SparkEntry.queries("x155_linear_attribution")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // every window partitions by user (journey form + touch rank)
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("user_id")), specs.toString)
    // journeys checkpointed once; consumers read the RDD, not the fact
    assert("Scan ExistingRDD".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x156: ONE JSON pass (rank-side, behind the two-phase checkpoint); totals scan prunes to event_type") {
    val p = planOf("x156_props_stats")
    // round 18: the JSON extraction is paid exactly ONCE — inside the
    // rank's checkpointed input (hidden behind Scan ExistingRDD here;
    // its codegen form is pinned by the Verify oracle + ExtSpec). What
    // this plan must show: the missing-count side is a JSON-FREE scan
    // that column-prunes to event_type alone — if props ever reappears
    // in a visible ReadSchema, the derived-missing design regressed.
    assert(!p.toLowerCase.contains("batchevalpython"), p)
    assert(p.contains("ReadSchema: struct<event_type:string>"), p)
    assert(!p.contains("props"), p)
    // event_type strata are low-cardinality: two-phase rank, never a
    // bare-stratum window over corpus-scale props rows
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    // round 18: the two-phase running sum is a partition-local
    // MapPartitions scan over the pinned sort — no window at all; any
    // RESIDUAL window must still be _pid-local, never the bare stratum
    assert(specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x157: details aggregate to key cardinality BELOW the header join; one summary row") {
    val df = SparkEntry.queries("x157_reconcile_totals")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the join's right side is the (key, sum) aggregate, not raw lines
    val joinLine = p.linesIterator.indexWhere(l =>
      l.contains("Join") && l.contains("LeftOuter"))
    assert(joinLine >= 0, p)
    assert(p.linesIterator.drop(joinLine + 1).exists(_.contains("HashAggregate")), p)
  }

  test("x158: keeper election is a combinable max(struct) groupBy, not a cluster window") {
    val df = SparkEntry.queries("x158_cluster_keepers")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the only windows belong to the upstream CC/LSH machinery — the
    // election itself must appear as partial_max of a struct
    assert("partial_max\\(struct".r.findAllIn(p).nonEmpty
      || "partial_max\\(peak".r.findAllIn(p).nonEmpty
      || p.contains("max(struct"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x159: rankings fold checkpointed two-phase buckets — no window in the final plan") {
    // the three globalBuckets rankings (range sort + _pid windows) run
    // below their localCheckpoints — the two-phase property itself is
    // pinned by the x127 audit on the same machinery; here the final
    // plan must only join and roll up the checkpointed bucket tables
    val df = SparkEntry.queries("x159_rfm_segments")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x160: power-law fit never touches the corpus twice — hist + slope, no window") {
    val df = SparkEntry.queries("x160_powerlaw_fit")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec"), p)
    // count scans in the FINAL adaptive section only (toString echoes
    // the full Initial Plan below it, double-counting the same scan)
    val finalSection = p.split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(finalSection).length <= 1, p) // one corpus read
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x161: ship-lag quantile ranks are _pid-local two-phase; counts broadcast") {
    val df = SparkEntry.queries("x161_ship_lag")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // order priority has FIVE values — a bare-priority window would cap
    // the rank at five tasks; round 14 routes it through StratumRank
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    // round 18: the two-phase running sum is a partition-local
    // MapPartitions scan over the pinned sort — no window at all; any
    // RESIDUAL window must still be _pid-local, never the bare stratum
    assert(specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x162: merge path joins key-cardinality aggregates; dims broadcast") {
    val df = SparkEntry.queries("x162_incremental_agg")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p) // customer + nation
    assert(!p.contains("CartesianProduct"), p)
    // both outer joins sit ABOVE aggregates (key-cardinality inputs)
    assert("FullOuter".r.findAllIn(p).nonEmpty, p)
  }

  test("x163: allocation runs on the strata aggregate; row rank is _pid-local two-phase") {
    val df = SparkEntry.queries("x163_proportional_sample")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    // round 18: the two-phase running sum is a partition-local
    // MapPartitions scan over the pinned sort — no window at all; any
    // RESIDUAL window must still be _pid-local, never the bare stratum
    assert(specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x164: weighted-median running sum is _pid-local two-phase; totals broadcast") {
    val df = SparkEntry.queries("x164_weighted_median")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // source strata: the running-weight cumsum decomposes two-phase —
    // the previous bare-stratum window capped parallelism at |sources|
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    // round 18: the two-phase running sum is a partition-local
    // MapPartitions scan over the pinned sort — no window at all; any
    // RESIDUAL window must still be _pid-local, never the bare stratum
    assert(specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x165: churn = one per-user groupBy; edge broadcasts; no window") {
    val df = SparkEntry.queries("x165_churn_labels")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec"), p)
    assert(p.contains("Scan ExistingRDD"), p) // per-user table checkpointed once
    assert(!p.contains("CartesianProduct") ||
      p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x166: merkle folds are two group-local aggregations — no window, no join") {
    val p = planOf("x166_merkle_root")
    assert(!p.contains("WindowExec"), p)
    assert(!p.contains("Join"), p)
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(p).nonEmpty, p)
  }

  test("x167: pseudonymize audit runs at key cardinality; singletons broadcast") {
    val df = SparkEntry.queries("x167_pseudonymize_audit")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec"), p)
    assert(broadcasts(p) >= 3, p)
  }

  test("x168: seasonal index = two combinable aggs + broadcast region join; no window") {
    val df = SparkEntry.queries("x168_seasonal_index")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x169: ABC classifies the CHECKPOINTED bucket table — no window above it") {
    // the two-phase ranking itself is decileLift's machinery, pinned by
    // the x127 audit; here the 1000-row bucket table is checkpointed
    // and the final plan must only aggregate it (no global window, no
    // corpus re-read)
    val df = SparkEntry.queries("x169_abc_classes")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Scan parquet"), p)
  }

  test("x170: chao1 = two combinable aggs at vocab cardinality; no window, no join") {
    val p = planOf("x170_chao1")
    assert(!p.contains("WindowExec"), p)
    assert(!p.contains("Join"), p)
  }

  test("x171: EMD pair join runs on the checkpointed 63-row-per-stratum CDF, not the corpus") {
    val df = SparkEntry.queries("x171_emd_lengths")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Scan ExistingRDD"), p)
    val finalSection = p.split("== Initial Plan ==")(0)
    assert(!finalSection.contains("Scan parquet"), p) // corpus read only before the checkpoint
  }

  test("x172: no global window — positions come from the broadcast self-join count") {
    val df = SparkEntry.queries("x172_negative_samples")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the LSH machinery may window per-band; nothing may window globally
    assert(!"Window \\[".r.findAllIn(p).exists(_ => p.contains("windowspecdefinition()")), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x173: diff joins block-cardinality hashes — documents never cross the outer join") {
    val df = SparkEntry.queries("x173_merkle_diff")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("FullOuter".r.findAllIn(p).nonEmpty, p)
    // both outer-join inputs are the block aggregates
    val joinLine = p.linesIterator.indexWhere(_.contains("FullOuter"))
    assert(p.linesIterator.drop(joinLine + 1).exists(_.contains("Aggregate")), p)
    assert(!p.contains("WindowExec"), p)
  }

  test("x174: native ring_successor lookup — NO keys×ring join, no amplification") {
    val df = SparkEntry.queries("x174_hash_ring")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the r10 plan materialized keys × 128-row ring through a
    // BroadcastNestedLoopJoin (10.8 s suite max at sf0.1) — the fixed
    // plan pays one O(log V) binary search per row instead; the only
    // remaining BNLJ is the single-row n_total crossJoin finish
    // (AQE prints final + initial plan, so count the final section only)
    val finalP = p.split("== Initial Plan ==")(0)
    assert("BroadcastNestedLoopJoin".r.findAllIn(finalP).length <= 1, p)
    // the successor expression folds into an aggregate's result
    // projection in the physical string — pin it on the optimized plan
    assert(df.queryExecution.optimizedPlan.toString.contains("ring_successor"), p)
    assert(!p.contains("WindowExec"), p)
  }
}

/** Round-11 ninth-batch plan pins (x175–x179). */
class PlanAuditSpec2 extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  private def shuffles(p: String): Int =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(p).length

  test("x175: full-corpus link prediction — top-k is a heap cut, never a global sort") {
    val p = planOf("x175_link_pred_full")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("WindowExec"), p)
  }

  test("x176: SCD2 rides ONE hash(key) exchange across all three windows") {
    val df = SparkEntry.queries("x176_scd2_intervals")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // lag-filter, lead, and version rank all partition by the same key:
    // exactly one hashpartitioning(key) exchange in the FINAL plan
    // (plus the output range sort)
    val finalP = p.split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning\\(key".r.findAllIn(finalP).length === 1, p)
    assert("Window \\[".r.findAllIn(finalP).nonEmpty, p)
  }

  test("x177: CDC chunking — per-doc window, no self-join, group-local chunk fold") {
    val df = SparkEntry.queries("x177_cdc_chunks")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x178: calendar explode happens at day cardinality, not row cardinality") {
    val df = SparkEntry.queries("x178_partition_gaps")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the generator must sit above the (k, day) aggregate, never on the scan
    val genLine = p.linesIterator.indexWhere(_.contains("Generate explode"))
    assert(genLine >= 0, p)
    assert(p.linesIterator.drop(genLine + 1).exists(_.contains("HashAggregate")), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("x179: the bloom probe is scan-side expression work — no join for the prune") {
    val df = SparkEntry.queries("x179_bloom_semijoin")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(df.queryExecution.optimizedPlan.toString.contains("bloom_contains"), p)
    // the only join is the broadcast left-outer against distinct dim keys
    // (the audit's exact-truth leg); the probe itself joins nothing
    val finalP = p.split("== Initial Plan ==")(0)
    assert("BroadcastHashJoin".r.findAllIn(finalP).length === 1, p)
    assert(!finalP.contains("SortMergeJoin"), p)
  }

  test("x180: the KMV sketch is an O(k) aggregate — no window, no sort of the hash stream") {
    val df = SparkEntry.queries("x180_kmv_distinct")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the oracle pays a per-key row_number over ALL distinct hashes;
    // the engine must not: the buffer dedups and truncates at k
    assert(!p.contains("Window"), p)
    // the typed udaf plans as ObjectHashAggregate (partial + final)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("x182: readability is scan-side math — zero joins, one rollup exchange + sort") {
    val df = SparkEntry.queries("x182_readability")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Join"), p) // passthrough keys, never a self-join
    // source rollup + output sort, nothing else
    assert("Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(finalP).length === 2, p)
  }

  test("x183: contract audit joins nothing — conditional-sum scan + slim PK exchange") {
    val df = SparkEntry.queries("x183_contract_audit")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Join"), p)
    // the uniqueness leg reads only the 2 key columns (toString may
    // truncate the line, so match the prefix, not a closed struct<>)
    assert(finalP.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int"), p)
  }

  test("x184: key discovery is one Expand scan — never |cols| scans, never a join") {
    val df = SparkEntry.queries("x184_key_candidates")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Join"), p)
    assert("Expand".r.findAllIn(finalP).length === 1, p)
    assert("FileScan parquet".r.findAllIn(finalP).length === 1, p)
  }

  test("x185: apriori triples — broadcast-only joins, no shuffle join anywhere") {
    val df = SparkEntry.queries("x185_basket_triples")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    // frequent-item prune + 3 support joins broadcast; n_sess is a
    // 1-row broadcast crossjoin; nothing ever sort-merge-joins (at
    // sf0.001 the triple set is empty and AQE may prune the broadcast
    // joins entirely — the pin is the NEGATIVE claim)
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("ShuffledHashJoin"), p)
  }

  test("x186: epoch shuffle is combinable aggregation — no window, no shuffle join") {
    val df = SparkEntry.queries("x186_epoch_shuffle")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Window"), p)
    assert(!finalP.contains("SortMergeJoin"), p)
    // the epoch replication is a broadcast nested loop vs a 3-row
    // literal — bounded by |epochs|, never by a data-sized side
    assert(finalP.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x187: KS folds the corpus to 63-bin counts before any join") {
    val df = SparkEntry.queries("x187_ks_drift")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("SortMergeJoin"), p)
    // the cumulative window sits behind the bin-table localCheckpoint
    // (invisible here); what the FINAL plan must show is that every
    // join input is broadcast-sized — no shuffled join of any kind
    assert(!finalP.contains("ShuffledHashJoin"), p)
    assert(!finalP.contains("CartesianProduct"), p)
  }

  test("x188: sketch algebra never sorts the hash stream — aggregates only") {
    val df = SparkEntry.queries("x188_kmv_overlap")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    // the oracle pays three global row_number sorts; the engine's three
    // sketches are O(k) buffers — no window anywhere
    assert(!finalP.contains("Window"), p)
    assert(finalP.contains("ObjectHashAggregate"), p)
  }

  test("x189: grouped k-fold never goes cartesian; fold mapping is scan-side hash") {
    val df = SparkEntry.queries("x189_grouped_kfold")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(!finalP.contains("Window"), p) // no rank anywhere — hash folds
  }

  test("x190: rolling z-score windows are keyed on the daily rollup") {
    val df = SparkEntry.queries("x190_rolling_zscore")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert("Window \\[[^\\]]*\\], \\[key#".r.findAllIn(finalP).nonEmpty, p)
    assert(!finalP.contains("Join"), p) // trailing frames, no self-join
  }

  test("x191: decayed leaderboard is TakeOrdered over one combinable agg") {
    val df = SparkEntry.queries("x191_decayed_topk")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("TakeOrderedAndProject"), p)
    assert(!finalP.contains("Window"), p)
    assert(!finalP.contains("SortMergeJoin"), p)
  }

  test("x192: l-diversity is two stacked combinable groupBys — join-free") {
    val df = SparkEntry.queries("x192_l_diversity")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Join"), p)
    assert(!finalP.contains("Window"), p)
    // cells exchange + class exchange + output sort, nothing else
    assert(shuffles(finalP) <= 3, p)
  }

  test("x193: resize geometry is scan-side — no join, no aggregate, only the output sort moves rows") {
    val df = SparkEntry.queries("x193_resize_plan")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Join"), p)
    assert(!finalP.contains("HashAggregate"), p)
    assert(shuffles(finalP) <= 1, p)
  }

  test("x194: calibration rides x7's guards — banded buckets, never a cartesian pair space") {
    val df = SparkEntry.queries("x194_lsh_calibration")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(!finalP.contains("BroadcastNestedLoopJoin"), p)
    // the maxBucket hot-bucket guard window sits BEHIND the banded-side
    // checkpoint since round 18 (the self-join consumed the guarded
    // frame twice, so it is pinned once); the terminal plan reads the
    // pinned scan — the guard behavior itself is value-pinned in
    // DedupSpec's bucket-cap tests
    assert(finalP.contains("Scan ExistingRDD"), p)
  }

  test("x195: ppr iterations reference checkpoints; the seed-count crossjoin never re-runs") {
    // Same discipline as x64: 3 iterations × the edge checkpoint + the
    // node-attrs checkpoint in r0 and each blend join — the broadcast
    // 1-row ns crossJoin lives BEHIND the attrs checkpoint.
    val p = planOf("x195_ppr")
    assert("Scan ExistingRDD".r.findAllIn(p).length === 7, p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x196: winsorize never builds a per-key global window — ranks are (pid, key)-local behind the checkpoint") {
    val df = SparkEntry.queries("x196_winsorize")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    // the visible plan reads the checkpointed sort (ExistingRDD); the
    // only Window partitions by (_pid, k) — NEVER by k alone, which
    // with 5 keys would serialize the corpus through 5 tasks
    assert(finalP.contains("Scan ExistingRDD"), p)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    winLines.foreach(l => assert(l.contains("_pid"), l))
    assert(!finalP.contains("Exchange SinglePartition"), p)
  }

  test("x197: burstiness is two stacked combinable groupBys — no window, no join, no explode") {
    val df = SparkEntry.queries("x197_burstiness")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Join"), p)
    assert(!finalP.contains("Window"), p)
    assert(!finalP.contains("Generate"), p)
  }

  test("x198: fertility is one combinable groupBy — counts only, never a token explode") {
    val df = SparkEntry.queries("x198_fertility")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Join"), p)
    assert(!finalP.contains("Generate"), p) // vs vocabStats' explode
    assert(shuffles(finalP) <= 2, p)        // lang rollup + output sort
  }

  test("x199: lateness rides ONE user-keyed window, then a cell-bounded rollup") {
    val df = SparkEntry.queries("x199_lateness")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.size === 1, p)
    winLines.foreach(l => assert(l.contains("u#") || l.contains("partitionBy"), l))
    assert(!finalP.contains("Exchange SinglePartition"), p)
    assert(!finalP.contains("Join"), p)
  }

  test("x181: every autocorr window is keyed — day-cardinality, nothing global") {
    val df = SparkEntry.queries("x181_rank_autocorr")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    // rn + (rx, ry per lag branch): every Window partitions by key/lag
    val windows = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty, p)
    assert(!finalP.contains("Exchange SinglePartition"), p)
  }

  test("x200: chi2 margins join back broadcast onto checkpointed cells — no shuffled join, no window") {
    val df = SparkEntry.queries("x200_chi2_assoc")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    // cells are checkpointed once (the one data-scale exchange lives
    // behind the ExistingRDD); margins are cell-scale and broadcast
    assert(finalP.contains("Scan ExistingRDD"), p)
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("ShuffledHashJoin"), p)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(!finalP.contains("Window"), p)
  }

  test("x201: t-closeness runs on occupied cells only — broadcast margins, no shuffled join") {
    val df = SparkEntry.queries("x201_t_closeness")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("ShuffledHashJoin"), p)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(!finalP.contains("Window"), p)
  }

  test("x202: sweep-line rides ONE keyed window over the fact join — never a global sort") {
    val df = SparkEntry.queries("x202_max_concurrency")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    val windows = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.size === 1, p)
    windows.foreach(l => assert(l.contains("k#"), l))
    assert(!finalP.contains("Exchange SinglePartition"), p)
    assert(!finalP.contains("CartesianProduct"), p)
  }

  test("x203: target encoding is scan-side arithmetic behind broadcast key sums — no shuffled join, no window") {
    val df = SparkEntry.queries("x203_target_encode")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("ShuffledHashJoin"), p)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(!finalP.contains("Window"), p)
  }

  test("x204: top-4 window runs over the firm AGGREGATE keyed by market; supplier joins broadcast") {
    val df = SparkEntry.queries("x204_market_hhi")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.size === 1, p)
    winLines.foreach(l => assert(l.contains("m#"), l))
    assert(finalP.contains("BroadcastHashJoin"), p)
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("Exchange SinglePartition"), p)
  }

  test("x205: systematic stride rides the two-phase rank — (pid)-local windows only, no global sort") {
    val df = SparkEntry.queries("x205_systematic_sample")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    winLines.foreach(l => assert(l.contains("_pid"), l))
    assert(!finalP.contains("SortMergeJoin"), p)
  }

  test("x206: MRR eval reuses the audited ANN plans — keyed rank windows, no shuffled join") {
    val df = SparkEntry.queries("x206_ann_mrr")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("qid#"), l))
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("ShuffledHashJoin"), p)
    assert(!finalP.contains("CartesianProduct"), p)
  }

  test("x207: gini split runs on checkpointed cells — no shuffled join, no window") {
    val df = SparkEntry.queries("x207_gini_split")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("ShuffledHashJoin"), p)
    assert(!finalP.contains("Window"), p)
  }

  test("x208: AUC rank is two-phase — (pid)-local windows behind the checkpoint, no global sort") {
    val df = SparkEntry.queries("x208_rank_auc")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    winLines.foreach(l => assert(l.contains("_pid"), l))
    assert(!finalP.contains("SortMergeJoin"), p)
  }

  test("x209: A/B pair matrix is a broadcast self-join over segments — no shuffled join, no window") {
    val df = SparkEntry.queries("x209_ab_lift")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("ShuffledHashJoin"), p)
    assert(!finalP.contains("Window"), p)
  }

  test("x210: calibration label rides the rank id — no data-scale join back, (pid)-local windows only") {
    val df = SparkEntry.queries("x210_calibration")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    winLines.foreach(l => assert(l.contains("_pid"), l))
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("ShuffledHashJoin"), p)
  }

  test("x211: shard χ² is one scan-side hash + one rollup — no join, no window, χ² on the checkpointed load table") {
    val df = SparkEntry.queries("x211_shard_uniformity")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("ShuffledHashJoin"), p)
    assert(!finalP.contains("Window"), p)
  }

  test("x212: changepoint windows are type-keyed over the daily rollup; totals join broadcast") {
    val df = SparkEntry.queries("x212_changepoint")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("k#"), l))
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("Exchange SinglePartition"), p)
  }

  test("x213: runs test is two type-keyed windows + one rollup — no join") {
    val df = SparkEntry.queries("x213_runs_test")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("k#"), l))
    assert(!finalP.contains("Join"), p)
    assert(!finalP.contains("Exchange SinglePartition") ||
      finalP.contains("Sort"), p) // only the output sort may coalesce
  }

  test("x214: ANOVA is one combinable moment rollup — no join, no window") {
    val df = SparkEntry.queries("x214_anova")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Join"), p)
    assert(!finalP.contains("Window"), p)
    assert(!finalP.contains("Generate"), p)
  }

  test("x215: assortativity broadcasts the degree table onto the checkpointed edges — no shuffled join, no window") {
    val df = SparkEntry.queries("x215_assortativity")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("ShuffledHashJoin"), p)
    assert(!finalP.contains("Window"), p)
    assert(!finalP.contains("CartesianProduct"), p)
  }

  test("x216: nearest as-of is ONE keyed spine sort carrying both frames — no range self-join") {
    val df = SparkEntry.queries("x216_asof_nearest")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("__k"), l))
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(!finalP.contains("Exchange SinglePartition"), p)
  }

  test("x217: WAPE backtest is one keyed lag window over the daily rollup — no join") {
    val df = SparkEntry.queries("x217_wape_backtest")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.size === 1, p)
    winLines.foreach(l => assert(l.contains("k#"), l))
    assert(!finalP.contains("Join"), p)
  }

  test("x218: Mann–Kendall pairs ride the checkpointed daily rollup; the Sen median window is keyed") {
    val df = SparkEntry.queries("x218_mann_kendall")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("k#"), l))
    assert(!finalP.contains("CartesianProduct"), p)
    assert(!finalP.contains("Exchange SinglePartition"), p)
  }

  test("x219: lead–lag is calendar-bound after the two daily rollups — no window, no cartesian blowup") {
    val df = SparkEntry.queries("x219_leadlag")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Window"), p)
    assert(!finalP.contains("CartesianProduct"), p)
  }

  test("x220: χ² drift runs on the checkpointed bin table — margins and spine are cell-scale, no window") {
    val df = SparkEntry.queries("x220_chi2_drift")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    assert(!finalP.contains("Window"), p)
    assert(!finalP.contains("CartesianProduct"), p)
  }

  test("x221: MAP eval rides the audited brute plan — qid-keyed windows; only bounded tables broadcast") {
    val df = SparkEntry.queries("x221_map_eval")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("qid#"), l))
    // The corpus-cardinality neighbor→label map joins UNHINTED (the
    // planner may shuffle it at scale): any shuffled join must be the
    // neighbor_id-keyed one, and nothing degenerates to a cartesian.
    finalP.linesIterator
      .filter(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
      .foreach(l => assert(l.contains("neighbor_id#"), l))
    assert(!finalP.contains("CartesianProduct"), p)
    // the only nested-loop join is knnBrute's broadcast query slice
    // (BuildRight — the |queries|-row side)
    finalP.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach(l => assert(l.contains("BuildRight"), l))
    // The surviving broadcast HINTS are all on BOUNDED tables (labN's
    // |labels|-row counts, the |queries|-row qLab slice, knnBrute's
    // query slice); the corpus-cardinality neighbor→label join carries
    // NO hint — the round-11 ADVICE's corpus-size broadcast is gone.
    val opt = df.queryExecution.optimizedPlan.toString
    opt.linesIterator
      .filter(l => l.contains("Join Inner, (neighbor_id"))
      .foreach(l => assert(!l.contains("Hint"), l))
    val hintCount = "strategy=broadcast".r.findAllIn(opt).size
    assert(hintCount <= 3, opt)
  }

  test("x222: κ is one combinable cell rollup — marginal algebra on the checkpointed cells, no window") {
    val df = SparkEntry.queries("x222_kappa_raters")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("Window"), p)
    assert(!finalP.contains("CartesianProduct"), p)
  }

  test("x223: McNemar is ONE scan-side 4-cell aggregate — no join, no window, no second exchange") {
    val df = SparkEntry.queries("x223_mcnemar")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Join"), p)
    assert(!finalP.contains("Window"), p)
    // one aggregation pair (partial + final) over the scan, nothing else
    assert(finalP.linesIterator.count(_.contains("HashAggregate")) === 2, p)
  }

  test("x224: drawdown windows are keyed on the priority — no global sort window, no join") {
    val df = SparkEntry.queries("x224_drawdown")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("k#"), l))
    assert(!finalP.contains("Join"), p)
  }

  test("x225: Kruskal–Wallis rank is two-phase — (pid)-local windows behind the checkpoint, no global sort") {
    val df = SparkEntry.queries("x225_kruskal")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    winLines.foreach(l => assert(l.contains("_pid"), l))
    assert(!finalP.contains("SortMergeJoin"), p)
  }

  test("x226: LPA rounds are equi-joins + argmax elections — no window, no cartesian") {
    val df = SparkEntry.queries("x226_label_prop")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Window"), p)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(!finalP.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x227: streak islands are user-keyed windows; the survival cumsum runs on the histogram only") {
    val df = SparkEntry.queries("x227_streaks")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, p)
    // every data-scale window is keyed on k; the single unkeyed window
    // is the survival cumsum over the |streak lengths| histogram rows
    val unkeyed = winLines.filterNot(_.contains("k#"))
    assert(unkeyed.size <= 1, p)
    assert(!finalP.contains("Join"), p)
  }

  test("x228: Brier terms live on two segment rollups joined broadcast — no shuffled join, no window") {
    val df = SparkEntry.queries("x228_brier")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("BroadcastHashJoin"), p)
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("ShuffledHashJoin"), p)
    assert(!finalP.contains("Window"), p)
  }

  test("x229: CA trend is one combinable score rollup + single-row algebra — no join, no window") {
    val df = SparkEntry.queries("x229_ca_trend")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Join"), p)
    assert(!finalP.contains("Window"), p)
  }

  test("x230: Markov chain iterates on checkpointed cells — the only data-scale window is user-keyed") {
    val df = SparkEntry.queries("x230_markov_steady")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    winLines.foreach(l => assert(l.contains("user_id#"), l))
    assert(!finalP.contains("CartesianProduct"), p)
  }

  test("x231: CUPED is one user rollup + broadcast moments — no window, no shuffled join") {
    val df = SparkEntry.queries("x231_cuped")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    assert(!finalP.contains("Window"), p)
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("ShuffledHashJoin"), p)
  }

  test("x232: HITS top-k is TakeOrdered, never a global rank window; no cartesian anywhere") {
    val df = SparkEntry.queries("x232_hits")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("TakeOrderedAndProject"), p)
    assert(!finalP.contains("Window"), p)
    assert(!finalP.contains("CartesianProduct"), p)
    // the only nested-loop joins are the 1-row normalization totals
    // (broadcast singleton crossjoins — the repo-standard idiom)
    finalP.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach(l => assert(l.contains("BuildRight, Cross"), l))
  }

  test("x233: truncation agreement is two audited brute scans — qid-keyed windows, overlap join on |q|·k rows") {
    val df = SparkEntry.queries("x233_mrl_agreement")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("qid#"), l))
    assert(!finalP.contains("CartesianProduct"), p)
  }

  test("x234: U-shaped attribution shares x155's plan shape — user-keyed windows only") {
    val df = SparkEntry.queries("x234_position_attr")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Scan ExistingRDD"), p)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("user_id#"), l))
    assert(!finalP.contains("CartesianProduct"), p)
  }

  test("x235: pinball lags are key-partitioned windows over the daily rollup — no join") {
    val df = SparkEntry.queries("x235_pinball")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("k#"), l))
    assert(!finalP.contains("Join"), p)
  }

  test("x236: DiD is one user rollup + a 2-row arm rollup — no window, no shuffled join") {
    val df = SparkEntry.queries("x236_did")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Window"), p)
    assert(!finalP.contains("SortMergeJoin"), p)
    assert(!finalP.contains("ShuffledHashJoin"), p)
    assert(!finalP.contains("CartesianProduct"), p)
  }

  test("x237: capture–recapture is ONE scan-side 3-counter aggregate — no join, no window") {
    val df = SparkEntry.queries("x237_capture_recapture")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("Join"), p)
    assert(!finalP.contains("Window"), p)
  }

  test("x238: Good–Turing is one explode + two combinable rollups — no join, no window") {
    val df = SparkEntry.queries("x238_good_turing")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(finalP.contains("Generate explode"), p)
    assert(!finalP.contains("Join"), p)
    assert(!finalP.contains("Window"), p)
  }

  test("x239: Heaps curve rides the two-phase rank — no global row_number window, cumsum over bucket rows only") {
    val df = SparkEntry.queries("x239_heaps_curve")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    // the doc rank is globalRank's two-phase plan (checkpointed), never
    // an unpartitioned row_number over the corpus
    assert(finalP.contains("Scan ExistingRDD"), p)
    finalP.linesIterator.filter(_.contains("Window ["))
      .foreach(l => assert(!l.contains("row_number"), l))
    assert(!finalP.contains("CartesianProduct"), p)
  }

  test("x240: Kendall S is the Knight aggregator — ZERO joins, k-keyed rank window, typed agg") {
    val df = SparkEntry.queries("x240_kendall_tau")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    // the round-12 replan: the days²-per-key pair self-join is GONE
    assert(!finalP.contains("Join"), p)
    val winLines = finalP.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l => assert(l.contains("k#"), l))
    // the S/n1/n2 state rides the typed KendallSAgg (object aggregate)
    assert(finalP.contains("ObjectHashAggregate") ||
      finalP.contains("SortAggregate"), p)
  }

  test("x241: dHash is ONE scan-side projection (no exchange/explode/agg); pairs via banded equi-join, never all-pairs") {
    import org.apache.spark.sql.functions.encode
    // the fingerprint alone: pure projection — zero exchanges, zero
    // Generate, zero aggregates; a 100 TB corpus hashes in its own scan
    val media = graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"))
    val hp = graft.ext.Multimodal.dHash60(media, col("media_id"), col("payload"))
      .queryExecution.executedPlan.toString
    assert(!hp.contains("Exchange"), hp)
    assert(!hp.contains("Generate"), hp)
    assert(!hp.contains("Aggregate"), hp)
    // the full pair query: banded equi-join on (blk, key) — no cartesian
    val df = SparkEntry.queries("x241_phash_neardup")(spark, dir)
    val rows = df.collect()
    // the planted re-encode variants make the result non-empty at any
    // corpus size: every (d, d+1e9) pair with hamming <= 1 must be here
    assert(rows.nonEmpty, "x241 returned 0 pairs — the recall probe is vacuous")
    // the reencodeVariants blast-radius contract: a planted
    // (original, its-own-variant) pair is GUARANTEED hamming <= 1 by
    // the length guards — a 2-or-3 here means the perturbation leaked
    rows.filter(r => r.getLong(1) - 1000000000L == r.getLong(0))
      .foreach(r => assert(r.getInt(2) <= 1, s"planted pair drifted: $r"))
    assert(rows.exists(r => r.getLong(1) - 1000000000L == r.getLong(0) && r.getInt(2) <= 1),
      s"no (original, variant) planted pair surfaced: ${rows.take(10).mkString(",")}")
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(!finalP.contains("BroadcastNestedLoop"), p)
    // positive join assertion on the FULL plan string: with a non-empty
    // fixture the AQE final plan keeps the join, but asserting on the
    // whole dump (initial + final) is AQE-replan-proof either way
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findFirstIn(p).isDefined, p)
  }

  test("x243: frame hashing is one scan + one bounded Generate (no join); pairs via frame-aligned banded equi-join; planted twins vote through") {
    import org.apache.spark.sql.functions.encode
    // the fused frame-hash: payload carried THROUGH the explode — no
    // plan-to-payload self-join, zero exchanges before the pairing
    val vids = graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"), lit("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
    val hp = graft.ext.Multimodal.videoFrameDHash(vids)
      .queryExecution.executedPlan.toString
    assert(!hp.contains("Exchange"), hp)
    assert(!hp.contains("Join"), hp)
    assert(hp.contains("Generate"), hp) // the bounded frame explode
    // the full vote query: equi-join keyed on (frame_idx, blk, key)
    val df = SparkEntry.queries("x243_video_neardup")(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty, "x243 returned 0 pairs — the re-upload probe is vacuous")
    val twins = rows.filter(r => r.getLong(1) - r.getLong(0) == 2000000000L)
    assert(twins.nonEmpty, s"no (video, twin) pair surfaced: ${rows.take(10).mkString(",")}")
    twins.foreach { r =>
      assert(r.getInt(3) == 0, s"re-upload twin must be hamming 0 at every frame: $r")
      assert(r.getLong(2) >= 2L, s"twin votes need >= 2 aligned frames: $r")
    }
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(!finalP.contains("BroadcastNestedLoop"), p)
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findFirstIn(p).isDefined, p)
  }

  test("x244: the audio trim plan is ONE scan-side projection — zero exchange, zero Generate, zero aggregate") {
    import org.apache.spark.sql.functions.encode
    val media = graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"), lit("audio").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
    val hp = graft.ext.Multimodal.audioTrimPlan(media)
      .queryExecution.executedPlan.toString
    assert(!hp.contains("Exchange"), hp)
    assert(!hp.contains("Generate"), hp)
    assert(!hp.contains("Aggregate"), hp)
    // and the registered query returns a trim verdict for every audio row
    val rows = SparkEntry.queries("x244_audio_trim")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val silent = r.getInt(3)
      assert(silent >= 0 && silent <= 16, r.toString)
      assert((silent == 16) == r.isNullAt(1), s"all-silent iff NULL trim: $r")
    }
  }

  test("x245: Borda shares ONE hash(ballot) exchange across collapse + both windows; candidate rollup is combinable") {
    val df = SparkEntry.queries("x245_borda")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("CartesianProduct"), p)
    // every window is keyed by the ballot — no global window anywhere
    finalP.linesIterator.filter(_.contains("windowspecdefinition"))
      .foreach(l => assert(l.contains("ballot"), l))
    // the ballot exchange appears ONCE (collapse, rank and size reuse it)
    val ballotExchanges = finalP.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning(ballot")).size
    assert(ballotExchanges <= 1, s"$ballotExchanges ballot exchanges:\n$p")
    assert(finalP.contains("partial_"), p)
  }

  test("x246: phash clusters ride the banded pairs (no cartesian) and every planted family is one cluster") {
    val df = SparkEntry.queries("x246_phash_clusters")(spark, dir)
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty, "x246 returned no clusters — the planted families are gone")
    val planted = rows.keys.filter(_ >= 1000000000L)
    assert(planted.nonEmpty, "no planted variant reached a cluster")
    planted.foreach { v =>
      assert(rows(v) === rows(v - 1000000000L),
        s"variant $v not clustered with its original")
    }
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("x247: segmentation is one bounded Generate + ONE media_id exchange shared by window and rollup") {
    val df = SparkEntry.queries("x247_audio_segments")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(!finalP.contains("Join"), p)
    assert(finalP.contains("Generate"), p) // the <=16-row window explode
    finalP.linesIterator.filter(_.contains("windowspecdefinition"))
      .foreach(l => assert(l.contains("media_id"), l))
    // hash(media_id) satisfies the (media_id, island) clustering, so the
    // island rollup rides the window's exchange — exactly one
    val mediaExchanges = finalP.linesIterator
      .count(_.contains("Exchange hashpartitioning(media_id"))
    assert(mediaExchanges == 1, s"$mediaExchanges media_id exchanges:\n$p")
  }

  test("x248: Copeland duels are a within-ballot equi-join (no cartesian); rollups are combinable") {
    val df = SparkEntry.queries("x248_copeland")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(!finalP.contains("BroadcastNestedLoop"), p)
    // the self-join is keyed on the ballot
    assert("SortMergeJoin \\[ballot|ShuffledHashJoin \\[ballot|BroadcastHashJoin \\[ballot".r
      .findFirstIn(finalP).isDefined, p)
    assert(finalP.contains("partial_"), p)
  }

  test("x249: quota broadcast; two-phase rank — NO stage partitions corpus data by the bare stratum") {
    val df = SparkEntry.queries("x249_dist_match")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(finalP.contains("BroadcastHashJoin"), p) // <=63-bin quota + offsets
    // the r13 scale defect, pinned dead: the rank window must be
    // (_pid, stratum-shadow)-local, never bare-stratum-partitioned —
    // a bare-stratum window caps parallelism at <=63 log2 bins
    val wlines = finalP.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    // round 18: the rank is a window-free MapPartitions two-phase scan;
    // residual windows (if any) must be _pid-local
    wlines.foreach(l => assert(l.contains("_pid"), l))
    assert(p.contains("MapPartitions"), p)
    // at most ONE hashpartitioning(__s) may remain — the quota
    // subtree's post-partial-agg exchange (<=63 rows per mapper after
    // map-side combine; AQE may fold it out of the printed final plan
    // entirely) — the POOL side never exchanges on the bare stratum
    val stratumExchanges = finalP.linesIterator
      .count(_.contains("Exchange hashpartitioning(__s"))
    assert(stratumExchanges <= 1,
      s"$stratumExchanges bare-stratum exchanges (only the quota agg's allowed):\n$p")
  }

  test("x250: pigeonhole-banded audio candidates — composite-key equi-join, no window, no cartesian") {
    val df = SparkEntry.queries("x250_audio_neardup")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(!finalP.contains("BroadcastNestedLoop"), p)
    // round 14: candidates come from the (band, composite-level-key)
    // equi-join — content-rich keys, never the constant-cardinality
    // (window, level) space that went quadratic at sf1 (517 s); the
    // hot-bucket guard is a broadcast count join, not a window
    assert("Join \\[band#\\d+, key#".r.findFirstIn(finalP).isDefined ||
      finalP.contains("Join [band#"), p)
    assert(!finalP.contains("windowspecdefinition"), p)
    // the vote aggregates with map-side partials
    assert(finalP.contains("partial_sum") || finalP.contains("partial_count"), p)
  }

  test("x251: cluster table broadcasts into the corpus join; keep rank + size ride ONE cluster exchange") {
    val df = SparkEntry.queries("x251_crossmodal_keepone")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==")(0)
    assert(!finalP.contains("CartesianProduct"), p)
    assert(finalP.contains("BroadcastHashJoin"), p) // pair-driven cluster table
    // every window is cluster-partitioned (per-cluster groups, corpus-
    // cardinality key — no low-cardinality funnel)
    finalP.linesIterator.filter(_.contains("windowspecdefinition"))
      .foreach(l => assert(l.contains("cluster"), l))
    // the DOC side pays one cluster exchange shared by rank + size
    val clusterExchanges = finalP.linesIterator
      .count(_.contains("Exchange hashpartitioning(cluster"))
    assert(clusterExchanges == 1, s"$clusterExchanges cluster exchanges:\n$p")
  }

  test("graph ops: iteration caps are enforced (the lineage contract — a fixpoint variant must checkpoint, not raise these)") {
    import graft.ext.Graph
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, iters = 9))
    intercept[IllegalArgumentException](Graph.personalizedPageRank(e, c => c === 1L, iters = 11))
    intercept[IllegalArgumentException](Graph.labelPropagation(e, rounds = 9))
    intercept[IllegalArgumentException](Graph.hits(e, iters = 9, k = 5))
    intercept[IllegalArgumentException](Graph.kCorePeel(e, k = 1, rounds = 17))
    // at the cap, the analyzer handles the deepest tree (plan builds +
    // analyzes without materializing — lineage over pinned leaves)
    val deep = Graph.pageRank(e, iters = 8)
    assert(deep.queryExecution.analyzed != null)
  }

  // Round-14 bare-stratum-window retirement: every remaining op whose
  // strata are source/day/type-shaped now ranks through StratumRank's
  // two-phase decomposition. These pins make a regression to the
  // bare-stratum funnel (parallelism ceiling = stratum cardinality) a
  // suite failure. x108/x115 keep plain hash windows BY DESIGN — their
  // strata are user-keyed (cardinality >> partitions), where the hash
  // window is the right plan and two-phase's driver offset table would
  // refuse.
  private def execWindows(name: String): (String, Seq[String]) = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    (p, "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq)
  }

  test("x89: token-budget cumsum is _pid-local two-phase — no bare-stratum window") {
    val (p, specs) = execWindows("x89_token_budget_cut")
    // round 18: the two-phase running sum is a window-free
    // partition-local MapPartitions scan; residual windows (if any)
    // must be _pid-local, never bare-stratum
    assert(specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x97: curriculum rank is _pid-local two-phase — no bare-source window") {
    val (p, specs) = execWindows("x97_curriculum_interleave")
    // round 18: the two-phase running sum is a window-free
    // partition-local MapPartitions scan; residual windows (if any)
    // must be _pid-local, never bare-stratum
    assert(specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x98: quantile-normalize rank is _pid-local two-phase — no bare-stratum window") {
    val (p, specs) = execWindows("x98_quantile_norm")
    // round 18: the two-phase running sum is a window-free
    // partition-local MapPartitions scan; residual windows (if any)
    // must be _pid-local, never bare-stratum
    assert(specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x103: length-quantile rank is _pid-local two-phase — no bare-source window") {
    val (p, specs) = execWindows("x103_length_quantiles")
    // round 18: the two-phase running sum is a window-free
    // partition-local MapPartitions scan; residual windows (if any)
    // must be _pid-local, never bare-stratum
    assert(specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x126: day-quantile ranks are _pid-local; only the session window is user-keyed") {
    val (p, specs) = execWindows("x126_session_stats")
    // sessionization legitimately windows on user_id (entity-keyed);
    // the per-DAY quantile ranks must not window on the bare day
    // the session window itself sits behind the sessionize-output
    // checkpoint since r17, so the terminal plan may carry NO windows
    // at all; any residual one must be entity-keyed
    assert(specs.forall(s => s.contains("user_id") ||
        s.contains("key")),  // Sessionize renames user_id -> key
      specs.toString)
    // round 18: the day-quantile rank itself is the window-free
    // MapPartitions two-phase scan
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  // Round-14 twenty-ninth batch pins (x252-x254)

  test("x252: queries broadcast; ONE checkpointed similarity table feeds all consumers; NO rank window") {
    val df = SparkEntry.queries("x252_bitext_margin")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the |q|x|pool| table is localCheckpointed once — consumers scan
    // the materialized RDD instead of recomputing the pair cosines
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("CartesianProduct"), p)
    // round 15: both k-NN neighborhood means ride the combinable
    // TopKByMeasureAgg and the per-query winner is a struct max, so the
    // plan carries NO window — pool growth can never concentrate into
    // qid-partitioned single-task sorts of the pair table
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("Window"), p)
  }

  test("x253: pad-waste rank is _pid-local two-phase — buckets never window bare") {
    val df = SparkEntry.queries("x253_pad_waste")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    // round 18: the two-phase running sum is a partition-local
    // MapPartitions scan over the pinned sort — no window at all; any
    // RESIDUAL window must still be _pid-local, never the bare stratum
    assert(specs.forall(_.contains("_pid")), specs.toString)
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x255: queries broadcast into the kNN; label counts broadcast; no cartesian") {
    val df = SparkEntry.queries("x255_ndcg_eval")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the kNN query side and both label tables arrive as broadcasts
    assert("BroadcastExchange".r.findAllIn(p).length >= 2, p)
    // the only windows are the per-qid rank (fixed query set)
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("qid")), specs.toString)
  }

  test("x254: consensus is a pair-keyed join over two banded pipelines — no cartesian") {
    val df = SparkEntry.queries("x254_consensus_neardup")(spark, dir)
    val rows = df.collect()
    // planted re-encode + identical-caption twins GUARANTEE the 'both'
    // class is populated at any corpus size (the x241 non-vacuity
    // discipline): every planted (id, id+1e9) pair has phash <= 1 AND
    // simhash 0
    assert(rows.exists(_.getString(4) == "both"), rows.take(5).mkString(","))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the full outer on (a, b) is an equi-join (SMJ or shuffled hash)
    assert(p.contains("FullOuter"), p)
    // both inputs arrive via their banded block-key equi-joins: no
    // BroadcastNestedLoopJoin anywhere in the composition
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x49: keep-best is a combinable struct-argmax — NO window, map-side partial agg (r15 skew hardening)") {
    val p = planOf("x49_dedup_best")
    assert(!p.contains("Window"), p)
    // partial_max before the content_hash exchange: a viral fingerprint
    // family folds into per-partition maxima instead of one task
    assert(p.contains("partial_max"), p)
    assert("Exchange hashpartitioning\\(content_hash".r
      .findAllIn(p).length === 1, p)
  }

  // Round-15 pins (x256/x257): the keep-one composition is modality-
  // agnostic — BOTH new registrations must carry x251's exact plan
  // posture (broadcast pair-driven cluster table, every window cluster-
  // keyed, ONE cluster exchange shared by rank + size)

  for (name <- Seq("x256_audio_keepone", "x257_video_keepone"))
    test(s"$name: broadcast cluster table; cluster-keyed windows only; ONE cluster exchange") {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val finalP = p.split("== Initial Plan ==")(0)
      assert(!finalP.contains("CartesianProduct"), p)
      assert(finalP.contains("BroadcastHashJoin"), p)
      finalP.linesIterator.filter(_.contains("windowspecdefinition"))
        .foreach(l => assert(l.contains("cluster"), l))
      val clusterExchanges = finalP.linesIterator
        .count(_.contains("Exchange hashpartitioning(cluster"))
      assert(clusterExchanges == 1, s"$clusterExchanges cluster exchanges:\n$p")
    }

  test("stripTerminalSort: identical row SET, terminal Sort gone, inner sorts kept (the r16 bench disposition)") {
    // three shapes: plain agg+sort (q3), window query whose INNER sort
    // must survive (x22), join+sort (q12)
    for (name <- Seq("q3_first_nonempty", "x22_window_family", "q12_revenue_join")) {
      val orig = SparkEntry.queries(name)(spark, dir)
      val stripped = org.apache.spark.sql.GraftSqlBridge.stripTerminalSort(orig)
      // terminal global sort peeled
      assert(!stripped.queryExecution.analyzed.getClass.getSimpleName.contains("Sort"),
        name)
      val a = orig.collect().map(_.toString).sorted.toSeq
      val b = stripped.collect().map(_.toString).sorted.toSeq
      assert(a === b, s"$name row set changed")
    }
    // a window's internal ordering is NOT a terminal sort: x22 still
    // computes lag/lead over the right order after the peel (covered by
    // the row-set identity above — lag values embed the order)
  }
}
