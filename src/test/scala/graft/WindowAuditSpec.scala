package graft

/** Registry-wide window-partition-key gate (round 15) — makes the
  * round-14 bare-stratum-window retirement STRUCTURAL: every
  * `windowspecdefinition` in every registered query's physical plan
  * must either be `_pid`-local (the StratumRank/Batching two-phase
  * idiom) or carry partition keys explicitly justified below. A new
  * query that windows over a bare low-cardinality key (source, lang,
  * day, label, bin — the funnel class: parallelism ceiling = key
  * cardinality) fails here with the offending keys listed, instead of
  * surviving until a decade receipt catches the single-task sort.
  *
  * The justification table is deliberately a REVIEW SURFACE: each
  * entry names the key and why it is safe (entity-keyed at corpus
  * cardinality, pair/cluster-driven, bounded input rows, fixed query
  * shard). Adding a key here is a diff a reviewer sees; PLANS.md
  * carries the narrative.
  */
class WindowAuditSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  // Shared scale arguments — the four legitimate window classes. A key
  // justified under one of these is NOT the funnel class: its
  // cardinality grows with the corpus, or its partition size is bounded
  // by something that does not.
  private val Entity =
    "entity-keyed: cardinality >> partitions (two-phase's driver offset " +
      "table would refuse); the hash window is the right plan here"
  private val QueryShard =
    "x9 fixed-query contract: qid ranges over the broadcast id-bounded " +
      "query shard — constant work at any SF; production shards via x82/x10"
  private val LshBucket =
    "LSH bucket key: content-driven composite (band, hash) — bucket " +
      "cardinality grows with the corpus; hot buckets drop under the loud " +
      "maxBucket contract (the count-over window IS the cap's measurement)"
  private val Cluster =
    "cluster key is corpus-cardinality (every unclustered doc is its own " +
      "singleton) — no funnel; pinned by the x251-family plan tests"
  private val DaySeries =
    "per-series recurrence over a (key, day)-aggregate: partition rows are " +
      "bounded by the time domain; the window input is the aggregate, " +
      "never corpus rows"
  private val BoundedAgg =
    "window input is a value-domain-bounded aggregate (rows <= the key " +
      "domain product), not corpus-scale"
  private val BoundedGlobal =
    "unpartitioned cumsum over a rollup whose row count is bounded at " +
      "plan build (<= buckets / distinct streak lengths), not corpus-scale"

  private def keys(reason: String, ks: String*): Map[String, String] =
    ks.map(_ -> reason).toMap

  /** Per-query justified window partition keys (attribute name, sans
    * the #id suffix). A window passes if EVERY partition key is either
    * `_pid`-ish or listed here. Keys are matched on the attribute
    * name's prefix before `#`. */
  private val justified: Map[String, Map[String, String]] = Map(
    // bounded-partition by construction: every batch_id group holds
    // <= batchSize rows (the rank that formed it is two-phase)
    "q8_batching" -> keys(
      "partition rows <= batchSize by construction; batch_id cardinality " +
        "grows with the corpus", "batch_id"),
    // entity-keyed windows (user / customer / supplier / doc / media /
    // content-fingerprint / as-of key): the r14 rule's documented
    // exception — see the x108/x115 note in PlanAuditSpec
    "x108_interarrival_quantiles" -> keys(Entity, "user_id", "stratum"),
    "x112_locf_grid" -> keys(Entity, "user_id", "h"),
    "x113_lerp_grid" -> keys(Entity, "user_id", "h"),
    "x115_robust_outliers" -> keys(Entity, "stratum"),
    "x116_journey_trigrams" -> keys(Entity, "user_id"),
    "x119_transition_rates" -> keys(Entity, "user_id"),
    "x123_funnel_timing" -> keys(Entity, "user_id"),
    "x126_session_stats" -> keys(Entity, "key"),
    "x131_attribution" -> keys(Entity, "user_id"),
    "x132_pit_features" -> keys(Entity, "user_id"),
    "x139_window_funnel" -> keys(Entity, "user_id"),
    "x149_ewma_spend" -> keys(Entity, "key"),
    "x155_linear_attribution" -> keys(Entity, "user_id", "journey"),
    "x15_asof_join" -> keys(Entity, "__k"),
    "x16_topk_per_group" -> keys(Entity, "o_custkey"),
    "x176_scd2_intervals" -> keys(Entity, "key"),
    "x177_cdc_chunks" -> keys(Entity, "doc_id"),
    "x199_lateness" -> keys(Entity, "u"),
    "x202_max_concurrency" -> keys(Entity, "k"),
    "x216_asof_nearest" -> keys(Entity, "__k"),
    "x227_streaks" -> (keys(Entity, "k") ++ keys(BoundedGlobal, "<global>")),
    "x22_window_family" -> keys(Entity, "o_custkey"),
    "x234_position_attr" -> keys(Entity, "user_id", "journey"),
    "x245_borda" -> keys(Entity, "ballot"),
    "x247_audio_segments" -> keys(Entity, "media_id"),
    "x40_sessionize" -> keys(Entity, "key"),
    "x41_tfidf" -> keys(Entity, "doc_id"),
    "x44_rate_anomaly" -> keys(Entity, "key"),
    // x49 converted to a combinable struct-argmax in round 15 — no
    // window remains (a viral fingerprint family folds map-side)
    "x52_funnel" -> keys(Entity, "user_id"),
    "x56_substring_dedup" -> keys(Entity, "doc_id"),
    "x66_boilerplate" -> keys(Entity, "doc_id"),
    "x91_prefix_jaccard" -> keys(Entity, "doc_id"),
    // fixed-query-shard qid ranks (the ANN/eval family)
    "x9_knn_brute" -> keys(QueryShard, "qid"),
    "x10_knn_lsh" -> keys(QueryShard, "qid"),
    "x21_knn_ivf" -> keys(QueryShard, "qid"),
    "x26_knn_ivf_lloyd" -> keys(QueryShard, "qid"),
    "x33_knn_pq" -> keys(QueryShard, "qid"),
    "x60_knn_ivf_pq" -> keys(QueryShard, "qid"),
    "x63_knn_ivf_scaled" -> keys(QueryShard, "qid"),
    "x84_ann_recall" -> keys(QueryShard, "qid"),
    "x117_rrf_fusion" -> keys(QueryShard, "qid"),
    "x206_ann_mrr" -> keys(QueryShard, "qid"),
    "x221_map_eval" -> keys(QueryShard, "qid"),
    "x233_mrl_agreement" -> keys(QueryShard, "qid"),
    "x255_ndcg_eval" -> keys(QueryShard, "qid"),
    // LSH bucket-occupancy windows (banded dedup family)
    "x7_dedup_minhash" -> keys(LshBucket, "band", "bh"),
    "x8_dedup_simhash" -> keys(LshBucket, "blk", "key"),
    "x172_negative_samples" -> keys(LshBucket, "band", "bh"),
    "x194_lsh_calibration" -> keys(LshBucket, "band", "bh"),
    "x241_phash_neardup" -> keys(LshBucket, "blk", "key"),
    "x242_phash_band_audit" -> keys(LshBucket, "blk", "key"),
    "x243_video_neardup" -> keys(LshBucket, "frame_idx", "blk", "key"),
    "x254_consensus_neardup" -> keys(LshBucket, "blk", "key"),
    // cross-modal keep-one cluster windows
    "x251_crossmodal_keepone" -> keys(Cluster, "cluster"),
    "x256_audio_keepone" -> keys(Cluster, "cluster"),
    "x257_video_keepone" -> keys(Cluster, "cluster"),
    // per-series daily recurrences + value-domain-bounded aggregates
    "x133_fd_strength" -> keys(BoundedAgg, "lhs"),
    "x153_cusum" -> keys(DaySeries, "key"),
    "x181_rank_autocorr" -> keys(DaySeries, "key", "lag"),
    "x190_rolling_zscore" -> keys(DaySeries, "key"),
    "x204_market_hhi" -> keys(BoundedAgg, "m"),
    "x212_changepoint" -> keys(DaySeries, "k"),
    "x213_runs_test" -> keys(DaySeries, "k"),
    "x217_wape_backtest" -> keys(DaySeries, "k"),
    "x218_mann_kendall" -> keys(DaySeries, "k"),
    "x224_drawdown" -> keys(DaySeries, "k"),
    "x235_pinball" -> keys(DaySeries, "k"),
    "x239_heaps_curve" -> keys(BoundedGlobal, "<global>"),
    "x240_kendall_tau" -> keys(DaySeries, "k"),
    "x76_hist_quantile" -> keys(BoundedAgg, "key")
  )

  /** Split a windowspecdefinition arg list at top level and keep the
    * leading partition keys (everything before the first sort spec /
    * frame spec). */
  private def partitionKeys(spec: String): Seq[String] = {
    val args = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    spec.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => args += cur.result().trim; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) args += cur.result().trim
    args.toSeq
      .takeWhile(a => !a.contains(" ASC") && !a.contains(" DESC") &&
        !a.startsWith("specifiedwindowframe"))
  }

  /** Attribute name of a partition-key expression: `name#123` → name;
    * anything non-trivial is returned whole (must be justified
    * verbatim). */
  private def keyName(k: String): String = {
    val m = "^([A-Za-z_][A-Za-z0-9_]*)#\\d+".r.findFirstMatchIn(k)
    m.map(_.group(1)).getOrElse(k)
  }

  test("every registered query's windows are _pid-local or carry justified partition keys") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable =>
          bad += s"$name: plan build failed: ${e.getMessage}"; ""
        }
      val specs = "windowspecdefinition\\(([^\\n]*)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq.distinct
      specs.foreach { spec =>
        // an unpartitioned (global) window is the worst funnel of all —
        // it must be justified under the sentinel key "<global>"
        val keys0 = partitionKeys(spec).map(keyName)
        val keys = if (keys0.isEmpty) Seq("<global>") else keys0
        val ok = keys.exists(_.contains("_pid")) ||
          keys.forall(k => justified.getOrElse(name, Map.empty).contains(k))
        if (!ok) bad += s"$name: window keys ${keys.mkString("(", ", ", ")")}"
      }
    }
    assert(bad.isEmpty,
      s"\nunjustified window partition keys (${bad.size}):\n" +
        bad.distinct.mkString("\n") +
        "\n\nEither route through StratumRank (two-phase, _pid-local) or " +
        "add a justified entry in WindowAuditSpec with the scale argument.")
  }
}
