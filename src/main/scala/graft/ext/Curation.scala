package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The one-call curation decision: every per-document keep/drop signal
  * a pre-training sweep needs, composed from the individually-oracled
  * operators — normalization-keyed exact dedup (x1/x25), heuristic
  * language ID (x4), C4/Gopher quality gates (x42), and deterministic
  * per-language hash downsampling (x27) — into a single flags row per
  * document. A user runs ONE query and gets the corpus keep-list plus
  * the reason each dropped doc dropped.
  *
  * 100 TB posture: every text-derived signal (fingerprint, language,
  * quality counts) is computed SCAN-SIDE in one projection, and the
  * text is dropped before anything moves — the only full-corpus
  * exchange carries (doc_id, 16-byte fingerprint, a few small ints),
  * the slim canonical-election shuffle on the content fingerprint.
  * Language filter, quality gate, and sampling are zero-shuffle row
  * predicates. Dropping a signal column from the output does not
  * un-shuffle anything, so compute them all; the marginal flag is free.
  */
object Curation {

  /** Per-document curation flags:
    * `(doc_id, predicted, is_canonical, keep_lang, keep_quality,
    * keep_sample, keep_flag)` — all flags 0/1 ints, `keep_flag` their
    * conjunction.
    *
    *   - `is_canonical`: this doc is the min-id owner of its normalized
    *     content fingerprint (later byte-near-identical copies drop);
    *   - `keep_lang`: predicted language (CJK check + stopword argmax)
    *     is in `keepLangs`;
    *   - `keep_quality`: the C4/Gopher composite (word-count floor,
    *     mean-word-length band, lorem-ipsum ban, bullet-ratio cap);
    *   - `keep_sample`: deterministic md5-hash downsample at the
    *     PREDICTED language's rate (reproducible on any cluster, and
    *     keyed on what the pipeline believes the doc is, not on
    *     possibly-absent source metadata). */
  def curationFlags(docs: DataFrame, id: Column, text: Column,
      keepLangs: Seq[String] = Seq("en", "de"),
      rates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0): DataFrame = {
    val slim = docs.select(
      id.as("doc_id"),
      // unhex: the election key is the 16 raw digest bytes, not the
      // 32-char hex rendering — half the width on the only exchange
      // that scales with the corpus
      unhex(md5(TextAnalysis.normalize(text))).as("nfp"),
      TextAnalysis.langId(text).as("predicted"),
      TextAnalysis.wsTokenCount(text).as("n_words"),
      TextAnalysis.meanWordLen(text).as("mean_word_len"),
      TextAnalysis.bulletLineCount(text).as("bullet_lines"),
      size(TextAnalysis.lines(text)).as("n_lines"),
      lower(text).contains("lorem ipsum").cast("int").as("has_lorem"))
    val rate = rates.foldLeft(lit(math.round(defaultRate * 10000)): Column) {
      case (acc, (s, r)) =>
        when(col("predicted") === s, lit(math.round(r * 10000))).otherwise(acc)
    }
    // canonical election as a map-side-combinable min + join back, NOT a
    // window over the fingerprint: a viral doc (100k+ byte-identical
    // copies, the tripwire's flood) would put its entire nfp group into
    // one WindowExec buffer, while the agg combines per-partition and
    // the join's hot bucket streams (and AQE can skew-split it).
    // The keeper branch re-reads the corpus but computes ONLY the
    // fingerprint — the expensive signals (language ID's 20 stopword
    // scans, quality counts) run once, on the probe side
    val keepers = docs
      .select(id.as("doc_id"), unhex(md5(TextAnalysis.normalize(text))).as("nfp"))
      .groupBy(col("nfp")).agg(min(col("doc_id")).as("keep_id"))
    slim
      .join(keepers, Seq("nfp"))
      .withColumn("is_canonical", (col("doc_id") === col("keep_id")).cast("int"))
      .withColumn("keep_lang", col("predicted").isin(keepLangs: _*).cast("int"))
      .withColumn("keep_quality",
        TextAnalysis.c4Keep(col("n_words"), col("mean_word_len"),
          col("has_lorem") === 1, col("bullet_lines"), col("n_lines")))
      .withColumn("keep_sample", (Sampling.hashBucket(col("doc_id")) < rate).cast("int"))
      .withColumn("keep_flag",
        (col("is_canonical") * col("keep_lang") * col("keep_quality") *
          col("keep_sample")).cast("int"))
      .select("doc_id", "predicted", "is_canonical", "keep_lang",
        "keep_quality", "keep_sample", "keep_flag")
  }

  /** 2-D Pareto (skyline) frontier over integer metric columns: the
    * docs no other doc weakly dominates — `(x' >= x AND y' >= y)` with
    * at least one strict. Exact ties on BOTH coordinates are mutually
    * non-dominating, so a whole tie-group survives together (Börzsönyi/
    * Kossmann/Stocker ICDE 2001 skyline semantics).
    *
    * Plan: the naive dominance test is an N² self-join; the 2-D sweep
    * is not — (1) per-x max(y) (map-side-combinable groupBy: within an
    * x-group anything below the max is dominated by the max row),
    * (2) a strictly-descending-x running max of ymax over the DISTINCT
    * x values (rows preceding = larger x; survive iff ymax beats it),
    * (3) join the surviving (x, y) corner set back to pick up every
    * tied doc. The running max is TWO-PHASE (range sort on x desc,
    * per-partition window keyed by spark_partition_id, broadcast
    * exclusive-prefix maxima — `Batching.withBatches`' shape): no
    * global window, so the sweep over |distinct x| rows (bounded by
    * the metric's value range, not corpus size) stays distributed.
    * The corner set joined back is frontier-sized, i.e. broadcast
    * territory. Output: `(doc_id, x, y)`. */
  /** Data-contract verification suite: one output row PER CONSTRAINT
    * with exact violation accounting — the machine-checkable "is this
    * table fit to train on / join against" gate a pipeline runs before
    * consuming a new drop. Row-level checks (not-null, range, domain,
    * sign) are conditional sums evaluated in ONE scan pass (combinable,
    * zero extra exchanges); NULL fails a check unless the predicate
    * itself admits it — constraint semantics, not SQL three-valued
    * comparison semantics (`coalesce(pred, false)`).
    *
    * The uniqueness constraint is the one check that cannot be a scan:
    * it pays one exchange carrying ONLY the key columns (a PK-width
    * wire, not the row), and `n_violations` counts the surplus rows
    * beyond one per key. 100 TB posture: the row-check leg reads each
    * block once and ships a handful of longs per partition; uniqueness
    * is the same slim shuffle any exact distinct pays.
    *
    * Output: (check_name, n_rows, n_violations, viol_ppm, pass). */
  def contractAudit(df: DataFrame, rowChecks: Seq[(String, Column)],
      uniqueKeyName: String, uniqueKey: Seq[Column]): DataFrame = {
    require(rowChecks.nonEmpty, "at least one row check required")
    require(uniqueKey.nonEmpty, "unique key columns required")
    // check names are spliced into a selectExpr stack() literal — keep
    // them identifier-like so a quote can't break (or smuggle into) the
    // expression string
    (rowChecks.map(_._1) :+ uniqueKeyName).foreach { nm =>
      require(nm.matches("[A-Za-z0-9_.-]+"), s"check name '$nm' not identifier-like")
    }
    val sums = count(lit(1)).cast("long").as("n_rows") +:
      rowChecks.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"v$i")
      }
    val agg = df.agg(sums.head, sums.tail: _*)
    val stackArgs = rowChecks.zipWithIndex
      .map { case ((nm, _), i) => s"'$nm', v$i" }.mkString(", ")
    val rowsOut = agg.selectExpr("n_rows",
        s"stack(${rowChecks.size}, $stackArgs) AS (check_name, n_violations)")
      .select(col("check_name"), col("n_rows"), col("n_violations"))
    val uniq = df.groupBy(uniqueKey: _*).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).cast("long").as("n_keys"),
        sum(col("c")).cast("long").as("n_rows"))
      .select(lit(uniqueKeyName).as("check_name"), col("n_rows"),
        (col("n_rows") - col("n_keys")).as("n_violations"))
    rowsOut.unionByName(uniq)
      .select(col("check_name"), col("n_rows"), col("n_violations"),
        expr("n_violations * 1000000L DIV n_rows").as("viol_ppm"),
        expr("CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)")
          .as("pass"))
  }

  def paretoFrontier(df: DataFrame, id: Column, x: Column, y: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df.select(id.as("doc_id"), x.cast("long").as("x"),
      y.cast("long").as("y"))
    val gmax = pts.groupBy("x").agg(max(col("y")).as("ymax"))
      .sort(col("x").desc).withColumn("_pid", spark_partition_id())
    // exclusive prefix max per partition (numPartitions rows on the
    // driver — not data); partitions sort before their successors, so
    // "all strictly-larger x" = earlier rows in this pid + earlier pids
    val pmax = gmax.groupBy("_pid").agg(max(col("ymax")).as("pm")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var best = Long.MinValue
    val prefix = pmax.map { case (pid, m) =>
      val p = best; best = math.max(best, m); (pid, p)
    }
    val local = Window.partitionBy(col("_pid")).orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val corners = gmax
      .withColumn("_lm", max(col("ymax")).over(local))
      .join(broadcast(prefix.toSeq.toDF("_pid", "_pm")), "_pid")
      .withColumn("m", greatest(coalesce(col("_lm"), lit(Long.MinValue)),
        col("_pm")))
      .where(col("ymax") > col("m"))
      .select(col("x"), col("ymax").as("y"))
    pts.join(broadcast(corners), Seq("x", "y")).select("doc_id", "x", "y")
  }

  /** Two-level Merkle-style dataset fingerprint per stratum: docs fold
    * into fixed-size blocks (`md5` over the id-ordered concat of
    * per-doc content hashes), blocks fold into one root per stratum —
    * the reproducibility stamp two sites compare before trusting "same
    * corpus" (and the per-block table localizes WHERE a mismatch
    * lives: same root = same data; differing root = diff the ~N/1024
    * block hashes, not N docs).
    *
    * 100 TB posture: per-group state is bounded by `blockSize` docs at
    * level 1 and (ids-span / blockSize) block hashes at level 2 —
    * never the corpus; both folds are ordinary groupBys whose sort is
    * group-local. Output: (stratum, n_docs, n_blocks, root_hash). */
  def merkleFingerprint(docs: DataFrame, stratum: Column, id: Column,
      text: Column, blockSize: Long = 1024L): DataFrame = {
    require(blockSize >= 2, s"blockSize=$blockSize must be >= 2")
    val d = docs.select(stratum.as("s"), id.cast("long").as("id"),
        md5(text).as("h"))
      .select(col("s"), col("id"), expr(s"id DIV ${blockSize}L").as("blk"), col("h"))
    val blocks = d.groupBy("s", "blk")
      .agg(count(lit(1)).as("n_docs"),
        md5(concat_ws("", transform(
          array_sort(collect_list(struct(col("id"), col("h")))),
          x => x.getField("h")))).as("bh"))
    blocks.groupBy("s")
      .agg(sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_blocks"),
        md5(concat_ws("", transform(
          array_sort(collect_list(struct(col("blk"), col("bh")))),
          x => x.getField("bh")))).as("root_hash"))
      .select(col("s").as("stratum"), col("n_docs"), col("n_blocks"),
        col("root_hash"))
  }

  /** Per-block content hashes — [[merkleFingerprint]]'s level 1,
    * exposed for diffing. Output: (s, blk, n_docs, bh). */
  def merkleBlocks(docs: DataFrame, stratum: Column, id: Column,
      text: Column, blockSize: Long): DataFrame = {
    require(blockSize >= 2, s"blockSize=$blockSize must be >= 2")
    docs.select(stratum.as("s"), id.cast("long").as("id"), md5(text).as("h"))
      .select(col("s"), col("id"), expr(s"id DIV ${blockSize}L").as("blk"), col("h"))
      .groupBy("s", "blk")
      .agg(count(lit(1)).as("n_docs"),
        md5(concat_ws("", transform(
          array_sort(collect_list(struct(col("id"), col("h")))),
          x => x.getField("h")))).as("bh"))
  }

  /** Merkle snapshot diff: compare two corpus snapshots at BLOCK
    * granularity — the localization [[merkleFingerprint]]'s root
    * promises, delivered: a changed doc names its ~blockSize-doc block,
    * not the corpus. Statuses: `changed` (both sides, different hash),
    * `only_a` / `only_b` (block present on one side). Blocks whose
    * hashes agree are DROPPED — the output is the work list.
    *
    * 100 TB posture: each side collapses to block cardinality (rows /
    * blockSize) BEFORE the full-outer join; the join compares ~32-byte
    * hashes, never documents. Output: (s, blk, status, n_docs_a,
    * n_docs_b). */
  def merkleDiff(a: DataFrame, b: DataFrame, stratum: Column, id: Column,
      text: Column, blockSize: Long = 1024L): DataFrame = {
    val ba = merkleBlocks(a, stratum, id, text, blockSize)
      .select(col("s"), col("blk"), col("n_docs").as("n_docs_a"), col("bh").as("bh_a"))
    val bb = merkleBlocks(b, stratum, id, text, blockSize)
      .select(col("s"), col("blk"), col("n_docs").as("n_docs_b"), col("bh").as("bh_b"))
    ba.join(bb, Seq("s", "blk"), "full_outer")
      .withColumn("status",
        when(col("bh_a").isNull, "only_b")
          .when(col("bh_b").isNull, "only_a")
          .when(col("bh_a") =!= col("bh_b"), "changed"))
      .where(col("status").isNotNull)
      .na.fill(0L, Seq("n_docs_a", "n_docs_b"))
      .select(col("s"), col("blk"), col("status"), col("n_docs_a"), col("n_docs_b"))
  }

  /** Cross-modal curation propagation — the paired image-text dedup
    * move a multimodal training pipeline ships: a MEDIA-side near-dup
    * cluster decision (e.g. x246's perceptual phash clusters) is
    * propagated onto the TEXT side, so near-duplicate images keep
    * exactly one caption document and drop the rest. Within each
    * cluster the kept copy is the BEST one by x49's dedup-best rule —
    * longest caption, tie to the smallest doc_id (truncated captions
    * lose to full ones) — not merely the first. Documents whose media
    * row never clustered are their own singleton (kept, labeled).
    * Cluster members without a caption row (e.g. planted probe
    * variants) simply don't participate — the decision is over the
    * real corpus.
    *
    * `docs` must carry (doc_id, text) for the media-paired documents;
    * `clusters` is (media_id, cluster) keyed by the same ids.
    *
    * 100 TB posture: the cluster table is pair-driven (orders of
    * magnitude smaller than the corpus) — BROADCAST into the one
    * corpus-scale join; the keep rule is one hash(cluster) exchange
    * whose window partitions are per-cluster (cluster cardinality ≈
    * corpus cardinality — no low-cardinality funnel); both the rank
    * and the cluster size ride the same exchange.
    * Output: (doc_id, cluster, n_cluster, keep, reason). */
  def crossModalKeepOne(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("cap_len"))
    val cl = clusters.select(col("media_id").as("doc_id"), col("cluster"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("cap_len").desc, col("doc_id").asc)
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
    d.join(broadcast(cl), Seq("doc_id"), "left")
      .withColumn("__in_c", col("cluster").isNotNull)
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .withColumn("__rk", row_number().over(w))
      .withColumn("n_cluster", count(lit(1)).over(cw))
      .select(col("doc_id"), col("cluster"), col("n_cluster"),
        when(col("__rk") === 1, 1).otherwise(0).cast("int").as("keep"),
        when(!col("__in_c"), lit("singleton"))
          .when(col("__rk") === 1, lit("cluster_best"))
          .otherwise(lit("cluster_dup")).as("reason"))
  }
}
