package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence preparation for LLM training: overlapping document
  * chunking and shard-parallel sequence packing.
  *
  * Both are pure integer/substring arithmetic over one explode or one
  * partitioned window — no UDFs, no driver loops, embarrassingly
  * parallel per shard at 100 TB.
  */
object Packing {

  /** Split each document into fixed-size character windows of `window`
    * with `overlap` characters shared between consecutive chunks
    * (stride = window - overlap). Every document yields at least one
    * chunk; the final chunk may be short. One `explode` — rows grow by
    * len/stride, nothing shuffles. */
  def chunk(df: DataFrame, id: Column, text: Column,
      window: Int, overlap: Int): DataFrame = {
    require(window > overlap && overlap >= 0,
      s"need window > overlap >= 0, got window=$window overlap=$overlap")
    val stride = window - overlap
    val n = length(text)
    // chunks start at 0, stride, 2·stride, …; count =
    // max(1, ceil((len - overlap) / stride)) = max(1, (len + stride - 1
    // - overlap) floor-div stride) — the numerator is always >= 0, so
    // floor of the double division is exact integer math on both engines
    val nChunks = greatest(lit(1L),
      floor((n.cast("long") + lit(stride - 1 - overlap)) / lit(stride)).cast("long"))
    df.select(id.as("doc_id"), text.as("text"))
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .select(col("doc_id"), col("chunk_id"),
        substring(col("text"), (col("chunk_id") * stride + 1).cast("int"), lit(window))
          .as("chunk"))
  }

  /** Shard-parallel greedy packing (the standard concat-then-cut
    * pretraining layout): within each `shard`, documents concatenate in
    * `order` order (a TOTAL order — running sums are order-dependent)
    * and are cut into `target`-sized sequences; each doc reports the
    * pack it STARTS in and its offset there.
    *
    * 100 TB posture (round 15 — the WindowAuditSpec sweep's find):
    * shards are SOURCE-shaped, i.e. low-cardinality, so the cumulative
    * sum rides [[StratumRank.cumsum]]'s two-phase decomposition — a
    * fat shard spans the cluster's partitions instead of
    * single-task-sorting in one `PARTITION BY source` window whose
    * parallelism ceiling is the shard count. `pack_id` is integer
    * `DIV` (not `floor` of a double quotient): cumulative byte offsets
    * pass 2^53 long before 100 TB and a double division would round.
    *
    * NULL semantics (pinned, round-15 review): a NULL `len` packs as a
    * zero-length document — it gets a real (pack_id, pack_offset) at
    * its position and adds nothing to the running total, matching the
    * pre-round-15 window form (SUM skips NULLs). A NULL `order` key
    * sorts LAST within its shard (StratumRank pins ANSI nulls-last;
    * the old bare window used Spark's nulls-FIRST — the one divergence,
    * aligned to the repo-wide ANSI convention since round 14).
    *
    * PRECONDITION (inherited from [[StratumRank]], round-16 doc): the
    * input frame must not carry any of StratumRank's reserved
    * bookkeeping column names (`__s`, `__sk`, `__w`, `__o0`…, `_pid`,
    * `_lc`, `_off`, `__cum`) — such frames are REFUSED loudly (the
    * pre-round-15 bare-window form accepted them silently). */
  def packAssignments(df: DataFrame, shard: Column, order: Column,
      len: Column, target: Int): DataFrame = {
    require(target > 0, "target must be positive")
    val len0 = coalesce(len.cast("long"), lit(0L))
    StratumRank.cumsum(df, shard, Seq(order), len0)
      .withColumn("cum_before", col("__cum") - len0)
      .withColumn("pack_id", expr(s"cum_before DIV ${target}L"))
      .withColumn("pack_offset", pmod(col("cum_before"), lit(target.toLong)))
      .drop("cum_before", "__cum", "__s")
  }

  /** Length-bucketed batch plan with exact padding-waste accounting —
    * the batching layout a padded (non-packed) training loader uses,
    * and the report that says what the bucketing BOUGHT: docs bucket by
    * `n_tok DIV bucketWidth` (top bucket open-ended), fill deterministic
    * fixed-size batches in md5-hash order within their bucket, and each
    * batch pads every member to its own max length. Per bucket:
    * batches, docs, real tokens, pad tokens, and `waste_ppm =
    * pad · 1e6 DIV (pad + tokens)` — all exact integers, so the waste
    * number is engine-reproducible, not a float estimate. (x37's
    * concat-then-cut packing is the zero-pad alternative; THIS op
    * prices the padded regime a sequence-boundary-respecting loader
    * pays.)
    *
    * 100 TB posture: buckets are ≤ `maxBucketId`+1 values — a
    * LOW-cardinality stratum — so the in-bucket rank runs through
    * [[StratumRank.rank]]'s two-phase decomposition (never a
    * bare-bucket window; a fat bucket spans the cluster), then two
    * combinable groupBys: (bucket, batch) at batch cardinality and
    * bucket at ≤ 16 rows. Hash order makes the batch plan a property
    * of the rows, reproducible across engines and reruns.
    *
    * Output: `(bucket, n_batches, n_docs, tok_total, pad_total,
    * waste_ppm)` — one row per populated bucket. */
  def padWaste(df: DataFrame, id: Column, text: Column,
      bucketWidth: Int = 64, maxBucketId: Int = 15,
      batchSize: Int = 32): DataFrame = {
    require(bucketWidth >= 1 && maxBucketId >= 0 && batchSize >= 1,
      s"padWaste(bucketWidth=$bucketWidth, maxBucketId=$maxBucketId, " +
        s"batchSize=$batchSize)")
    val d = df.select(id.as("doc_id"),
        graft.ext.TextAnalysis.wsTokenCount(text).cast("long").as("n_tok"))
      .withColumn("bucket",
        least(expr(s"n_tok DIV $bucketWidth"), lit(maxBucketId.toLong)))
    val ranked = StratumRank.rank(d, col("bucket"),
        Seq(md5(col("doc_id").cast("string")), col("doc_id")))
      .withColumnRenamed("__rn", "rn").drop("__s")
    ranked
      .withColumn("batch", expr(s"(rn - 1L) DIV $batchSize"))
      .groupBy("bucket", "batch")
      .agg(count(lit(1)).as("n_docs"), max(col("n_tok")).as("mx"),
        sum(col("n_tok")).as("tok"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_batches"), sum(col("n_docs")).as("n_docs"),
        sum(col("tok")).as("tok_total"),
        sum(col("mx") * col("n_docs") - col("tok")).as("pad_total"))
      .select(col("bucket"), col("n_batches"), col("n_docs"),
        col("tok_total"), col("pad_total"),
        // DECIMAL(38,0) widening: at the 100 TB posture pad_total can
        // exceed ~9.2e12, where pad_total * 1e6 overflows LONG (ANSI
        // runtime error). The decimal product is exact to 38 digits and
        // the quotient is a ppm ≤ 1e6, so the BIGINT cast-back is lossless.
        expr("CAST(CAST(pad_total AS DECIMAL(38,0)) * 1000000 " +
          "DIV greatest(pad_total + tok_total, 1L) AS BIGINT)")
          .as("waste_ppm"))
  }
}
