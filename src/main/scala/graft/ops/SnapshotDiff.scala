package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot delta: classify every key across two snapshots of the same
  * aggregate as added / dropped / changed / same — the incremental-
  * maintenance primitive behind SCD-style dimension upkeep and
  * period-over-period reporting (the reference recomputes its daily
  * rollup from scratch every cycle, `StreamTest.cpp:830-944`; a delta
  * view is what a warehouse keeps instead).
  *
  * 100 TB posture: both snapshots pre-aggregate to one row per key
  * BEFORE the full-outer join, so the join carries key-cardinality
  * rows, not fact rows; with AQE both agg outputs hash-partition on the
  * same key and the join adds no extra exchange. The compare columns
  * must be exactly representable (longs / decimals) — classifying on a
  * float sum would turn accumulation order into a diff.
  */
object SnapshotDiff {

  /** Full-outer delta of two per-key aggregate frames. `a` and `b` must
    * each have `key` unique (one row per key) and share the schema
    * `key, compareCols...`. Output: one row per key present in either
    * side, with `a_<col>`/`b_<col>` pairs and a `status` of
    * 'added' (b only), 'dropped' (a only), 'changed', or 'same'.
    */
  def delta(a: DataFrame, b: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    val al = a.select(col(key) +: compareCols.map(c => col(c).as(s"a_$c")): _*)
    val bl = b.select(col(key) +: compareCols.map(c => col(c).as(s"b_$c")): _*)
    // presence flags, not null-checks on compare columns: a legitimate
    // NULL aggregate on a present key must not read as absence
    val j = al.withColumn("__in_a", lit(1))
      .join(bl.withColumn("__in_b", lit(1)), Seq(key), "full_outer")
    val same = compareCols
      .map(c => col(s"a_$c") <=> col(s"b_$c"))
      .reduce(_ && _)
    j.withColumn("status",
        when(col("__in_a").isNull, lit("added"))
          .when(col("__in_b").isNull, lit("dropped"))
          .when(same, lit("same"))
          .otherwise(lit("changed")))
      .drop("__in_a", "__in_b")
  }

  /** Distribution drift between two corpus partitions, as per-category
    * total-variation contributions in exact integer arithmetic: for
    * each value of `category`, the per-million rates `r1 = c1·1e6 div
    * N1`, `r2 = c2·1e6 div N2`, and the TV contribution
    * `|c1·N2 − c2·N1|·1e6 div N1 div N2` (= `|p1 − p2|` per-million;
    * half the sum over categories is the total-variation distance).
    * `inA` is the partition predicate (e.g. `ts < midpoint`).
    *
    * Arithmetic contract: products run in DECIMAL(38,0) and the
    * quotient divides SEQUENTIALLY (`DIV N1 DIV N2` — exact floor
    * composition, the x78 bigramPmi pattern), so nothing overflows
    * while `N1·N2·1e6 < 10^38`, i.e. up to ~10^16 rows per side —
    * beyond any single corpus. Rates are floors, bit-identical in any
    * engine with integer division; no floats anywhere.
    *
    * Plan: ONE scan, ONE map-side-combinable groupBy(category) with
    * conditional counts, then a broadcast crossJoin of the 1-row
    * totals — no second pass over the data, no window. */
  def categoryDrift(df: DataFrame, category: Column, inA: Column): DataFrame =
    driftFromCounts(categoryCounts(df, category, inA))

  /** The drift STATE: per-category conditional counts `(category, c1,
    * c2)`. A pure sum-aggregate, so it folds incrementally under
    * Structured Streaming (complete mode) exactly like the batch
    * plan — StreamingSketchSpec pins state == batch on a replayed
    * stream; [[driftFromCounts]] is the batch finisher you run off the
    * maintained state table. */
  def categoryCounts(df: DataFrame, category: Column, inA: Column): DataFrame =
    df.select(category.as("category"), when(inA, 1L).otherwise(0L).as("ina"))
      .groupBy("category")
      .agg(sum(col("ina")).as("c1"), sum(lit(1L) - col("ina")).as("c2"))

  /** Finisher: rates and TV contributions from a counts-state table
    * (see [[categoryDrift]] for the arithmetic contract). */
  def driftFromCounts(per: DataFrame): DataFrame = {
    val totals = per.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    per.crossJoin(broadcast(totals))
      .select(col("category"), col("c1"), col("c2"),
        expr("CAST(CAST(c1 AS DECIMAL(38,0)) * 1000000 DIV n1 AS BIGINT)")
          .as("r1_e6"),
        expr("CAST(CAST(c2 AS DECIMAL(38,0)) * 1000000 DIV n2 AS BIGINT)")
          .as("r2_e6"),
        expr("""CAST(abs(CAST(c1 AS DECIMAL(38,0)) * CAST(n2 AS DECIMAL(38,0))
               |        - CAST(c2 AS DECIMAL(38,0)) * CAST(n1 AS DECIMAL(38,0)))
               |     * 1000000 DIV n1 DIV n2 AS BIGINT)""".stripMargin)
          .as("tv_e6"))
  }

  /** Fact-vs-header reconciliation of one money column: per header key,
    * the booked total against the sum DERIVED from its detail lines
    * (per-LINE cents rounding, then an exact integer sum — the rounding
    * contract is part of the operator's definition and the oracle
    * mirrors it). One summary row: exact matches, small mismatches
    * (|diff| <= `tolCents`), real breaks, headers with no lines at all,
    * and the max/total absolute drift — the closing-the-books audit
    * (the reference never cross-checks its own rollups; a warehouse
    * MUST).
    *
    * 100 TB posture: details pre-aggregate to key cardinality BEFORE
    * meeting the header (combinable sum; with AQE both sides hash on
    * the same key, one co-partitioned join, no broadcast of a fact).
    * Output: (n_headers, n_no_lines, n_exact, n_within_tol, n_breaks,
    * max_abs_diff, total_abs_diff). */
  def reconcileTotals(headers: DataFrame, headerKey: Column,
      bookedCents: Column, details: DataFrame, detailKey: Column,
      lineCents: Column, tolCents: Long): DataFrame = {
    require(tolCents >= 0, s"tolCents=$tolCents must be >= 0")
    val h = headers.select(headerKey.cast("long").as("k"),
      bookedCents.cast("long").as("booked"))
    val d = details.select(detailKey.cast("long").as("k"),
        lineCents.cast("long").as("c"))
      .groupBy("k").agg(sum(col("c")).as("derived"))
    h.join(d, Seq("k"), "left")
      .select(col("k"), col("booked"), col("derived"),
        (col("derived") - col("booked")).as("diff"))
      .agg(count(lit(1)).as("n_headers"),
        sum(when(col("derived").isNull, 1L).otherwise(0L)).as("n_no_lines"),
        sum(when(col("diff") === 0L, 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("diff") =!= 0L && abs(col("diff")) <= tolCents, 1L)
          .otherwise(0L)).as("n_within_tol"),
        sum(when(abs(col("diff")) > tolCents, 1L).otherwise(0L)).as("n_breaks"),
        coalesce(max(abs(col("diff"))), lit(0L)).as("max_abs_diff"),
        coalesce(sum(abs(col("diff"))), lit(0L)).as("total_abs_diff"))
  }

  /** Incremental aggregation by STATE MERGE: a running (key, total)
    * state table folded with a delta slice's partial aggregate via one
    * key-cardinality full-outer join — the lambda-architecture batch
    * path that never re-reads history. The output carries the state,
    * delta, and merged totals PLUS an independently-recomputed full
    * total and its diff, so the merge law (state ⊕ delta == full) is a
    * visible column (always 0), not a comment — the same
    * contract-made-data shape as hllDistinct's n_exact.
    *
    * 100 TB posture: the full-recompute column is the AUDIT branch you
    * run at toy scale and drop in production; the merge path reads only
    * the delta and the key-cardinality state. Aggregates must be
    * commutative monoids on exact types (longs here). */
  def incrementalMerge(state: DataFrame, delta: DataFrame, full: DataFrame,
      key: Column, measure: Column): DataFrame = {
    def agg(df: DataFrame, out: String) =
      df.select(key.as("k"), measure.cast("long").as("m"))
        .groupBy("k").agg(sum(col("m")).as(out))
    agg(state, "cents_state")
      .join(agg(delta, "cents_delta"), Seq("k"), "full_outer")
      .na.fill(0L, Seq("cents_state", "cents_delta"))
      .withColumn("cents_total", col("cents_state") + col("cents_delta"))
      .join(agg(full, "cents_full"), Seq("k"), "full_outer")
      .na.fill(0L, Seq("cents_state", "cents_delta", "cents_total", "cents_full"))
      .withColumn("merge_diff", col("cents_total") - col("cents_full"))
  }
}
