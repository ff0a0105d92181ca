package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering keys.
  *
  * At 100 TB the scan you avoid is worth more than the scan you
  * optimize: parquet keeps min/max stats per row group, so sorting the
  * write by a key that interleaves the bits of two filter columns
  * clusters BOTH dimensions into every file — a range predicate on
  * either column (or both) then prunes most row groups, where a plain
  * sort only serves its leading column. The key is pure integer bit
  * math (codegen, zero shuffle to compute; one range exchange to sort
  * the write by it).
  */
object Layout {

  /** Morton key: interleave the low `bits` bits of `a` (even positions)
    * and `b` (odd positions). Inputs are treated as non-negative ints;
    * 2·bits ≤ 62 keeps everything in a signed long. */
  def zorderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms: Seq[Column] = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** The same key as portable SQL (for oracles and documentation). */
  def zorderKeySql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** Cluster a frame for writing: range-partition and sort by the
    * Morton key of the two filter columns (plus a unique tiebreaker for
    * deterministic file contents). */
  def zorderWrite(df: DataFrame, a: Column, b: Column, bits: Int,
      tiebreak: Column): DataFrame = {
    val keyed = df.withColumn("__z", zorderKey(a, b, bits))
    keyed.repartitionByRange(col("__z"), tiebreak)
      .sortWithinPartitions(col("__z"), tiebreak)
      .drop("__z")
  }

  /** Zone-map (block min/max) statistics: group rows into blocks of
    * `blockSize` consecutive `blockKey` values and record, per block,
    * the row count and the min/max of the sort measure — exactly the
    * per-row-group metadata parquet keeps, computed here as a TABLE so
    * pruning power is measurable before you commit to a layout.
    * Output: (blk, n_rows, min_m, max_m), one row per occupied block.
    *
    * 100 TB posture: one combinable groupBy at block cardinality
    * (rows / blockSize) — the stats table is 4–5 orders of magnitude
    * smaller than the data and is itself the thing a scan planner
    * broadcasts. */
  def zoneMapStats(df: DataFrame, blockKey: Column, measure: Column,
      blockSize: Long): DataFrame = {
    require(blockSize >= 2, s"blockSize=$blockSize must be >= 2")
    df.select(blockKey.cast("long").as("k"), measure.cast("long").as("m"))
      .select(expr(s"k DIV ${blockSize}L").as("blk"), col("m"))
      .groupBy("blk")
      .agg(count(lit(1)).as("n_rows"), min(col("m")).as("min_m"),
        max(col("m")).as("max_m"))
  }

  /** Pruning audit of a zone map for the range predicate
    * `lo <= m <= hi`: one row with total/pruned block and row counts,
    * the exact matching-row count, and the two ppm ratios a layout
    * decision hangs on — `pruned_rows_ppm` (fraction of the table a
    * zone-aware scan SKIPS: blocks whose [min,max] misses the range
    * entirely) vs `match_ppm` (fraction it actually WANTS). The gap
    * between `1e6 − pruned_rows_ppm` and `match_ppm` is the read
    * amplification the current layout still pays; z-ordering or
    * sorting by `m` closes it.
    *
    * One pass computes both sides: per-block stats AND the true match
    * count fold into the same groupBy, then a single-row finish. */
  def zonePruneAudit(df: DataFrame, blockKey: Column, measure: Column,
      blockSize: Long, lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"lo=$lo must be <= hi=$hi")
    val stats = df
      .select(blockKey.cast("long").as("k"), measure.cast("long").as("m"))
      .select(expr(s"k DIV ${blockSize}L").as("blk"), col("m"))
      .groupBy("blk")
      .agg(count(lit(1)).as("n_rows"), min(col("m")).as("min_m"),
        max(col("m")).as("max_m"),
        sum(when(col("m") >= lo && col("m") <= hi, 1L).otherwise(0L))
          .as("n_match"))
    stats.agg(
        count(lit(1)).as("blocks_total"),
        sum(col("n_rows")).as("rows_total"),
        sum(when(col("max_m") < lo || col("min_m") > hi, 1L).otherwise(0L))
          .as("blocks_pruned"),
        sum(when(col("max_m") < lo || col("min_m") > hi, col("n_rows"))
          .otherwise(lit(0L))).as("rows_pruned"),
        sum(col("n_match")).as("rows_match"))
      .select(col("blocks_total"), col("rows_total"), col("blocks_pruned"),
        col("rows_pruned"), col("rows_match"),
        // empty input → rows_total 0/NULL: ppm columns short-circuit to
        // NULL rather than riding a zero denominator into ANSI error
        expr("CASE WHEN coalesce(rows_total, 0L) = 0L THEN CAST(NULL AS BIGINT) " +
          "ELSE rows_pruned * 1000000L DIV rows_total END").as("pruned_rows_ppm"),
        expr("CASE WHEN coalesce(rows_total, 0L) = 0L THEN CAST(NULL AS BIGINT) " +
          "ELSE rows_match * 1000000L DIV rows_total END").as("match_ppm"))
  }

  /** Partition-completeness audit: per key, every DAY between the key's
    * first and last event should exist as a partition — report the span,
    * what's present, what's missing, and WHERE the first hole is. The
    * backfill-planning primitive a 100 TB ingestion runs nightly: a
    * missing day is a silent correctness bug in every downstream
    * windowed aggregate, and the first-gap date is the backfill cursor.
    *
    * 100 TB posture: the fact collapses to (key, day) at one partial-
    * aggregated groupBy; the expected-day explode runs per KEY and is
    * bounded by that key's calendar span (a 10-year key emits 3,653
    * rows, independent of row volume); the gap finder is an anti-join
    * at day cardinality. Output: (key, span_days, present_days,
    * missing_days, first_missing date|null). */
  def partitionGaps(df: DataFrame, key: Column, ts: Column): DataFrame = {
    val obs = df.select(key.as("k"), to_date(ts).as("day"))
      .groupBy("k", "day").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val bounds = obs.groupBy("k")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"),
        count(lit(1)).as("present_days"))
    val missing = bounds
      .select(col("k"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .join(obs.select("k", "day"), Seq("k", "day"), "left_anti")
      .groupBy("k").agg(min(col("day")).as("first_missing"))
    bounds
      .select(col("k").as("key"),
        (datediff(col("d1"), col("d0")) + 1).cast("long").as("span_days"),
        col("present_days"))
      .withColumn("missing_days", col("span_days") - col("present_days"))
      .join(missing.select(col("k").as("key"), col("first_missing")),
        Seq("key"), "left")
  }
}
