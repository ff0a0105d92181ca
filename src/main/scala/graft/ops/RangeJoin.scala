package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed point-in-interval (range) join via bin bucketing.
  *
  * Spark has no native range-join operator: `p JOIN iv ON p.key = iv.key
  * AND p.t BETWEEN iv.start AND iv.end` plans the time predicates as
  * post-join filters, so every point meets every same-key interval —
  * quadratic in the hot keys, and with no equi-key at all it degrades to
  * a BroadcastNestedLoopJoin. Binning restores an equi-join: each point
  * maps to `floor(epoch(t)/bin)`, each interval explodes to the bins it
  * covers, the join runs on `(key, bin)`, and the exact `[start, end)`
  * predicate filters the residue. A point lands in exactly ONE bin, so
  * no post-join dedup is needed.
  *
  * 100 TB posture: one shuffle on (key, bin) — the same shape as any
  * equi-join — with interval replication bounded by `len/bin + 1`.
  * Choose `binSeconds` near the typical interval length: too small
  * replicates intervals, too large widens the residual filter's
  * candidate set. Degenerate giant intervals replicate proportionally —
  * cap interval length upstream the way the LSH family caps buckets.
  */
object RangeJoin {

  /** Join `points` rows to every `intervals` row of the same `key` with
    * `start <= t < end` (end-exclusive). Column sets must be disjoint
    * apart from `key`. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      key: String, t: String, start: String, end: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    // unix_timestamp truncates to seconds; truncation only ever moves a
    // value DOWN, so a point's bin always falls inside its matching
    // interval's covered-bin range — coverage is exact, not heuristic.
    val p = points.withColumn("__bin",
      floor(unix_timestamp(col(t)) / binSeconds))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        floor(unix_timestamp(col(start)) / binSeconds),
        floor(unix_timestamp(col(end)) / binSeconds))))
    p.join(iv, Seq(key, "__bin"))
      .where(col(t) >= col(start) && col(t) < col(end))
      .drop("__bin")
  }

  /** Keyed interval-overlap join: every (left, right) pair of the same
    * `key` whose half-open intervals `[lStart, lEnd)` and `[rStart,
    * rEnd)` overlap (`lStart < rEnd AND rStart < lEnd`). Column sets
    * must be disjoint apart from `key`.
    *
    * Both sides explode to their covered bins and equi-join on
    * `(key, bin)`. A pair spanning n shared bins would meet n times, so
    * each pair is claimed by exactly ONE bin — the bin holding the
    * overlap's start `max(lStart, rStart)`, which both intervals cover
    * whenever they overlap — making the output exact with no distinct/
    * dedup shuffle after the join. Same 100 TB posture as
    * [[pointInInterval]]: one (key, bin) shuffle, replication bounded
    * by `len/bin + 1` per side.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      key: String, lStart: String, lEnd: String,
      rStart: String, rEnd: String, binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    def binned(df: DataFrame, s: String, e: String) =
      df.withColumn("__bin", explode(sequence(
        floor(unix_timestamp(col(s)) / binSeconds),
        floor(unix_timestamp(col(e)) / binSeconds))))
    binned(left, lStart, lEnd)
      .join(binned(right, rStart, rEnd), Seq(key, "__bin"))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("__bin") === floor(
          greatest(unix_timestamp(col(lStart)), unix_timestamp(col(rStart)))
            / binSeconds))
      .drop("__bin")
  }
}
