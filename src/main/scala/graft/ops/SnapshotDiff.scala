package graft.ops

import org.apache.spark.sql.DataFrame
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
}
