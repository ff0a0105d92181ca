package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch analog of Structured Streaming's
  * `session_window` (graft.streaming uses the built-in; this is the
  * historical-reprocessing twin over the same fact table, reference
  * StreamTest.cpp:830-944's day-so-far recompute generalized to
  * activity gaps).
  *
  * Shape: a session starts at any event whose distance to the previous
  * event of the SAME key EXCEEDS `gap` — an event landing exactly on the
  * expiry instant still merges, which is the built-in `session_window`'s
  * behavior (it merges whenever next.start <= prev.last + gap;
  * SessionizeEquivalenceSpec pins the two against each other, boundary
  * included). The session id is the running count of such starts per key
  * (lag + cumulative sum). Timestamps are compared in integer
  * microseconds (`unix_micros`) so engine and oracle do the same exact
  * arithmetic — no float, no interval semantics.
  *
  * 100 TB posture: ONE shuffle on the key; both windows and the final
  * per-session aggregate share that partitioning (the groupBy keys are a
  * superset of the window partition key, so Catalyst reuses the
  * exchange). Ties on the timestamp are totally ordered by `order` so a
  * retried stage yields the identical sessionization.
  */
object Sessionize {

  /** One row per (key, session): start/end, event count, exact duration
    * in whole seconds. `gapMicros` is the inactivity threshold. */
  /** Per-event session assignment: the input rows (plus any extra
    * columns `df` carries through via `extra`) stamped with their
    * (key, session_seq) — the building block [[sessionize]] aggregates
    * and basket mining consumes raw. Same one-exchange shape. */
  def assign(df: DataFrame, key: Column, ts: Column, order: Column,
      gapMicros: Long, extra: Seq[Column] = Seq.empty): DataFrame = {
    val base = df.select((Seq(key.as("key"), ts.as("ts"),
      unix_micros(ts).as("tus"), order.as("ord")) ++ extra): _*)
    val w = Window.partitionBy(col("key")).orderBy(col("tus"), col("ord"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("tus"), 1).over(w)
    base
      .withColumn("new_sess",
        when(col("tus") - coalesce(prev, lit(Long.MinValue / 2)) > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_sess")).over(run).cast("int"))
      .drop("new_sess")
  }

  def sessionize(df: DataFrame, key: Column, ts: Column, order: Column,
      gapMicros: Long): DataFrame = {
    assign(df, key, ts, order, gapMicros)
      .groupBy(col("key"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        ((max(col("tus")) - min(col("tus"))) / lit(1000000L))
          .cast("long").as("duration_secs"))
  }
}
