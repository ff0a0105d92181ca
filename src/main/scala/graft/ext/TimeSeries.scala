package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over an event fact: resample each key's
  * irregular observations onto a fixed hourly grid, then fill the gaps —
  * last-observation-carried-forward ([[locfGrid]]) and linear
  * interpolation ([[lerpGrid]]). The feature-engineering step that turns
  * an event log into fixed-step model inputs (and the batch analog of the
  * reference's periodic day-so-far recompute, StreamTest.cpp:830-944,
  * which re-reads a stream's history onto a wall-clock cadence).
  *
  * Float discipline: the filled value is a RAW double carried from one
  * chosen observation (LOCF) or one lerp whose operand order is fixed and
  * mirrored verbatim in the oracle SQL — no double SUMs anywhere, so
  * results are bit-stable under any partitioning.
  *
  * 100 TB posture: everything is partitioned per key — the per-(key,hour)
  * last-event election, the grid explode (replication = the key's active
  * hour span, never the table width), and the fill windows all ride
  * hash(key) exchanges; there is no global window and no driver loop. A
  * key's whole timeline must fit one task (same contract as any
  * per-entity window op, e.g. x108's inter-arrival gaps).
  */
object TimeSeries {

  /** One observation per (key, hour): the value of the LAST event in
    * that hour (latest `ts`, event id as the deterministic tiebreak),
    * plus that event's exact microsecond time (the lerp anchor).
    * Output: (user_id, h timestamp, us bigint, v double). */
  def hourlyLast(events: DataFrame, key: Column, ts: Column, id: Column,
      value: Column): DataFrame = {
    val e = events.select(key.as("user_id"), date_trunc("hour", ts).as("h"),
      unix_micros(ts).as("us"), id.as("eid"), value.as("v"))
    val w = Window.partitionBy(col("user_id"), col("h"))
      .orderBy(col("us").desc, col("eid").desc)
    e.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("h"), col("us"), col("v"))
  }

  /** The dense hourly grid per key: every hour from the key's first
    * observed hour to its last, left-joined with [[hourlyLast]]'s
    * observations. Output: (user_id, h, us, v) with null (us, v) on gap
    * hours. The explode is per key — a 30-day-active key emits 720 rows
    * regardless of corpus size. */
  def hourlyGrid(obs: DataFrame): DataFrame = {
    val bounds = obs.groupBy("user_id")
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val grid = bounds.select(col("user_id"),
      explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    grid.join(obs, Seq("user_id", "h"), "left")
  }

  /** Last-observation-carried-forward on the hourly grid: each gap hour
    * takes the most recent earlier observation's value. Output:
    * (user_id, h, v_locf double, observed int), `observed` = 1 on hours
    * that had an event. The fill is one per-key running `last(ignoreNulls)`
    * window — no self-join, no as-of lookup. */
  def locfGrid(events: DataFrame, key: Column, ts: Column, id: Column,
      value: Column): DataFrame = {
    val g = hourlyGrid(hourlyLast(events, key, ts, id, value))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("v_locf", last(col("v"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("h"), col("v_locf"),
        when(col("v").isNotNull, 1).otherwise(0).cast("int").as("observed"))
  }

  /** Linear interpolation at the grid points: each gap hour h takes
    * `v_prev + (v_next - v_prev) * ((h - t_prev) / (t_next - t_prev))`
    * between its neighboring observations (times in raw microseconds);
    * observed hours pass their own value through; leading/trailing gap
    * hours (no neighbor on one side) are DROPPED. The operand order of
    * the lerp is part of the contract — the oracle mirrors it verbatim,
    * so the doubles are bit-identical. Two backward and two forward
    * per-key running windows, nothing global. */
  def lerpGrid(events: DataFrame, key: Column, ts: Column, id: Column,
      value: Column): DataFrame = {
    val g = hourlyGrid(hourlyLast(events, key, ts, id, value))
    val back = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward neighbor as a RUNNING window over h DESC: semantically
    // `first(ignoreNulls)` over (currentRow, unboundedFollowing), but an
    // UnboundedFollowing frame makes WindowExec recompute the aggregate
    // per row — O(rows²) per key (measured 43 s vs 2 s at sf0.1); the
    // reversed running frame is the O(rows) incremental path
    val fwd = Window.partitionBy(col("user_id")).orderBy(col("h").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("t_prev", last(col("us"), ignoreNulls = true).over(back))
      .withColumn("v_prev", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("t_next", last(col("us"), ignoreNulls = true).over(fwd))
      .withColumn("v_next", last(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("v_lerp",
        when(col("v").isNotNull, col("v"))
          .otherwise(col("v_prev") + (col("v_next") - col("v_prev")) *
            ((unix_micros(col("h")) - col("t_prev")).cast("double") /
              (col("t_next") - col("t_prev")).cast("double"))))
      .where(col("v_lerp").isNotNull)
      .select(col("user_id"), col("h"), col("v_lerp"),
        when(col("v").isNotNull, 1).otherwise(0).cast("int").as("observed"))
  }

  /** Finite-history EWMA over each key's LAST `taps` observations
    * (newest first, weight 2^(taps−1−i) for the i-th most recent): the
    * exact integer form `num div den` with `den = 2^taps − 2^(taps−k)`
    * for a key with k <= taps observations — equivalent to α=1/2
    * exponential smoothing truncated to a fixed window, which is what
    * makes it BOTH engine-reproducible (no float power chain) and
    * scale-safe (per-key state is `taps` rows, not history).
    *
    * Plan: one key-partitioned rank window (newest-first), a `taps`
    * cut, one combinable weighted-sum groupBy. The weighted numerator
    * rides DECIMAL(38,0) — the per-row product m·2^(taps−rn) passes
    * 2^63 already at |m| ≥ 4 with taps near the cap, so the int64 form
    * silently wrapped; the weight itself (≤ 2^61) and the quotient
    * (≤ max|m|) both fit BIGINT, so only the accumulator widens and the
    * output schema is unchanged. The smoothed level vs the latest raw
    * value is the per-key trend signal.
    * Output: (key, k_used, ewma_m, last_m). */
  def ewmaLast(df: DataFrame, key: Column, ts: Column, order: Column,
      measure: Column, taps: Int): DataFrame = {
    require(taps >= 1 && taps <= 62, s"taps=$taps must be in [1, 62]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("tus").desc, col("ord").desc)
    df.select(key.as("key"), unix_micros(ts).as("tus"), order.as("ord"),
        measure.cast("long").as("m"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= taps)
      .groupBy("key")
      .agg(count(lit(1)).as("k_used"),
        sum(expr(
          s"CAST(m AS DECIMAL(38,0)) * CAST(shiftleft(1L, $taps - rn) AS DECIMAL(38,0))"))
          .as("num"),
        max(when(col("rn") === 1, col("m"))).as("last_m"))
      .select(col("key"), col("k_used"),
        expr(s"CAST(num DIV (shiftleft(1L, $taps) - shiftleft(1L, $taps - k_used)) AS BIGINT)")
          .as("ewma_m"),
        col("last_m"))
  }

  /** Per-key least-squares trend slope over an integer series, in EXACT
    * rational form: `slope_e6 = (n·Σxy − Σx·Σy)·1e6 div (n·Σx² − (Σx)²)`
    * — the regression slope scaled to ppm, computed entirely in
    * DECIMAL(38) sums so any engine reproduces it bit-for-bit (a
    * float `regr_slope` never could). Callers pass the series already
    * aggregated to one row per (key, x).
    *
    * One combinable groupBy; a key with a degenerate x-spread (single
    * point — zero denominator) reports NULL rather than dividing.
    * Output: (key, n, sum_y, slope_e6). */
  def trendSlope(df: DataFrame, key: Column, x: Column, y: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    df.select(key.as("key"), x.cast("long").as("x"), y.cast("long").as("y"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
      .select(col("key"), col("n"), col("sy").cast("long").as("sum_y"),
        expr("""CASE WHEN CAST(n AS DECIMAL(38,0)) * sxx - sx * sx = 0 THEN NULL
                ELSE CAST((CAST(n AS DECIMAL(38,0)) * sxy - sx * sy) * 1000000
                     DIV (CAST(n AS DECIMAL(38,0)) * sxx - sx * sx) AS BIGINT)
                END""").as("slope_e6"))
  }

  /** CUSUM changepoint screen per key: with per-x deviations scaled to
    * integers as `dev = n·y − Σy` (so the mean-centering is EXACT — no
    * rational mean), the running cumulative sum's peak |CUSUM| position
    * is the classic single-changepoint estimate. A series that drifts
    * shows a sharp peak; a stable one hovers near zero.
    *
    * Plan: one combinable totals groupBy broadcast back, one
    * key-partitioned running window, one key-partitioned rank to take
    * the peak (earliest x on ties — deterministic). DECIMAL(38)
    * accumulators (envelope: n·Σ|y| < 10^38).
    * Output: (key, n, peak_x, peak_cusum). */
  def cusumPeak(df: DataFrame, key: Column, x: Column, y: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("x"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(abs(col("cusum")).desc, col("x"))
    val d = df.select(key.as("key"), x.cast("long").as("x"),
      y.cast("long").as("y"))
    val totals = d.groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("y").cast(DecimalType(38, 0))).as("total"))
    d.join(broadcast(totals), Seq("key"))
      .withColumn("dev",
        col("n") * col("y").cast(DecimalType(38, 0)) - col("total"))
      .withColumn("cusum", sum(col("dev")).over(w))
      .withColumn("rn", row_number().over(rw))
      .where(col("rn") === 1)
      .select(col("key"), col("n"), col("x").as("peak_x"),
        col("cusum").cast("long").as("peak_cusum"))
  }

  /** SCD TYPE-2 interval build from a change-event stream: per key,
    * collapse consecutive events carrying the SAME value (only real
    * transitions mint versions), then stamp each surviving version with
    * `[valid_from, valid_to)` — `valid_to` is the next version's start,
    * NULL on the current (open) version — and a 1-based version number.
    * The dimension-history primitive every warehouse maintains; the
    * as-of join ([[graft.ops.AsofJoin]]) is its read side.
    *
    * Determinism: ties on `ts` break by the event-id order column, so
    * the interval set is a pure function of the input. 100 TB posture:
    * three per-KEY windows (lag to detect the transition, lead for the
    * close, rank for the version) on ONE hash(key) exchange — Spark
    * reuses the partitioning across same-keyed windows; nothing global,
    * no self-join (the lag/lead formulation replaces the naive
    * event×next-event range join).
    * Output: (key, version, value, valid_from, valid_to). */
  def scd2Intervals(events: DataFrame, key: Column, ts: Column,
      order: Column, value: Column): DataFrame = {
    val byTime = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("vf"), col("ord"))
    val d = events.select(key.as("key"), ts.as("vf"), order.as("ord"),
      value.as("value"))
    d.withColumn("prev", lag(col("value"), 1).over(byTime))
      // first event per key opens version 1; later events only on change
      .where(col("prev").isNull || col("prev") =!= col("value"))
      .withColumn("valid_to", lead(col("vf"), 1).over(byTime))
      .withColumn("version", row_number().over(byTime).cast("long"))
      .select(col("key"), col("version"), col("value"),
        col("vf").as("valid_from"), col("valid_to"))
  }

  /** Rank (Spearman) autocorrelation of each key's daily series at the
    * given lags — "does yesterday/last week predict today" with an
    * EXACT RATIONAL answer: `spearman_e6 = 1e6 − 6e6·Σd² / (n(n²−1))`
    * over row_number ranks, so no float moments and no square root
    * (Pearson's √(ΣxΣy) denominator is irrational — hash-unprovable;
    * rank correlation is the drop-in monotone-association measure that
    * stays in integer arithmetic). Ranks tie-break by day — documented,
    * deterministic, and mirrored in the oracle; with cent-valued
    * revenues ties are rare and the bias negligible.
    *
    * Lag semantics: POSITION lag on the observed sequence (rn+lag on
    * the present days), not calendar lag — gaps drop no pairs and the
    * measure stays defined on sparse series; callers wanting strict
    * calendar lags densify with [[locfGrid]] first.
    *
    * 100 TB posture: the daily rollup is the ONLY data-scale exchange;
    * after it the series is DAYS long — O(days) per key regardless of
    * corpus row count — so the lag self-join and the four keyed
    * windows all run at day cardinality. Σd² ≤ n³ and the e6 products
    * ride DECIMAL(38); n is calendar-bounded, so nothing here grows
    * with the 100 TB. Output: (key, lag, n_pairs, sum_d2, spearman_e6)
    * for keys·lags with ≥ 2 pairs. */
  /** Rolling z-score anomaly with EXACT integer math: flag day t when
    * its value deviates from the TRAILING window's mean by more than
    * `c` standard deviations — without ever forming a float mean or
    * variance. With n = trailing rows, s = Σv, ss = Σv²:
    * `z² = (n·x − s)² / (n·ss − s²)`, so the flag is the integer
    * comparison `(n·x − s)² > c²·(n·ss − s²)` in DECIMAL(38) — the
    * control-chart / [[cusumPeak]] companion that reacts to single-day
    * spikes instead of sustained shifts. The frame ends at 1 PRECEDING:
    * a day never judges itself. Emits BOTH sides of the comparison
    * (z2_num, z2_den), so the margin is auditable without floats.
    *
    * 100 TB posture: one daily rollup is the only data-scale exchange;
    * the trailing-window sums are per-key windows at day cardinality
    * (calendar-bounded). Output: flagged days only —
    * (key, day, v, n_win, z2_num, z2_den). */
  def rollingZscore(df: DataFrame, key: Column, day: Column,
      measure: Column, win: Int, c: Int, minN: Int = 8): DataFrame = {
    require(win >= 2 && win <= 365, s"win=$win out of range")
    require(c >= 1 && minN >= 2 && minN <= win,
      s"c=$c / minN=$minN out of range")
    val daily = df.groupBy(key.as("key"), day.as("day"))
      .agg(sum(measure).as("v"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(-win, -1)
    daily
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("s", sum(col("v")).over(w))
      .withColumn("ss",
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).over(w))
      .where(col("n_win") >= minN)
      .withColumn("z2_num",
        expr("CAST((CAST(n_win AS DECIMAL(38,0)) * v - s) " +
          "* (CAST(n_win AS DECIMAL(38,0)) * v - s) AS DECIMAL(38,0))"))
      .withColumn("z2_den",
        expr("CAST(CAST(n_win AS DECIMAL(38,0)) * ss " +
          "- CAST(s AS DECIMAL(38,0)) * s AS DECIMAL(38,0))"))
      .where(expr(s"z2_num > ${c.toLong * c} * z2_den"))
      .select(col("key"), col("day"), col("v"), col("n_win"),
        col("z2_num").cast("string").as("z2_num"),
        col("z2_den").cast("string").as("z2_den"))
  }

  def rankAutocorr(df: DataFrame, key: Column, day: Column,
      measure: Column, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(l => l >= 1 && l <= 365),
      s"lags=$lags must be within [1, 365]")
    val daily = df.groupBy(key.as("key"), day.as("day"))
      .agg(sum(measure).as("v"))
    val wk = Window.partitionBy(col("key")).orderBy(col("day"))
    val seq0 = daily.withColumn("rn", row_number().over(wk))
      .localCheckpoint(false) // one rollup, |lags| self-join consumers
    val pairs = lags.map { l =>
      seq0.as("a").join(seq0.as("b"),
          col("a.key") === col("b.key") && col("b.rn") === col("a.rn") + l)
        .select(col("a.key").as("key"), lit(l.toLong).as("lag"),
          col("a.day").as("day_a"), col("a.v").as("va"),
          col("b.day").as("day_b"), col("b.v").as("vb"))
    }.reduce(_.unionAll(_))
    val wx = Window.partitionBy(col("key"), col("lag"))
      .orderBy(col("va"), col("day_a"))
    val wy = Window.partitionBy(col("key"), col("lag"))
      .orderBy(col("vb"), col("day_b"))
    pairs
      .withColumn("rx", row_number().over(wx).cast("long"))
      .withColumn("ry", row_number().over(wy).cast("long"))
      .groupBy("key", "lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("rx") - col("ry")) * (col("rx") - col("ry"))).as("sum_d2"))
      .where(col("n_pairs") >= 2)
      .select(col("key"), col("lag"), col("n_pairs"), col("sum_d2"),
        expr("CAST(1000000 - CAST(6000000 AS DECIMAL(38,0)) * sum_d2 " +
          "DIV (CAST(n_pairs AS DECIMAL(38,0)) * (n_pairs * n_pairs - 1)) " +
          "AS BIGINT)").as("spearman_e6"))
  }

  /** Burstiness (index of dispersion) per key: the variance-to-mean
    * ratio of the key's daily event counts over its own [first, last]
    * day SPAN — the Poisson test (VMR ≈ 1e6 ⇒ memoryless arrivals;
    * ≫ 1e6 ⇒ bursts, the traffic that breaks provisioned-by-average
    * capacity). Days with zero events count toward the span (they
    * contribute 0 to both Σc and Σc², so only the span length `n` is
    * needed — no calendar explode, no spine join):
    * `vmr_ppm = (n·Σc² − (Σc)²)·1e6 div ((n−1)·Σc)` — sample variance
    * over mean, exact by integer cross-multiplication; Cauchy–Schwarz
    * over the zero-padded span keeps the numerator ≥ 0. NULL for
    * single-day spans or empty keys ([[covMatrix]]'s guard discipline).
    *
    * 100 TB posture: one combinable (key, day) rollup — the only
    * data-scale exchange — then a |keys×days|-row aggregate with
    * DECIMAL(38) Σc² (daily counts at the design point square past
    * 2^63). No window, no join, no explode. */
  def burstiness(df: DataFrame, key: Column, ts: Column): DataFrame = {
    val daily = df.select(key.as("k"), to_date(ts).as("day"))
      .groupBy("k", "day").agg(count(lit(1)).as("c"))
    daily.groupBy("k")
      .agg((datediff(max(col("day")), min(col("day"))) + 1).cast("long")
          .as("span_days"),
        sum(col("c")).as("s"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("q"),
        count(lit(1)).as("active_days"))
      .withColumn("vmr_ppm",
        when(col("span_days") >= 2 && col("s") > 0,
          expr("CAST((span_days * q - CAST(s AS DECIMAL(38,0)) * s) " +
            "* 1000000 DIV ((span_days - 1) * s) AS BIGINT)"))
          .otherwise(lit(null).cast("long")))
      .withColumn("overdispersed",
        when(col("vmr_ppm") > 1000000L, 1).otherwise(0).cast("int"))
      .select("k", "span_days", "active_days", "s", "vmr_ppm",
        "overdispersed")
  }

  /** Max concurrent open intervals per key — the classic sweep-line,
    * distributed: each interval [st, en) mints a +1 event at `st` and a
    * −1 at `en`, and the peak of the per-key running sum is the key's
    * maximum simultaneous load (open orders in flight per supplier, or
    * the executor count a backfill of this key's history would need).
    *
    * Determinism under ties: the running sum is ordered by (t, d) with
    * d = −1 before +1, so an interval ending exactly when another
    * starts is NOT concurrent with it (half-open semantics). Ties
    * within the same (t, d) group all carry the same delta, so the SET
    * of running-sum values across the group — and therefore the peak
    * and the peak's timestamp — is order-independent; no per-row id
    * tiebreak is needed for the aggregate to be exact.
    *
    * 100 TB posture: the event stream is 2 rows per interval; the one
    * window is keyed (never global), so a key's history must fit one
    * task — the same per-entity contract as every window op here. The
    * rollup after it is combinable. Output: (k, n_iv, max_open,
    * peak_us — the EARLIEST microsecond the peak is reached). */
  def maxConcurrency(iv: DataFrame, key: Column, start: Column,
      end: Column): DataFrame = {
    val base = iv.select(key.as("k"), unix_micros(start).as("st"),
        unix_micros(end).as("en"))
      .where(col("en") > col("st"))
    // both sweep events (open +1 at start, close −1 at end) explode
    // from ONE pass over the scan (round 18) — the two-arm union
    // embedded the scan + projection under both arms
    val ev = base.select(col("k"), explode(array(
        struct(col("st").as("t"), lit(1L).as("d")),
        struct(col("en").as("t"), lit(-1L).as("d")))).as("e"))
      .select(col("k"), col("e.t").as("t"), col("e.d").as("d"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("open", sum(col("d")).over(w))
      .groupBy("k")
      .agg(expr("count(1) DIV 2").as("n_iv"),
        max(col("open")).as("max_open"),
        max(struct(col("open"), (-col("t")).as("nt"))).as("__pk"))
      .select(col("k"), col("n_iv"), col("max_open"),
        (-col("__pk.nt")).as("peak_us"))
  }

  /** Single best level-shift day per key — binary segmentation's first
    * split over the daily count series: the position i whose two-segment
    * fit maximizes Σc²-explained, exactly. For prefix sum S_i of n days
    * totalling S, the candidate gain over the no-split baseline is
    *
    *   gain_e6(i) = (S_i²(n−i) + (S−S_i)²·i)·1e6 DIV (i(n−i))
    *                − S²·1e6 DIV n
    *
    * — one truncating DIV per candidate, mirrored by the oracle, so the
    * argmax is deterministic on any engine (ties → earliest day via the
    * (gain, −i) struct max; payload fields ride behind the unique −i).
    *
    * 100 TB posture: one data-scale exchange (the daily rollup); the
    * cumulative window, per-key totals, and candidate scan are all
    * DAY-cardinality (O(days) per key at any corpus size). Keys with
    * fewer than 2 active days have no candidate and drop out (same
    * contract as burstiness's NULL). Output: (k, n_days, split_day —
    * the LAST day of the left segment, gain_e6, mean_left, mean_right
    * — floor daily means). */
  def changepoint(df: DataFrame, key: Column, ts: Column): DataFrame = {
    val daily = df.select(key.as("k"), to_date(ts).as("day"))
      .groupBy("k", "day").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    val cum = daily
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("s",
        sum(col("c")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    // counts are ≥1 so the running sum is strictly increasing: max(s)
    // IS the key total, max(i) the day count — one tiny rollup
    val tot = cum.groupBy("k")
      .agg(max(col("i")).as("n"), max(col("s")).as("stot"))
    cum.join(broadcast(tot), Seq("k"))
      .where(col("i") < col("n"))
      .withColumn("gain",
        expr("(CAST(s AS DECIMAL(38,0)) * s * (n - i) " +
          "+ CAST(stot - s AS DECIMAL(38,0)) * (stot - s) * i) * 1000000 " +
          "DIV (i * (n - i)) " +
          "- CAST(stot AS DECIMAL(38,0)) * stot * 1000000 DIV n"))
      .withColumn("ml", expr("s DIV i"))
      .withColumn("mr", expr("(stot - s) DIV (n - i)"))
      .groupBy("k", "n")
      .agg(max(struct(col("gain"), (-col("i")).as("ni"), col("day"),
        col("ml"), col("mr"))).as("__b"))
      .select(col("k"), col("n").as("n_days"),
        col("__b.day").as("split_day"),
        expr("CAST(__b.gain AS BIGINT)").as("gain_e6"),
        col("__b.ml").as("mean_left"), col("__b.mr").as("mean_right"))
  }

  /** Wald–Wolfowitz runs test on each key's daily up/down sequence —
    * "is this series RANDOM, or does it trend/oscillate?" — the
    * memoryless complement to x181's rank autocorrelation. Day-over-day
    * deltas become signs (ties dropped, the standard treatment); R =
    * observed runs over n = n₊ + n₋ retained signs; with a = 2n₊n₋ the
    * squared z-score is rational:
    *
    *   z² = (R·n − n − a)²·(n−1) / (a·(a−n))     (NULL when a ≤ n)
    *
    * z² ≫ 3.84 with R low = trending (too few runs), R high =
    * oscillating. Exact ppm, one DIV per key.
    *
    * 100 TB posture: after the daily rollup everything is
    * day-cardinality: two keyed windows (delta sign, then
    * previous-retained-sign) and one combinable rollup.
    * Output: (k, n_signs, n_up, n_down, runs, z2_ppm, nonrandom). */
  def runsTest(df: DataFrame, key: Column, ts: Column): DataFrame = {
    val daily = df.select(key.as("k"), to_date(ts).as("day"))
      .groupBy("k", "day").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    val signs = daily
      .withColumn("sgn",
        when(col("c") > lag(col("c"), 1).over(w), 1L)
          .when(col("c") < lag(col("c"), 1).over(w), -1L))
      .where(col("sgn").isNotNull)
    signs
      .withColumn("chg",
        when(lag(col("sgn"), 1).over(w).isNull, 0L)
          .when(col("sgn") =!= lag(col("sgn"), 1).over(w), 1L)
          .otherwise(0L))
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(when(col("sgn") === 1L, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("sgn") === -1L, 1L).otherwise(0L)).as("n_down"),
        (sum(col("chg")) + 1L).as("runs"))
      .withColumn("z2_ppm",
        expr("CASE WHEN n >= 2 AND 2 * n_up * n_down > n THEN " +
          "CAST((CAST(runs * n - n - 2 * n_up * n_down AS DECIMAL(38,0)) " +
          "* (runs * n - n - 2 * n_up * n_down) * (n - 1)) * 1000000 " +
          "DIV (CAST(2 * n_up * n_down AS DECIMAL(38,0)) " +
          "* (2 * n_up * n_down - n)) AS BIGINT) ELSE NULL END"))
      .withColumn("nonrandom",
        when(col("z2_ppm") > 3841459L, 1).otherwise(0).cast("int"))
      .select("k", "n", "n_up", "n_down", "runs", "z2_ppm", "nonrandom")
      .withColumnRenamed("n", "n_signs")
  }

  /** Naive-forecast backtest per key: WAPE (Σ|error|·1e6 DIV Σactual —
    * the scale-free accuracy number that, unlike MAPE, never divides by
    * a zero-count day) of the two baselines every real forecaster must
    * beat — persistence (yesterday's count) and seasonal-naive (the
    * count 7 observations back). Both models are scored on the SAME
    * eval rows (positions > 7, so both lags exist); keys with fewer
    * than 8 active days drop out. Position lag on the observed
    * sequence, the x181 convention.
    *
    * 100 TB posture: one data-scale exchange (the daily rollup), one
    * keyed lag window over day-cardinality rows, one combinable
    * rollup. Output: (k, n_eval, wape1_ppm, wape7_ppm, winner). */
  def wapeBacktest(df: DataFrame, key: Column, ts: Column): DataFrame = {
    val daily = df.select(key.as("k"), to_date(ts).as("day"))
      .groupBy("k", "day").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    daily
      .withColumn("l1", lag(col("c"), 1).over(w))
      .withColumn("l7", lag(col("c"), 7).over(w))
      .where(col("l7").isNotNull)
      .groupBy("k")
      .agg(count(lit(1)).as("n_eval"), sum(col("c")).as("sa"),
        sum(abs(col("c") - col("l1"))).as("e1"),
        sum(abs(col("c") - col("l7"))).as("e7"))
      .select(col("k"), col("n_eval"),
        expr("e1 * 1000000L DIV sa").as("wape1_ppm"),
        expr("e7 * 1000000L DIV sa").as("wape7_ppm"))
      .withColumn("winner",
        when(col("wape7_ppm") < col("wape1_ppm"), "naive7")
          .otherwise("naive1"))
  }

  /** Mann–Kendall trend test + Sen slope per key — the standard
    * NONPARAMETRIC trend pairing (x150's exact OLS slope assumes
    * linear-in-time Gaussian noise; this assumes nothing): S = Σ_{i<j}
    * sign(c_j − c_i) over all day pairs, the tie-corrected variance
    * ×18 is the integer n(n−1)(2n+5) − Σ t(t−1)(2t+5), and the
    * continuity-corrected z² clears to
    *
    *   z²_ppm = (|S|−1)²·18·1e6 DIV varx18     (0 when |S| ≤ 1)
    *
    * `trend` = sign(S) when z² passes χ²₁ @ 95%. The Sen slope is the
    * lower median of the per-pair slopes, each e6-quantized as
    * (Δc·1e6 DIV Δdays) — a DOCUMENTED quantization (exact fraction
    * ordering needs cross-multiplication; the e6 grid is deterministic
    * on any engine and the median is taken over the quantized values).
    *
    * 100 TB posture: one data-scale exchange (the daily rollup); the
    * pair join is per-key DAY-cardinality² — bounded by the calendar,
    * not the corpus — with a loud plan-build refusal past `maxDays`
    * (the triangleStats contract: 5000 days → 12.5M pairs per key).
    * The median rides a keyed window over the pair table.
    * Output: (k, n_days, s_stat, z2_ppm, trend, sen_slope_e6). */
  def mannKendall(df: DataFrame, key: Column, ts: Column,
      maxDays: Int = 5000): DataFrame = {
    require(maxDays >= 2 && maxDays <= 100000, s"maxDays=$maxDays")
    val daily = df.select(key.as("k"), to_date(ts).as("day"))
      .groupBy("k", "day").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // pair join + tie table + refusal probe
    val widest = daily.groupBy("k").count()
      .agg(coalesce(max(col("count")), lit(0L))).head().getLong(0)
    require(widest <= maxDays,
      s"mannKendall enumerates days² pairs per key; the widest key has " +
        s"$widest active days > maxDays=$maxDays (${widest * widest / 2} " +
        s"pairs). Narrow the window, pre-aggregate to weeks, or raise " +
        s"maxDays deliberately")
    val a = daily.select(col("k"), col("day").as("da"), col("c").as("ca"))
    val b = daily.select(col("k"), col("day").as("db"), col("c").as("cb"))
    val pairs = a.join(b, Seq("k")).where(col("da") < col("db"))
      .select(col("k"),
        signum(col("cb") - col("ca")).cast("long").as("sgn"),
        expr("(cb - ca) * 1000000 DIV datediff(db, da)").as("slope_e6"))
      .localCheckpoint(false) // S rollup + median window share one build
    val wm = Window.partitionBy(col("k")).orderBy(col("slope_e6"))
    val sen = pairs
      .withColumn("rn", row_number().over(wm).cast("long"))
      .join(broadcast(pairs.groupBy("k").agg(count(lit(1)).as("m"))),
        Seq("k"))
      .where(col("rn") === expr("(m + 1) DIV 2"))
      .select(col("k"), col("slope_e6").as("sen_slope_e6"))
    val ties = daily.groupBy("k", "c").agg(count(lit(1)).as("t"))
      .groupBy("k")
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tieterm"),
        sum(col("t")).as("n"))
    pairs.groupBy("k").agg(sum(col("sgn")).as("s_stat"))
      .join(broadcast(ties), Seq("k"))
      .withColumn("varx18",
        expr("n * (n - 1) * (2 * n + 5) - tieterm"))
      .withColumn("z2_ppm",
        expr("CASE WHEN varx18 > 0 THEN CASE WHEN abs(s_stat) <= 1 THEN 0L " +
          "ELSE CAST(CAST((abs(s_stat) - 1) AS DECIMAL(38,0)) " +
          "* (abs(s_stat) - 1) * 18 * 1000000 DIV varx18 AS BIGINT) END " +
          "ELSE NULL END"))
      .withColumn("trend",
        when(col("z2_ppm") > 3841459L,
          signum(col("s_stat")).cast("int")).otherwise(0).cast("int"))
      .join(broadcast(sen), Seq("k"))
      .select(col("k"), col("n").as("n_days"), col("s_stat"),
        col("z2_ppm"), col("trend"), col("sen_slope_e6"))
  }

  /** Kendall τ-b between two daily measures per key — the ORDINAL
    * association question ("do busier days earn more, monotonically?")
    * that Pearson-family covariance (x143/x219) answers only under
    * linearity. Over all day pairs: S = Σ sign(Δx)·sign(Δy); ties
    * correct the denominator via n₁ = Σ tₓ(tₓ−1)/2 and n₂ likewise.
    * τ-b itself needs a square root, so the hash-provable report is the
    * SIGNED SQUARE (the [[mannKendall]] z² discipline):
    *
    *   tau2_signed_ppm = sign(S)·S²·1e6 DIV ((n₀−n₁)(n₀−n₂))
    *
    * NULL when either measure is constant (denominator 0).
    *
    * Plan (the round-12 replan of the former days² pair join): one
    * daily rollup, a per-key dense_rank of the measure (order + tie
    * structure is all S needs, and ranks keep the aggregator state
    * pure longs), then [[graft.functions.KendallSAgg]] — Knight's
    * O(n log n) sort + merge-count of discordant pairs, computing S,
    * n₁, n₂ in one per-key traversal. Zero row amplification: the
    * rank window and the groupBy share the hash(k) exchange, state is
    * the ≤ days-per-key observations (calendar-bounded), and there is
    * no self-join anywhere in the plan (PlanAuditSpec-pinned).
    * `maxDays` is retained as the documented per-key state bound —
    * the aggregator buffer is O(active days), so a multi-year daily
    * series is ~thousands of longs, not days²/2 rows.
    * Output: (k, n_days, s_cd, tau2_signed_ppm). */
  def kendallTau(df: DataFrame, key: Column, ts: Column, cents: Column,
      maxDays: Int = 5000): DataFrame = {
    require(maxDays >= 2 && maxDays <= 100000, s"maxDays=$maxDays")
    val daily = df.select(key.as("k"), to_date(ts).as("day"),
        cents.cast("long").as("v"))
      .groupBy("k", "day")
      .agg(count(lit(1)).as("c"),
        sum(expr("CAST(v AS DECIMAL(38,0))")).as("m"))
    val ranked = daily.withColumn("rm",
      dense_rank().over(Window.partitionBy(col("k")).orderBy(col("m")))
        .cast("long"))
    val ks = udaf(new graft.functions.KendallSAgg(),
      org.apache.spark.sql.Encoders.product[graft.functions.CRank])
    ranked.groupBy("k").agg(ks(col("c"), col("rm")).as("ks"))
      .select(col("k"), col("ks.n").as("n"), col("ks.s_cd").as("s_cd"),
        col("ks.n1").as("n1"), col("ks.n2").as("n2"))
      .withColumn("n0", expr("n * (n - 1) DIV 2"))
      .withColumn("tau2_signed_ppm",
        expr("CASE WHEN (n0 - n1) > 0 AND (n0 - n2) > 0 THEN " +
          "CAST(signum(s_cd) AS BIGINT) * " +
          "CAST(CAST(s_cd AS DECIMAL(38,0)) * s_cd * 1000000 " +
          "DIV (CAST(n0 - n1 AS DECIMAL(38,0)) * (n0 - n2)) AS BIGINT) " +
          "ELSE NULL END"))
      .select(col("k"), col("n").as("n_days"), col("s_cd"),
        col("tau2_signed_ppm"))
  }

  /** Lead–lag covariance scan between two daily series: at every lag
    * ℓ ∈ [−maxLag, maxLag], the exact covariance of a(t) against
    * b(t−ℓ) over the days both exist — "does B move BEFORE A?" (the
    * incident-analysis question: do error spikes lead click drops?).
    * cov_e6 = (n·Σab − Σa·Σb)·1e6 DIV (n(n−1)) per lag; `is_best`
    * marks the |cov| argmax (ties → smaller |ℓ|, then smaller ℓ).
    * True cross-CORRELATION would divide by the two standard
    * deviations — a square root — so the scan compares covariances,
    * which share the same units across lags on a fixed pair; the
    * documented, hash-provable contract.
    *
    * 100 TB posture: two daily rollups (the only data-scale
    * exchanges), then a day-cardinality × (2·maxLag+1) spine — the
    * scan cost is calendar-bound, never corpus-bound.
    * Output: one row per lag (lag, n_days, cov_e6, is_best). */
  def leadLag(dfA: DataFrame, tsA: Column, dfB: DataFrame, tsB: Column,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 60, s"maxLag=$maxLag out of range")
    val spark = dfA.sparkSession
    import spark.implicits._
    val da = dfA.select(to_date(tsA).as("day"))
      .groupBy("day").agg(count(lit(1)).as("a"))
    val db = dfB.select(to_date(tsB).as("day"))
      .groupBy("day").agg(count(lit(1)).as("b"))
    val lags = broadcast((-maxLag to maxLag).map(_.toLong).toDF("lag"))
    val g = da.join(
        db.crossJoin(lags)
          .select(expr("date_add(day, CAST(lag AS INT))").as("day"),
            col("lag"), col("b")),
        Seq("day"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(a AS DECIMAL(38,0))")).as("sa"),
        sum(expr("CAST(b AS DECIMAL(38,0))")).as("sb"),
        sum(expr("CAST(a AS DECIMAL(38,0)) * b")).as("sab"))
      .withColumn("cov_e6",
        expr("CASE WHEN n >= 2 THEN CAST((n * sab - sa * sb) * 1000000 " +
          "DIV (n * CAST(n - 1 AS DECIMAL(38,0))) AS BIGINT) " +
          "ELSE NULL END"))
    val best = g.where(col("cov_e6").isNotNull)
      .agg(max(struct(abs(col("cov_e6")).as("ac"),
        (-abs(col("lag"))).as("nal"), (-col("lag")).as("nl"))).as("mx"))
    g.crossJoin(broadcast(best))
      .select(col("lag"), col("n").as("n_days"), col("cov_e6"),
        when(col("cov_e6").isNotNull &&
            abs(col("cov_e6")) === col("mx.ac") &&
            -abs(col("lag")) === col("mx.nal") &&
            -col("lag") === col("mx.nl"), 1)
          .otherwise(0).cast("int").as("is_best"))
  }

  /** Maximum drawdown of each key's DAILY level series against its
    * running peak — the monitoring question "how far below its
    * best-ever day has this stream fallen, and when was the worst?"
    * (a monotone cumulative series never draws down; the LEVEL series
    * does, which is what volume/revenue health checks watch).
    * dd_t = (runmax_t − y_t)·1e6 DIV runmax_t, exact integer per day;
    * the reported trough is the max-dd day with ties → earliest day.
    * Levels ride the DECIMAL(38) cent accumulator (daily cent sums pass
    * 2^63 at the design point — the x127 lesson), so peak/trough levels
    * ship as strings.
    *
    * 100 TB posture: ONE data-scale exchange (the per-(key, day)
    * rollup, combinable); the running max is a per-key window over
    * DAY-cardinality rows — calendar-bound, never corpus-bound — and
    * the final per-key fold is one combinable max(struct).
    * Output: (k, n_days, peak_cents, trough_cents, max_dd_ppm,
    * trough_day). */
  def maxDrawdown(df: DataFrame, key: Column, ts: Column,
      cents: Column): DataFrame = {
    val daily = df.select(key.as("k"), to_date(ts).as("day"),
        cents.cast("long").as("v"))
      .groupBy("k", "day")
      .agg(sum(expr("CAST(v AS DECIMAL(38,0))")).as("y"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("runmax", max(col("y")).over(w))
      .withColumn("dd_ppm",
        expr("CASE WHEN runmax > 0 THEN " +
          "CAST((runmax - y) * 1000000 DIV runmax AS BIGINT) ELSE 0L END"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_days"), max(col("runmax")).as("peak"),
        max(struct(col("dd_ppm"),
          (lit(0L) - unix_date(col("day")).cast("long")).as("negday"),
          col("y").as("ty"))).as("mx"))
      .select(col("k"), col("n_days"),
        col("peak").cast("string").as("peak_cents"),
        col("mx.ty").cast("string").as("trough_cents"),
        col("mx.dd_ppm").as("max_dd_ppm"),
        date_from_unix_date((lit(0L) - col("mx.negday")).cast("int"))
          .as("trough_day"))
  }

  /** PINBALL (quantile) LOSS of a trailing-window order-statistic
    * forecast: ŷ(t) = the rank-⌈q·7⌉ value of the previous 7 daily
    * counts (the repo's `(q·n+99) div 100` order-statistic convention,
    * [[graft.ext.Profile]] quantile family), scored with the loss that
    * makes quantile forecasts PROPER:
    * loss = q·(y−ŷ) when y ≥ ŷ, (1−q)·(ŷ−y) otherwise — in e6 both
    * branches are single integer products, so the whole backtest is
    * hash-exact. The counterpart of [[wapeBacktest]] for UPPER-quantile
    * capacity planning (a p75 forecast that keeps losing on the
    * under-side is too low, and pinball is what says so).
    *
    * 100 TB posture: one combinable daily rollup, then seven keyed lag
    * windows over calendar rows — never corpus-bound. Days without a
    * full 7-day history are excluded (n_eval says how many scored).
    * Output per key: (k, n_eval, pinball_sum_e6, pinball_mean_e6). */
  def pinballBacktest(df: DataFrame, key: Column, ts: Column,
      qPct: Int = 75): DataFrame = {
    require(qPct >= 1 && qPct <= 99, s"qPct=$qPct out of range")
    val rank = (qPct * 7 + 99) / 100 // 1-based order statistic over 7
    val daily = df.select(key.as("k"), to_date(ts).as("day"))
      .groupBy("k", "day").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    val lagged = (1 to 7).foldLeft(daily) { (d, i) =>
      d.withColumn(s"l$i", lag(col("c"), i).over(w))
    }
    lagged.where(col("l7").isNotNull)
      .withColumn("fc",
        expr(s"sort_array(array(l1, l2, l3, l4, l5, l6, l7))[${rank - 1}]"))
      .withColumn("loss_e6",
        expr(s"CASE WHEN c >= fc THEN ${qPct * 10000}L * (c - fc) " +
          s"ELSE ${(100 - qPct) * 10000}L * (fc - c) END"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_eval"),
        sum(col("loss_e6")).as("pinball_sum_e6"))
      .withColumn("pinball_mean_e6",
        expr("pinball_sum_e6 DIV n_eval"))
  }

  /** Longest / latest ACTIVE-DAY STREAKS via the islands-and-gaps
    * rank-difference idiom: a key's distinct active days, sorted, form
    * an island wherever `day − row_number` is constant — no self-join,
    * no iteration, ties impossible. Rolled up to the engagement-curve
    * histogram (how many keys peaked at an s-day streak) rather than
    * per-key rows, so the output is distribution-shaped like x96.
    *
    * 100 TB posture: distinct (key, day) collapses the event stream
    * scan-side (combinable); the islands window is per-key over
    * DAY-cardinality rows (calendar-bound); two combinable rollups
    * end it. Nothing wider than (key, day) ever shuffles.
    * Output: (longest_streak, n_keys, n_keys_ge) descending by
    * streak — n_keys_ge is the survival curve (keys whose longest
    * streak is ≥ this row's). */
  def streakHistogram(df: DataFrame, key: Column, ts: Column): DataFrame = {
    val days = df.select(key.as("k"), to_date(ts).as("day")).distinct()
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    val longest = days
      .withColumn("island",
        unix_date(col("day")).cast("long") - row_number().over(w))
      .groupBy("k", "island").agg(count(lit(1)).as("len"))
      .groupBy("k").agg(max(col("len")).as("longest"))
    val hist = longest.groupBy("longest")
      .agg(count(lit(1)).as("n_keys"))
    val ws = Window.orderBy(col("longest").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the survival cumsum runs over |distinct streak lengths| rows —
    // calendar-bound (≤ days in range), fine as a single window
    hist
      .withColumn("n_keys_ge", sum(col("n_keys")).over(ws))
      .select(col("longest").as("longest_streak"), col("n_keys"),
        col("n_keys_ge"))
  }
}
