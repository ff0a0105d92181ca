package graft.streaming

import java.time.{Instant, LocalDate, ZoneOffset}

import graft.model.DetectionEvent
import graft.ops.{DetectionRollup, FlowScore, ProgramRematch}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Structured-Streaming realization of the reference's three loops
  * (SURVEY.md §2.8, §3):
  *
  *  - E1 probe ingest (StreamTest.cpp:1059-1177): 25-stream micro-batches
  *    every 10 s → here a `readStream` of classified events appended to a
  *    date-partitioned fact store on a 10 s trigger (ST1). The
  *    fork/stop-flag/SIGKILL machinery is Spark's task scheduler.
  *  - E2 two-hourly rollup (StreamTest.cpp:830-944): recompute the UTC
  *    day-so-far from the store (ST3) — `rollupDaySoFar` is that exact
  *    batch-over-append-log pattern; `streamingDailyCounts` is the
  *    incremental watermark alternative (ST4/ST5).
  *  - E3 daily finalization (StreamTest.cpp:972-1047): score + rematch +
  *    upsert, gated by `isLastLoop` (StreamTest.cpp:47-70) — the
  *    "does the next wake cross UTC midnight" schedule test (ST4).
  *
  * 100 TB posture: the fact store is partitioned by `event_date`, so the
  * day-so-far recompute prunes to one partition; the rollup itself is the
  * single-shuffle `DetectionRollup` aggregate.
  */
/** Per-stream alert state for [[DetectionPipeline.statefulErrorAlerts]]. */
final case class AlertState(errors: Int, detections: Int, alerted: Boolean)

object DetectionPipeline {

  /** The reference's probe cadence (StreamTest.cpp:827-828). */
  val ProbeBatchSize = 25
  val ProbeTriggerSeconds = 10
  /** Report cadence, minutes (StreamTest.cpp:832). */
  val ReportCadenceMinutes = 120

  // ---- ST1: ingest ----

  /** Append a classified-event stream to a date-partitioned fact store.
    * Trigger matches the reference's 10 s batch duration. */
  def ingest(events: Dataset[DetectionEvent], factStorePath: String,
      checkpoint: String): StreamingQuery =
    events.toDF()
      .withColumn("event_date", to_date(col("created_time")))
      .writeStream
      .partitionBy("event_date")
      .format("parquet")
      .option("path", factStorePath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(s"$ProbeTriggerSeconds seconds"))
      .outputMode("append")
      .start()

  // ---- ST3: periodic day-so-far recompute (batch over the append log) ----

  /** The E2 rollup: filter the store to [day 00:00 UTC, now], roll up.
    * Partition pruning on `event_date` keeps this one-day-sized at any
    * total store size. */
  def rollupDaySoFar(spark: SparkSession, factStorePath: String,
      day: LocalDate, upTo: Instant): DataFrame = {
    val dayStart = day.atStartOfDay(ZoneOffset.UTC).toInstant
    val events = spark.read.parquet(factStorePath)
      .where(col("event_date") === lit(java.sql.Date.valueOf(day)) &&
        col("created_time") >= lit(java.sql.Timestamp.from(dayStart)) &&
        col("created_time") <= lit(java.sql.Timestamp.from(upTo)))
    DetectionRollup.rollup(events, col("created_time"))
  }

  // ---- ST4/ST5: incremental windowed alternative ----

  /** Watermarked 1-day tumbling counts per stream — the Spark-native
    * incremental form of the daily rollup (counts only; the full
    * first-non-empty rollup keeps the recompute form above). Watermark =
    * report cadence (SURVEY.md ST5; divergence documented there: the
    * reference tolerates unlimited intra-day lateness by recomputing). */
  def streamingDailyCounts(events: Dataset[DetectionEvent]): DataFrame =
    events.toDF()
      .withWatermark("created_time", s"$ReportCadenceMinutes minutes")
      .groupBy(window(col("created_time"), "1 day"), col("url_id"))
      .agg(
        sum(when(col("item") =!= 0, 1).otherwise(0)).cast("int").as("n_error"),
        count(lit(1)).cast("int").as("n_detection"))
      .select(col("window.start").as("day_start"), col("url_id"),
        col("n_error"), col("n_detection"))

  // ---- ST6: incremental per-stream state (alternative to recompute) ----

  /** Running (errors, detections) per stream via `mapGroupsWithState` —
    * the explicit-state alternative the reference rebuilds from scratch
    * each cycle (SURVEY ST6: stateless recompute is the default; this is
    * the incremental option for when re-reading the day is too costly).
    * State is a pair of counters per url_id; each micro-batch folds its
    * events into the state and emits the running totals. */
  def statefulRunningCounts(events: Dataset[DetectionEvent])
      : Dataset[(String, Int, Int)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupState
    events.groupByKey(_.url_id)
      .mapGroupsWithState[(Int, Int), (String, Int, Int)] {
        (urlId: String, batch: Iterator[DetectionEvent], state: GroupState[(Int, Int)]) =>
          val (e0, d0) = state.getOption.getOrElse((0, 0))
          var e = e0
          var d = d0
          batch.foreach { ev =>
            if (ev.item != 0) e += 1
            d += 1
          }
          state.update((e, d))
          (urlId, e, d)
      }
  }

  /** `flatMapGroupsWithState` twin of [[statefulRunningCounts]]: same
    * counters, but the state machine decides WHAT to emit — nothing
    * until a stream crosses `alertThreshold` errors, exactly one alert
    * row when it does (the reference's alert-once-per-day shape,
    * StreamTest.cpp:516-531, as incremental state instead of a daily
    * rebuild). Emits (url_id, n_error, n_detection) on the crossing
    * micro-batch only. */
  def statefulErrorAlerts(events: Dataset[DetectionEvent], alertThreshold: Int)
      : Dataset[(String, Int, Int)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.url_id)
      .flatMapGroupsWithState[AlertState, (String, Int, Int)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (urlId: String, batch: Iterator[DetectionEvent], state: GroupState[AlertState]) =>
          val s0 = state.getOption.getOrElse(AlertState(0, 0, alerted = false))
          var e = s0.errors
          var d = s0.detections
          batch.foreach { ev =>
            if (ev.item != 0) e += 1
            d += 1
          }
          val fire = !s0.alerted && e >= alertThreshold
          state.update(AlertState(e, d, s0.alerted || fire))
          if (fire) Iterator((urlId, e, d)) else Iterator.empty
      }
  }

  // ---- Stream-stream join (beyond-reference; ST family) ----

  /** Watermarked stream-stream interval join: each error event pairs
    * with click events of the same user within `lookbackSeconds` BEFORE
    * it. Both sides carry watermarks so Spark can bound the join state;
    * the interval condition (`click.ts BETWEEN error.ts - lookback AND
    * error.ts`) lets the state manager evict old rows. The streaming
    * analog of the as-of join (which picks only the latest match). */
  def errorClickJoin(errors: DataFrame, clicks: DataFrame,
      lookbackSeconds: Int, watermark: String = "2 minutes"): DataFrame = {
    val e = errors
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("err_ts"))
      .withWatermark("err_ts", watermark)
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    e.join(c,
      col("err_user") === col("click_user") &&
        col("click_ts") >= col("err_ts") - expr(s"INTERVAL $lookbackSeconds SECONDS") &&
        col("click_ts") <= col("err_ts"),
      "inner")
      .select(col("err_id"), col("err_user").as("user_id"),
        col("err_ts"), col("click_id"), col("click_ts"))
  }

  // ---- E3: daily finalization ----

  /** The reference's pre-midnight gate (StreamTest.cpp:47-70): true when
    * `now + waitMinutes` reaches/crosses the next UTC midnight. */
  def isLastLoop(now: Instant, waitMinutes: Int): Boolean = {
    val tomorrowZero = now.atZone(ZoneOffset.UTC).toLocalDate
      .plusDays(1).atStartOfDay(ZoneOffset.UTC).toInstant
    !now.plusSeconds(waitMinutes * 60L).isBefore(tomorrowZero)
  }

  /** Score + classify + rematch a day's rollup (E3 before the sinks). */
  def finalizeDay(rollup: DataFrame, programs: DataFrame): DataFrame =
    ProgramRematch.rematch(
      rollup.withColumn("flow_score",
        FlowScore.score(col("n_detection"), col("n_error"))),
      programs)

  // ---- S6: keyed partial-upsert sink ----

  /** Partial update of the catalog from finalized rollups: non-empty
    * update fields win, empty/null keep the existing value —
    * `resolution_type` and `flow_score` always write
    * (StreamTest.cpp:151-190). Expressed as a left-outer update-only
    * merge keyed on `id` (the reference UPDATE never inserts new ids),
    * usable both in batch and from `foreachBatch`. */
  def upsertCatalog(existing: DataFrame, updates: DataFrame): DataFrame = {
    val u = updates.select(
      col("url_id").as("id"),
      col("video_format").as("u_video_format"),
      col("video_resolution").as("u_video_resolution"),
      col("audio_format").as("u_audio_format"),
      col("audio_sampling_rate").as("u_audio_sampling_rate"),
      col("target_matching_id").as("u_target_matching_id"),
      col("flow_score").as("u_flow_score"),
      col("resolution_type").as("u_resolution_type"))
    def keep(existingCol: String, updateCol: String) =
      coalesce(nullif(col(updateCol), lit("")), col(existingCol)).as(existingCol)
    existing.join(u, Seq("id"), "left_outer")
      .select(
        col("id"), col("url"), col("target_matching"), col("is_del"),
        col("stream_type"),
        keep("video_format", "u_video_format"),
        keep("video_resolution", "u_video_resolution"),
        keep("audio_format", "u_audio_format"),
        keep("audio_sampling_rate", "u_audio_sampling_rate"),
        keep("target_matching_id", "u_target_matching_id"),
        // always written when an update row exists (StreamTest.cpp:168-170)
        coalesce(col("u_flow_score"), col("flow_score")).as("flow_score"),
        coalesce(col("u_resolution_type"), col("resolution_type")).as("resolution_type"))
  }

  /** Wire a stream of finalized rollups into an idempotent upsert +
    * report sink via foreachBatch (ST7: retries re-run the same batchId;
    * the merge is deterministic so the rewrite is idempotent). */
  def upsertWriter(finalized: DataFrame, existingCatalog: () => DataFrame,
      writeCatalog: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    finalized.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeCatalog(upsertCatalog(existingCatalog(), batch), batchId)
      }
}
