package graft.ops

import graft.model.ErrorCode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-stream daily rollup of detection events.
  *
  * Reference behavior (StreamTest.cpp:840-944): accumulate the current UTC
  * day's events per `url_id`; per metadata column keep the FIRST non-empty
  * value in arrival order; the video resolution additionally obeys the
  * "0x0 placeholder" override (StreamTest.cpp:903-910) — a stored "0x0"
  * keeps being overwritten by the next value, so the final value is the
  * first value outside {"", "0x0"}, falling back to the last value seen;
  * pivot error codes into 16 counters (StreamTest.cpp:916-931); count
  * errors and detections (932-936); order output by target_matching_id
  * (940-944).
  *
  * Spark-first: ONE shuffle (`groupBy(url_id)`) computes everything —
  * first-non-empty via order-aware `min_by`, the pivot via 16
  * `sum(when(...))` columns (all map-side combinable, codegen'd). The
  * reference's row-at-a-time `std::map` loop becomes a hash aggregate
  * that scales linearly with partitions; no per-group sort is needed
  * because `min_by` carries the ordering key.
  */
object DetectionRollup {

  /** Metadata columns rolled up as first-non-empty (StreamTest.cpp:847-901). */
  val firstNonEmptyCols: Seq[String] = Seq(
    "flow_address", "target_matching", "target_matching_id",
    "streaming_protocol", "bitrate", "stream_length",
    "video_format", "audio_format", "audio_sampling_rate")

  private def nonEmpty(c: Column): Column = c.isNotNull && length(c) > 0

  /** First value of `v` (by `ord`) for which `v` is non-empty. */
  def firstNonEmpty(v: Column, ord: Column): Column =
    min_by(v, when(nonEmpty(v), ord))

  /** Resolution with the "0x0" override: first value outside {"", "0x0"},
    * else the last value in arrival order (StreamTest.cpp:903-910). */
  def resolutionWithOverride(v: Column, ord: Column): Column =
    coalesce(
      min_by(v, when(nonEmpty(v) && v =!= "0x0", ord)),
      max_by(v, ord))

  /** Roll up a detection-event DataFrame (FIXTURES.md §A1 schema). `ord`
    * is the arrival-order column — `created_time` plus a unique tiebreak
    * if available (SURVEY.md §7.4). */
  def rollup(events: DataFrame, ord: Column): DataFrame = {
    val pivots = ErrorCode.counterColumns.map { case (code, name) =>
      sum(when(col("item") === code, 1).otherwise(0)).cast("int").as(name)
    }
    val firsts = firstNonEmptyCols.map(c => firstNonEmpty(col(c), ord).as(c))
    events
      .groupBy(col("url_id"))
      .agg(
        firsts.head,
        (firsts.tail :+
          resolutionWithOverride(col("video_resolution"), ord).as("video_resolution")) ++
          pivots ++ Seq(
            sum(when(col("item") =!= ErrorCode.OperationOk, 1).otherwise(0))
              .cast("int").as("n_error"),
            count(lit(1)).cast("int").as("n_detection")): _*)
      .orderBy(col("target_matching_id"), col("url_id"))
  }
}
