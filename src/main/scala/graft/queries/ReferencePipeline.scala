package graft.queries

import graft.Tables
import graft.ops.{DetectionRollup, FlowScore, ProgramRematch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end reference pipeline under the oracle gate: simulated prober
  * (U1) → per-stream rollup (A1-A4, A8) → flow score (A9) → FHD/HD
  * program rematch (J3) — the reference's E2+E3 lifecycle
  * (StreamTest.cpp:830-1047) as one declarative Spark plan.
  *
  * The prober is simulated deterministically from the driver's `events`
  * table (the real one is external ffmpeg I/O, out of scope — SURVEY.md
  * §2.1 S4): each event becomes one classified detection fact, `error`
  * events cycling through all 16 error codes and `props.k` driving the
  * metadata mix (empties, "0x0" placeholders, every resolution class).
  */
object ReferencePipeline {

  /** Simulated prober: generic events → detection facts (FIXTURES.md §A1). */
  def deriveDetectionEvents(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    events.select(
      col("event_id").as("ord"),
      col("user_id").cast("string").as("url_id"),
      concat(lit("http://vendor"), (col("user_id") % 3).cast("string"),
        lit(".example:80/stream/"), col("user_id").cast("string")).as("flow_address"),
      when(col("event_type") === "error", lit(1001) + col("event_id") % 16)
        .otherwise(0L).cast("int").as("item"),
      when(col("event_type") === "error", "-1").otherwise("0").as("return_value"),
      lit("").as("lag_details"),
      when(k % 5 === 0, "").when(k % 2 === 0, "hls").otherwise("flv")
        .as("streaming_protocol"),
      when(k % 11 === 0, "")
        .otherwise(concat((k * 100).cast("string"), lit(" kb/s"))).as("bitrate"),
      when(k % 13 === 0, "N/A").otherwise(k.cast("string")).as("stream_length"),
      when(k % 3 === 0, "h264").when(k % 3 === 1, "hevc").otherwise("")
        .as("video_format"),
      when(k % 7 === 0, "0x0").when(k % 7 === 1, "")
        .when(k % 7 === 2, "1920x1080").when(k % 7 === 3, "1280x720")
        .when(k % 7 === 4, "640x360").when(k % 7 === 5, "3840x2160")
        .otherwise("999x777").as("video_resolution"),
      when(k % 4 === 0, "aac").otherwise("mp3").as("audio_format"),
      when(k % 6 === 0, "").otherwise("44100").as("audio_sampling_rate"),
      col("ts").as("created_time"),
      (lit(200) + col("user_id") % 20).cast("string").as("target_matching_id"),
      concat(lit("Prog "), (col("user_id") % 20).cast("string")).as("target_matching"))
  }

  /** Program dim fixture: FHD/HD variants for programs 0-8, a duplicate
    * name (first-match-wins → min id), nothing for 9-19 (keep old id). */
  val programRows: Seq[(String, String)] = Seq(
    "901" -> "Prog 0 FHD", "902" -> "Prog 0 HD", "903" -> "Prog 1 FHD",
    "904" -> "Prog 2 HD", "905" -> "Prog 3 FHD", "906" -> "Prog 4 HD",
    "907" -> "Prog 5 FHD", "908" -> "Prog 6 HD", "909" -> "Prog 7 FHD",
    "910" -> "Prog 8 HD", "950" -> "Prog 1 FHD")

  private val programValuesSql: String =
    programRows.map { case (id, n) => s"('$id', '$n')" }.mkString(", ")

  def run(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val det = deriveDetectionEvents(Tables.events(s, dir))
    val rolled = DetectionRollup.rollup(det, col("ord"))
      .withColumn("flow_score", FlowScore.score(col("n_detection"), col("n_error")))
    val programs = programRows.toDF("id", "stream_name")
    ProgramRematch.rematch(rolled, programs)
      .select(
        col("url_id"), col("flow_address"), col("streaming_protocol"),
        col("bitrate"), col("stream_length"), col("video_format"),
        col("video_resolution"), col("audio_format"), col("audio_sampling_rate"),
        col("target_matching"), col("target_matching_id"),
        col("resolution_type"), col("is_fhd"),
        col("n_open_input"), col("n_read_packet"), col("n_dts_pts"),
        col("n_error"), col("n_detection"), col("flow_score"))
      .orderBy("url_id")
  }

  val oracle: String =
    s"""WITH det AS (
      |  SELECT event_id AS ord,
      |         CAST(user_id AS VARCHAR) AS url_id,
      |         'http://vendor' || CAST(user_id % 3 AS VARCHAR) ||
      |           '.example:80/stream/' || CAST(user_id AS VARCHAR) AS flow_address,
      |         CAST(CASE WHEN event_type = 'error' THEN 1001 + event_id % 16 ELSE 0 END AS INT) AS item,
      |         CASE WHEN k % 5 = 0 THEN '' WHEN k % 2 = 0 THEN 'hls' ELSE 'flv' END AS streaming_protocol,
      |         CASE WHEN k % 11 = 0 THEN '' ELSE CAST(k * 100 AS VARCHAR) || ' kb/s' END AS bitrate,
      |         CASE WHEN k % 13 = 0 THEN 'N/A' ELSE CAST(k AS VARCHAR) END AS stream_length,
      |         CASE WHEN k % 3 = 0 THEN 'h264' WHEN k % 3 = 1 THEN 'hevc' ELSE '' END AS video_format,
      |         CASE WHEN k % 7 = 0 THEN '0x0' WHEN k % 7 = 1 THEN ''
      |              WHEN k % 7 = 2 THEN '1920x1080' WHEN k % 7 = 3 THEN '1280x720'
      |              WHEN k % 7 = 4 THEN '640x360' WHEN k % 7 = 5 THEN '3840x2160'
      |              ELSE '999x777' END AS video_resolution,
      |         CASE WHEN k % 4 = 0 THEN 'aac' ELSE 'mp3' END AS audio_format,
      |         CASE WHEN k % 6 = 0 THEN '' ELSE '44100' END AS audio_sampling_rate,
      |         CAST(200 + user_id % 20 AS VARCHAR) AS target_matching_id,
      |         'Prog ' || CAST(user_id % 20 AS VARCHAR) AS target_matching
      |  FROM (SELECT *, CAST(json_extract_string(props, '$$.k') AS INT) AS k FROM events)),
      |roll AS (
      |  SELECT url_id,
      |         arg_min(flow_address, ord) FILTER (WHERE length(flow_address) > 0) AS flow_address,
      |         arg_min(streaming_protocol, ord) FILTER (WHERE length(streaming_protocol) > 0) AS streaming_protocol,
      |         arg_min(bitrate, ord) FILTER (WHERE length(bitrate) > 0) AS bitrate,
      |         arg_min(stream_length, ord) FILTER (WHERE length(stream_length) > 0) AS stream_length,
      |         arg_min(video_format, ord) FILTER (WHERE length(video_format) > 0) AS video_format,
      |         COALESCE(
      |           arg_min(video_resolution, ord) FILTER (
      |             WHERE length(video_resolution) > 0 AND video_resolution <> '0x0'),
      |           arg_max(video_resolution, ord)) AS video_resolution,
      |         arg_min(audio_format, ord) FILTER (WHERE length(audio_format) > 0) AS audio_format,
      |         arg_min(audio_sampling_rate, ord) FILTER (WHERE length(audio_sampling_rate) > 0) AS audio_sampling_rate,
      |         arg_min(target_matching, ord) FILTER (WHERE length(target_matching) > 0) AS target_matching,
      |         arg_min(target_matching_id, ord) FILTER (WHERE length(target_matching_id) > 0) AS target_matching_id,
      |         CAST(SUM(CASE WHEN item = 1001 THEN 1 ELSE 0 END) AS INT) AS n_open_input,
      |         CAST(SUM(CASE WHEN item = 1013 THEN 1 ELSE 0 END) AS INT) AS n_read_packet,
      |         CAST(SUM(CASE WHEN item = 1016 THEN 1 ELSE 0 END) AS INT) AS n_dts_pts,
      |         CAST(SUM(CASE WHEN item <> 0 THEN 1 ELSE 0 END) AS INT) AS n_error,
      |         CAST(COUNT(*) AS INT) AS n_detection
      |  FROM det GROUP BY url_id),
      |scored AS (
      |  SELECT *,
      |         CAST(CASE WHEN n_detection > 0 AND n_error <= n_detection
      |              THEN TRUNC(GREATEST(0.0,
      |                CAST(n_detection - n_error AS DOUBLE) / CAST(n_detection AS DOUBLE) * 100.0))
      |              ELSE 0 END AS INT) AS flow_score,
      |         CASE WHEN video_resolution = '1920x1080' THEN 17
      |              WHEN video_resolution = '1280x720' THEN 13
      |              WHEN video_resolution = '640x360' THEN 4
      |              WHEN video_resolution = '3840x2160' THEN 22
      |              WHEN video_resolution = '' OR video_resolution = '0x0' THEN 1
      |              ELSE 27 END AS resolution_type
      |  FROM roll),
      |dim AS (
      |  SELECT stream_name, MIN(id) AS matched_id
      |  FROM (VALUES $programValuesSql) p(id, stream_name) GROUP BY 1)
      |SELECT s.url_id, s.flow_address, s.streaming_protocol, s.bitrate,
      |       s.stream_length, s.video_format, s.video_resolution,
      |       s.audio_format, s.audio_sampling_rate, s.target_matching,
      |       COALESCE(d.matched_id, s.target_matching_id) AS target_matching_id,
      |       s.resolution_type, s.resolution_type >= 17 AS is_fhd,
      |       s.n_open_input, s.n_read_packet, s.n_dts_pts,
      |       s.n_error, s.n_detection, s.flow_score
      |FROM scored s
      |LEFT JOIN dim d
      |  ON s.target_matching ||
      |     (CASE WHEN s.resolution_type >= 17 THEN ' FHD' ELSE ' HD' END) = d.stream_name
      |ORDER BY s.url_id""".stripMargin

  val query: Q = Q("qr1_detection_pipeline", oracle)(run)
}
