package graft.model

import java.sql.Timestamp

/** Core data model, reconstructed from the reference's structs and SQL
  * (see SURVEY.md §1; citations are path:line into /root/reference/).
  */

/** One probe outcome appended to the detection fact table.
  * Reference: `StreamRecord`, StreamProcessing/StreamTest/StreamTest.h:196-213;
  * INSERT payload StreamTest.cpp:283-299.
  */
final case class DetectionEvent(
    url_id: String,
    flow_address: String,
    item: Int,
    return_value: String,
    lag_details: String,
    streaming_protocol: String,
    bitrate: String,
    stream_length: String,
    video_format: String,
    video_resolution: String,
    audio_format: String,
    audio_sampling_rate: String,
    created_time: Timestamp,
    target_matching_id: String,
    target_matching: String)

/** A row of the stream-source catalog.
  * Reference: `live_stream_sources` read StreamTest.cpp:685-689, updated
  * 151-190, vendor query 441-464; struct `StreamInfo` StreamTest.h:215-231.
  */
final case class StreamSource(
    id: String,
    url: String,
    target_matching: String,
    target_matching_id: String,
    is_del: Int,
    stream_type: String,
    flow_score: Int,
    resolution_type: Int,
    video_format: String,
    video_resolution: String,
    audio_format: String,
    audio_sampling_rate: String)

/** Program dimension row.
  * Reference: `live_broadcast_details` (StreamTest.cpp:761-762),
  * `BroadcastDetailsInfo` (StreamTest.h:234-238). */
final case class Program(id: String, stream_name: String)

/** The 17-way probe-outcome code domain.
  * Reference: `enum StreamError` StreamTest.h:38-56 and the code→message
  * map StreamTest.h:59-77 (messages re-expressed in English; the codes
  * and their meanings are the semantic surface).
  */
object ErrorCode {
  val OperationOk = 0
  val OpenInputFailed = 1001
  val StreamInfoFailed = 1002
  val FindVideoStreamFailed = 1003
  val FindAudioStreamFailed = 1004
  val VideoDecoderNotFound = 1005
  val AllocVideoCtxFailed = 1006
  val CopyVideoParamsFailed = 1007
  val OpenVideoDecoderFailed = 1008
  val AudioDecoderNotFound = 1009
  val AllocAudioCtxFailed = 1010
  val CopyAudioParamsFailed = 1011
  val OpenAudioDecoderFailed = 1012
  val ReadPacketFailed = 1013
  val DecodeFrameFailed = 1014
  val ReadFrameFailed = 1015
  val DtsPtsFailed = 1016

  /** code → display message (StreamTest.h:59-77). */
  val messages: Map[Int, String] = Map(
    OperationOk -> "ok",
    OpenInputFailed -> "open input failed",
    StreamInfoFailed -> "get stream info failed",
    FindVideoStreamFailed -> "find video stream failed",
    FindAudioStreamFailed -> "find audio stream failed",
    VideoDecoderNotFound -> "video decoder not found",
    AllocVideoCtxFailed -> "alloc video decoder ctx failed",
    CopyVideoParamsFailed -> "copy video decoder params failed",
    OpenVideoDecoderFailed -> "open video decoder failed",
    AudioDecoderNotFound -> "audio decoder not found",
    AllocAudioCtxFailed -> "alloc audio decoder ctx failed",
    CopyAudioParamsFailed -> "copy audio decoder params failed",
    OpenAudioDecoderFailed -> "open audio decoder failed",
    ReadPacketFailed -> "read packet failed",
    DecodeFrameFailed -> "decode frame failed",
    ReadFrameFailed -> "read frame failed",
    DtsPtsFailed -> "dts/pts error")

  /** error code → pivot counter column, in the reference's report column
    * order (ErrorItemInfo StreamTest.h:240-258; CSV header order
    * StreamTest.cpp:1190-1196 puts read_packet/decode_frame before
    * read_frame/dts_pts). */
  val counterColumns: Seq[(Int, String)] = Seq(
    OpenInputFailed -> "n_open_input",
    StreamInfoFailed -> "n_stream_info",
    FindVideoStreamFailed -> "n_find_video_stream",
    FindAudioStreamFailed -> "n_find_audio_stream",
    VideoDecoderNotFound -> "n_video_decoder_not_found",
    AllocVideoCtxFailed -> "n_alloc_video_ctx",
    CopyVideoParamsFailed -> "n_copy_video_params",
    OpenVideoDecoderFailed -> "n_open_video_decoder",
    AudioDecoderNotFound -> "n_audio_decoder_not_found",
    AllocAudioCtxFailed -> "n_alloc_audio_ctx",
    CopyAudioParamsFailed -> "n_copy_audio_params",
    OpenAudioDecoderFailed -> "n_open_audio_decoder",
    ReadPacketFailed -> "n_read_packet",
    DecodeFrameFailed -> "n_decode_frame",
    ReadFrameFailed -> "n_read_frame",
    DtsPtsFailed -> "n_dts_pts")

  val errorCodes: Seq[Int] = counterColumns.map(_._1)
}

/** The 27-value resolution dimension.
  * Reference: `enum VideoResolutionType` StreamTest.h:121-149, the
  * 25-entry "WxH" → enum map StreamTest.h:152-179, and the fallback rules
  * in getResolutionType (StreamTest.h:181-194): exact match wins; "0x0"
  * or empty → UNKNOWN(1); anything else → CUSTOM(27).
  */
object ResolutionDim {
  val Unknown = 1
  val Custom = 27
  val Fhd1080 = 17 // threshold for the "FHD" program-name suffix (StreamTest.cpp:998-1004)

  /** "WxH" → enum ordinal (2..26), StreamTest.h:152-179. */
  val byString: Seq[(String, Int)] = Seq(
    "160x120" -> 2, "320x240" -> 3, "640x360" -> 4, "640x480" -> 5,
    "720x480" -> 6, "720x576" -> 7, "800x600" -> 8, "854x480" -> 9,
    "960x540" -> 10, "1024x576" -> 11, "1024x768" -> 12, "1280x720" -> 13,
    "1280x800" -> 14, "1366x768" -> 15, "1600x900" -> 16, "1920x1080" -> 17,
    "2048x1080" -> 18, "2560x1440" -> 19, "2880x1800" -> 20, "3200x1800" -> 21,
    "3840x2160" -> 22, "4096x2160" -> 23, "5120x2880" -> 24, "7680x4320" -> 25,
    "8192x4320" -> 26)

  val names: Map[Int, String] = Map(
    1 -> "UNKNOWN", 2 -> "QQVGA", 3 -> "QVGA", 4 -> "NHD", 5 -> "VGA",
    6 -> "SD480", 7 -> "SD576", 8 -> "SVGA", 9 -> "FWVGA", 10 -> "QHD540",
    11 -> "WSVGA", 12 -> "XGA", 13 -> "HD720", 14 -> "WXGA", 15 -> "WXGA_PLUS",
    16 -> "HD_PLUS", 17 -> "FHD1080", 18 -> "DCI2K", 19 -> "QHD1440",
    20 -> "RETINA2880", 21 -> "QHD_PLUS", 22 -> "UHD4K", 23 -> "DCI4K",
    24 -> "UHD5K", 25 -> "UHD8K", 26 -> "DCI8K", 27 -> "CUSTOM")

  /** Scala-side classifier (for tests / driver-side use). */
  def classify(res: String): Int = {
    val m = byString.toMap
    m.get(res) match {
      case Some(t) => t
      case None => if (res == null || res.isEmpty || res == "0x0") Unknown else Custom
    }
  }
}
