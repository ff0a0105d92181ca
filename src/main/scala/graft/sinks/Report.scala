package graft.sinks

/** Presentation-layer sinks: markdown rendering, webhook-message
  * escaping/truncation, and the batched report builders. Driver-side pure
  * functions (the reference is driver-side here too — SURVEY.md §2.1
  * S8/S9) — query plans stay distributed, only final report rows pass
  * through these.
  */
object Report {

  /** CSV lines → GFM markdown table (StreamTest.cpp:91-111: header row,
    * `---` separator sized by comma count, then body rows). */
  def csvLinesToMarkdown(lines: Seq[String]): String = {
    if (lines.isEmpty) return ""
    val sb = new StringBuilder
    sb.append('|').append(lines.head).append("|\n")
    val colCount = lines.head.count(_ == ',') + 1
    sb.append('|')
    (0 until colCount).foreach(_ => sb.append("---|"))
    sb.append('\n')
    lines.tail.foreach(l => sb.append('|').append(l).append("|\n"))
    sb.toString
  }

  /** Maximum webhook message size and the trim point
    * (HttpServer.cpp:126-129). */
  val MaxMessageChars = 18000
  val TrimTo = 17900
  val TruncationSuffix = "...(truncated)"

  /** Escape + truncate exactly like the reference's webhook sender
    * (HttpServer.cpp:108-129): escape backslash then quote, newline →
    * \n, strip carriage returns; messages over 18,000 chars are cut at
    * 17,900 plus a truncation marker. */
  def safeMessage(message: String): String = {
    val escaped = message
      .replace("\\", "\\\\")
      .replace("\"", "\\\"")
      .replace("\n", "\\n")
      .replace("\r", "")
    if (escaped.length > MaxMessageChars) escaped.substring(0, TrimTo) + TruncationSuffix
    else escaped
  }

  /** The webhook JSON envelope (HttpServer.cpp:133-138). */
  def messageJson(message: String): String =
    s"""{"msg_type":"text","content":{"text":"${safeMessage(message)}"}}"""

  /** Batched weak-program report (StreamTest.cpp:495-545): date header,
    * first batch carries the total, each batch a "(batch i/n)" line. */
  def programReport(date: String, programs: Seq[String], batchSize: Int = 30): Seq[String] = {
    if (programs.isEmpty)
      return Seq(s"============== $date =====================\n" +
        "no qualifying programs (all sources score > 60)\n" +
        "============================================")
    val batches = programs.grouped(batchSize).toSeq
    batches.zipWithIndex.map { case (batch, i) =>
      val sb = new StringBuilder
      sb.append(s"============== $date =====================\n")
      if (i == 0)
        sb.append(s"detected ${programs.size} programs where every source scores below 60:\n")
      sb.append(s"(batch ${i + 1}/${batches.size})\n")
      batch.foreach(p => sb.append(s"program: $p — all sources below 60\n"))
      sb.append("============================================")
      sb.toString
    }
  }

  /** One vendor histogram row (count + pct per bucket). */
  final case class VendorStat(
      vendor: String, countLt60: Int, count6080: Int, count80100: Int, total: Int) {
    def pctLt60: Double = if (total == 0) 0.0 else countLt60 * 100.0 / total
    def pct6080: Double = if (total == 0) 0.0 else count6080 * 100.0 / total
    def pct80100: Double = if (total == 0) 0.0 else count80100 * 100.0 / total
  }

  /** Batched vendor report, 2 vendors per message (StreamTest.cpp:560-607). */
  def vendorReport(date: String, stats: Seq[VendorStat], batchSize: Int = 2): Seq[String] = {
    val batches = stats.grouped(batchSize).toSeq
    batches.zipWithIndex.map { case (batch, i) =>
      val sb = new StringBuilder
      sb.append(s"============== $date (batch ${i + 1}/${batches.size}) =====================\n")
      batch.foreach { s =>
        sb.append(s"${s.vendor} flow-quality stats:\n")
        sb.append(s"  <60: ${s.countLt60} (${s.pctLt60}%)\n")
        sb.append(s"  60~80: ${s.count6080} (${s.pct6080}%)\n")
        sb.append(s"  80~100: ${s.count80100} (${s.pct80100}%)\n")
        sb.append(s"  total: ${s.total}\n")
      }
      sb.append("============================================")
      sb.toString
    }
  }

  /** The reference's 29-column CSV layout for a rollup row
    * (StreamTest.cpp:1186-1236: 11 metadata + 16 error counters in
    * report order + total errors + detections), as a header plus a line
    * builder. Use with `df.write.option("header", true).csv(path)` for
    * the distributed sink (S7) or `csvLinesToMarkdown` for S9. */
  val RollupCsvColumns: Seq[String] =
    Seq("url_id", "target_matching_id", "target_matching", "flow_address",
      "streaming_protocol", "bitrate", "stream_length", "video_format",
      "video_resolution", "audio_format", "audio_sampling_rate") ++
      graft.model.ErrorCode.counterColumns.map(_._2) ++
      Seq("n_error", "n_detection")

  /** Project a rollup DataFrame into the reference's CSV column order. */
  def rollupCsv(rollup: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    rollup.select(RollupCsvColumns.map(org.apache.spark.sql.functions.col): _*)

  /** Write the rollup as CSV with header (S7; the timestamped-filename
    * convention of StreamTest.cpp:1262 is the caller's path choice). */
  def writeRollupCsv(rollup: org.apache.spark.sql.DataFrame, path: String): Unit =
    rollupCsv(rollup).coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** Pluggable message sink (reference: Lark webhook POST,
    * HttpServer.cpp:101-177; real HTTP is external I/O, injected). */
  trait MessageSink {
    def send(message: String): Boolean
  }

  /** Collects messages in memory — the test double. */
  final class CollectingSink extends MessageSink {
    val sent = scala.collection.mutable.ArrayBuffer.empty[String]
    def send(message: String): Boolean = { sent += messageJson(message); true }
  }

  /** Real webhook client over JDK `java.net.http.HttpClient` (no extra
    * deps), faithful to the reference's curl call
    * (HttpServer.cpp:101-177): POST the escaped+truncated JSON envelope
    * as `application/json`, 10 s timeout (`CURLOPT_TIMEOUT 10`), success
    * = 2xx. Failures return false (the reference logs and moves on —
    * report delivery must never fail the pipeline). */
  final class HttpSink(endpoint: java.net.URI,
      timeout: java.time.Duration = java.time.Duration.ofSeconds(10))
      extends MessageSink {
    private val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(timeout).build()

    def send(message: String): Boolean =
      try {
        val req = java.net.http.HttpRequest.newBuilder(endpoint)
          .timeout(timeout)
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            messageJson(message), java.nio.charset.StandardCharsets.UTF_8))
          .build()
        val status = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
        status >= 200 && status < 300
      } catch {
        // a cancelled Spark task interrupts the send; restore the flag so
        // the task actually stops instead of spinning through retries
        case _: InterruptedException =>
          Thread.currentThread().interrupt(); false
        case _: Exception => false
      }
  }
}
