package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in partition-parallel
  * batches.
  *
  * The decode step is a STUB (this container has no image/audio codecs):
  * `FakeDecoder` derives deterministic pseudo-features from the bytes.
  * The Spark-side plumbing is real — binary columns, typed schema,
  * `mapPartitions` batch shape (one decoder instance per partition, like
  * a real codec/model handle), and column-level metadata extraction that
  * stays in codegen.
  */
object Multimodal {

  /** A media row: opaque payload + envelope metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (what a real image/audio decode would emit). */
  final case class MediaFeature(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** Deterministic stand-in for a real decoder. A production pipeline
    * would open the codec here; the signature (bytes in, typed features
    * out) and the per-partition batching are the real contract. */
  object FakeDecoder {
    def decode(row: MediaRow): MediaFeature = {
      val n = row.payload.length
      var checksum = 0L
      var i = 0
      while (i < n) { checksum = checksum * 31 + (row.payload(i) & 0xff); i += 1 }
      MediaFeature(
        media_id = row.media_id,
        kind = row.kind,
        n_bytes = n,
        width = 1 + n % 640,
        height = 1 + n % 480,
        n_frames = if (row.kind == "video") 1 + n % 30 else 1,
        checksum = checksum)
    }
  }

  /** Partition-parallel decode: one decoder per partition, streaming
    * through the rows (never materializes a partition in memory). */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open codec/model handle once per partition here
      rows.map(FakeDecoder.decode)
    }
  }

  /** Build a media table from the documents corpus (UTF-8 payloads) —
    * exercises the binary-column plumbing on driver testdata. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Column-only metadata extraction (no decode): payload size, header
    * prefix, deterministic fake dimensions — stays in codegen. */
  def metaColumns(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("payload")).as("n_bytes"),
      substring(hex(col("payload")), 1, 8).as("header_hex"),
      (lit(1) + length(col("payload")) % 640).as("width"),
      (lit(1) + length(col("payload")) % 480).as("height"),
      when(col("kind") === "video", lit(1) + length(col("payload")) % 30)
        .otherwise(1).as("n_frames"))

  /** Deterministic frame-sampling plan: for each video, the frame
    * indices a decode pass should touch — an even stride hitting at
    * most `maxFrames` frames, always including frame 0 (the keyframe).
    * `stride = (n_frames + maxFrames - 1) div maxFrames` (integer,
    * engine-reproducible — no float ceil), indices `0, s, 2s, ...`.
    * This is the planning half of frame extraction: the decoder (the
    * [[FakeDecoder]] seam) consumes these (media_id, frame_idx) rows;
    * a 100 TB video corpus plans its decode I/O scan-side with zero
    * shuffle and the row count bounded at videos×maxFrames. */
  def frameSamplePlan(meta: DataFrame, maxFrames: Int): DataFrame = {
    require(maxFrames >= 1, s"maxFrames=$maxFrames must be >= 1")
    meta.where(col("kind") === "video")
      .withColumn("stride",
        expr(s"CAST((n_frames + ${maxFrames - 1}) DIV $maxFrames AS INT)"))
      .select(col("media_id"), col("n_frames"), col("stride"),
        explode(sequence(lit(0), col("n_frames") - 1, col("stride")))
          .as("frame_idx"))
  }

  /** 60-bit dHash (difference hash) per media row — the perceptual
    * fingerprint image pipelines dedup on: sample a 6×11 brightness
    * grid from the decoded payload, set bit `i*10+j` iff
    * `grid(i,j) < grid(i,j+1)` (gradient direction survives re-encode /
    * resize / mild noise, which is the whole point of dHash over a
    * cryptographic digest).
    *
    * The GRID is the decode seam's stand-in (this container has no
    * codecs): cell `g` reads the character code at the deterministic
    * position `1 + (g·37 mod n_chars)` of the UTF-8-decoded payload —
    * a real pipeline computes the same 66 cells from
    * [[FakeDecoder]]-decoded pixels (average brightness per cell); the
    * hash layout, bit semantics, and everything downstream (banding,
    * Hamming pairing) are the production contract.
    *
    * 100 TB posture: the whole hash is ONE scan-side projection —
    * 66 sampled chars + 60 comparisons folded into a single 60-bit
    * sum, zero explode, zero exchange, whole-stage codegen; a 100 TB
    * image corpus fingerprints itself in the same scan that reads the
    * payload envelope. Output: (media_id, phash). */
  def dHash60(media: DataFrame, id: Column, payload: Column): DataFrame = {
    val base = media.select(id.as("media_id"),
        decode(payload, "UTF-8").as("__t"))
      .withColumn("__n", length(col("__t")))
      .where(col("__n") >= 1)
    def cell(g: Int): Column =
      ascii(col("__t").substr(lit(1) + (lit(g * 37) % col("__n")), lit(1)))
    val bits: Seq[Column] = (0 until 6).flatMap { i =>
      (0 until 10).map { j =>
        when(cell(i * 11 + j) < cell(i * 11 + j + 1),
          lit(1L << (i * 10 + j))).otherwise(lit(0L))
      }
    }
    base.select(col("media_id"), bits.reduce(_ + _).as("phash"))
  }

  /** Perceptual near-dup pairs within `maxHamming` of each other over
    * [[dHash60]] fingerprints — the image-dedup operator the text side
    * gets from SimHash. Delegates VERBATIM to the x8 banded machinery
    * ([[graft.ext.Dedup.simhashPairs]]): 4×15-bit block LSH is
    * pigeonhole-EXACT for hamming ≤ 3 (any pair within 3 bit-flips
    * shares at least one intact block), so the banded equi-join
    * returns exactly the all-pairs answer with none of the all-pairs
    * cost; hot buckets beyond `maxBucket` are dropped under the same
    * loud contract as the text-side caps.
    *
    * Output: (a, b, hamming), a < b. */
  def phashPairs(hashes: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 1 << 16): DataFrame =
    Dedup.simhashPairs(
      hashes.select(col("media_id").as("doc_id"), col("phash").as("simhash")),
      maxHamming, maxBucket)
      .select(col("a"), col("b"), col("hamming"))

  /** Aspect-preserving letterbox geometry: for each media row, the
    * resize-and-pad plan a vision-model preprocessor executes to map an
    * arbitrary (width, height) onto a fixed `targetW`×`targetH` canvas —
    * the planning half of image resize, exactly as [[frameSamplePlan]]
    * is the planning half of frame extraction (the pixel work lives
    * behind the [[FakeDecoder]] seam; the geometry does not need pixels).
    *
    * All integer fixed-point, engine-reproducible: `scale_e6 =
    * min(targetW·1e6 div width, targetH·1e6 div height)` (the limiting
    * dimension governs), `dst_* = dim·scale_e6 div 1e6` (never exceeds
    * the target, by construction of the floor), symmetric pads
    * `(target − dst) div 2`, and an `upscaled` flag for rows the plan
    * would stretch (scale_e6 > 1e6) — the rows a quality gate might
    * route to a different pipeline instead.
    *
    * 100 TB posture: pure scan-side arithmetic on the metadata columns —
    * zero joins, zero exchanges, whole-stage-codegen end to end; a
    * 100 TB media corpus plans its entire resize pass in the same scan
    * that reads the envelope. */
  def resizePlan(meta: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW >= 1 && targetW <= 16384 && targetH >= 1 && targetH <= 16384,
      s"resizePlan target ${targetW}x$targetH out of range")
    meta.select(col("media_id"), col("kind"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .withColumn("scale_e6",
        least(expr(s"CAST($targetW AS BIGINT) * 1000000 DIV width"),
          expr(s"CAST($targetH AS BIGINT) * 1000000 DIV height")))
      .withColumn("dst_w", expr("CAST(width * scale_e6 DIV 1000000 AS INT)"))
      .withColumn("dst_h", expr("CAST(height * scale_e6 DIV 1000000 AS INT)"))
      .withColumn("pad_x", expr(s"CAST(($targetW - dst_w) DIV 2 AS INT)"))
      .withColumn("pad_y", expr(s"CAST(($targetH - dst_h) DIV 2 AS INT)"))
      .withColumn("upscaled",
        (col("scale_e6") > 1000000L).cast("int"))
  }
}
