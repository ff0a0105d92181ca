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
    * exercises the binary-column plumbing on driver testdata. The scan
    * is spread to cluster width first ([[Spread]], round 17): every
    * downstream fingerprint pipeline does heavy per-row work (60+ hex
    * cell extractions per frame/window) and the sf1 documents file is
    * 1-2 row groups — the whole multimodal family (x243/x250/x256/
    * x257) ran at ~1.6 cores before the spread. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    Spread.toClusterWidth(docs).select(
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
    * codecs): cell `g` reads the RAW PAYLOAD BYTE at the deterministic
    * 0-based offset `g·37 mod n_bytes` — a real pipeline computes the
    * same 66 cells from [[FakeDecoder]]-decoded pixels (average
    * brightness per cell); the hash layout, bit semantics, and
    * everything downstream (banding, Hamming pairing) are the
    * production contract. Byte-based on purpose: a media payload is
    * not text, so the sampling must not pass through a charset decode
    * (the round-12 form sampled UTF-8 code points, which only agreed
    * with a byte-level oracle on ASCII payloads). Bytes are compared
    * via their two-char uppercase hex image — for single bytes,
    * lexicographic hex order IS numeric byte order, and both engines
    * (Spark `hex`, DuckDB `hex`) emit the identical uppercase form.
    *
    * 100 TB posture: the whole hash is ONE scan-side projection —
    * 66 sampled bytes + 60 comparisons folded into a single 60-bit
    * sum, zero explode, zero exchange, whole-stage codegen; a 100 TB
    * image corpus fingerprints itself in the same scan that reads the
    * payload envelope. Output: (media_id, phash). */
  def dHash60(media: DataFrame, id: Column, payload: Column): DataFrame = {
    val base = media.select(id.as("media_id"), hex(payload).as("__hx"),
        length(payload).as("__n")) // length(binary) = byte count
      .where(col("__n") >= 1)
    def cell(g: Int): Column =
      col("__hx").substr(lit(1) + (lit(g * 37) % col("__n")) * 2, lit(2))
    val bits: Seq[Column] = (0 until 6).flatMap { i =>
      (0 until 10).map { j =>
        when(cell(i * 11 + j) < cell(i * 11 + j + 1),
          lit(1L << (i * 10 + j))).otherwise(lit(0L))
      }
    }
    base.select(col("media_id"), bits.reduce(_ + _).as("phash"))
  }

  /** Deterministic re-encoded variants: for every `every`-th media row
    * whose payload is long enough, a twin with the FIRST byte replaced
    * by 0x7E and `media_id + idOffset` — the planted positive a
    * perceptual-dedup deployment recalls against (is the banded
    * pipeline actually recovering re-encodes of the corpus it guards?).
    * The length guards pin the perturbation's blast radius under
    * [[dHash60]]'s sampling: byte offset 0 is read by grid cell g iff
    * 37·g ≡ 0 (mod n); with n ≥ 67 and n % 37 ≠ 0 that forces g = 0,
    * so only bit 0 can differ and hamming(original, variant) ≤ 1 —
    * every variant is GUARANTEED to survive a hamming ≤ 3 dedup
    * filter, making the recall probe non-vacuous at any corpus size.
    *
    * 100 TB posture: a scan-side filter + projection on the media
    * scan — zero exchanges; the planted set is a fixed 1/(every)
    * fraction of the corpus. Output: (media_id, payload). */
  def reencodeVariants(media: DataFrame, every: Long = 10L,
      idOffset: Long = 1000000000L): DataFrame = {
    require(every >= 1, s"every=$every must be >= 1")
    media.where(col("media_id") % every === 0 &&
        length(col("payload")) >= 67 && length(col("payload")) % 37 =!= 0)
      .select((col("media_id") + idOffset).as("media_id"),
        concat(lit(Array[Byte](0x7e.toByte)),
          col("payload").substr(lit(2), lit(Int.MaxValue))).as("payload"))
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

  /** Multimodal consensus near-dup: the agreement matrix between the
    * IMAGE signal ([[phashPairs]] on the pixels) and the TEXT signal
    * (caption SimHash pairs) over the same id space. A pair flagged by
    * both is a high-confidence duplicate (re-encoded image AND reworded
    * caption); image_only is the re-caption case (same picture, new
    * text — phash catches what caption dedup can't); text_only is the
    * re-illustration case (copied caption, different picture). A
    * multimodal curation pass treats the three classes differently —
    * which is why the CLASS, not a merged pair list, is the output.
    *
    * 100 TB posture: both inputs arrive banded + bucket-capped (never
    * all-pairs — their own plans are pinned under x241/x8); this op
    * adds ONE full-outer join keyed on the pair ids, so its cost is
    * pair-driven, orders below the corpus. Absent sides render as −1
    * (the hamming domain is ≥ 0, so the sentinel is unambiguous).
    *
    * Output: `(a, b, img_hamming, txt_hamming, signal)`, a < b on both
    * inputs by construction. */
  def consensusPairs(imgPairs: DataFrame, txtPairs: DataFrame): DataFrame = {
    val i = imgPairs.select(col("a"), col("b"),
      col("hamming").cast("int").as("ih"))
    val t = txtPairs.select(col("a"), col("b"),
      col("hamming").cast("int").as("th"))
    i.join(t, Seq("a", "b"), "full_outer")
      .select(col("a"), col("b"),
        coalesce(col("ih"), lit(-1)).as("img_hamming"),
        coalesce(col("th"), lit(-1)).as("txt_hamming"),
        when(col("ih").isNotNull && col("th").isNotNull, lit("both"))
          .when(col("ih").isNotNull, lit("image_only"))
          .otherwise(lit("text_only")).as("signal"))
  }

  /** Per-sampled-frame 60-bit dHash for the video corpus — the FUSED
    * form of [[frameSamplePlan]] ∘ [[dHash60]]: same frame grid (the
    * `stride = (n_frames + maxFrames − 1) div maxFrames` indices
    * `0, s, 2s, …`, spec-pinned identical to frameSamplePlan's output)
    * and same 6×11 hash layout, with the frame entering as a PHASE on
    * the byte sampling — cell `g` of frame `f` reads the raw payload
    * byte at offset `(f·101 + g·37) mod n_bytes` (101 coprime to the
    * 37 stride, so frames sample distinct byte progressions; a real
    * pipeline computes the same 66 cells from the decoded frame `f`'s
    * pixels — the [[FakeDecoder]] seam, per frame).
    *
    * Fused on purpose: composing via frameSamplePlan would join the
    * (media_id, frame_idx) plan rows back onto the payload scan — a
    * self-join of the corpus. Carrying the payload THROUGH the explode
    * keeps it one scan + one bounded Generate (≤ maxFrames rows per
    * video), zero exchange; at 100 TB the whole video corpus
    * fingerprints every sampled frame in the scan that reads it.
    * Output: (media_id, frame_idx, phash). */
  def videoFrameDHash(media: DataFrame, maxFrames: Int = 8): DataFrame = {
    require(maxFrames >= 1 && maxFrames <= 64,
      s"videoFrameDHash: maxFrames=$maxFrames out of range [1, 64]")
    val base = media.where(col("kind") === "video")
      .select(col("media_id"), hex(col("payload")).as("__hx"),
        length(col("payload")).as("__n"))
      .where(col("__n") >= 1)
      // the metaColumns video contract: n_frames = 1 + n_bytes % 30
      .withColumn("__nf", lit(1) + col("__n") % 30)
      .withColumn("__stride",
        expr(s"CAST((__nf + ${maxFrames - 1}) DIV $maxFrames AS INT)"))
      .select(col("media_id"), col("__hx"), col("__n"),
        explode(sequence(lit(0), col("__nf") - 1, col("__stride")))
          .as("frame_idx"))
    def cell(g: Int): Column =
      col("__hx").substr(
        lit(1) + ((col("frame_idx") * 101 + lit(g * 37)) % col("__n")) * 2,
        lit(2))
    val bits: Seq[Column] = (0 until 6).flatMap { i =>
      (0 until 10).map { j =>
        when(cell(i * 11 + j) < cell(i * 11 + j + 1),
          lit(1L << (i * 10 + j))).otherwise(lit(0L))
      }
    }
    base.select(col("media_id"), col("frame_idx"),
      bits.reduce(_ + _).as("phash"))
  }

  /** Deterministic re-upload twins: every `every`-th media row again
    * under `media_id + idOffset` with the payload UNCHANGED — the
    * planted exact-re-upload positives a video-dedup deployment
    * recalls against (every sampled frame of a twin hashes identically
    * to its original, so a frame-aligned vote must surface the pair at
    * hamming 0 — non-vacuous at any corpus size). The near-miss
    * (re-encoded, ≤ 3 bits per frame) recall path is pinned by unit
    * fixtures; byte-identity is the only planted perturbation whose
    * frame-hash blast radius is zero BY CONSTRUCTION at every payload
    * length (a byte flip's radius under the frame phase grows as
    * payloads shrink below the 37·66-byte sampling span).
    *
    * 100 TB posture: scan-side filter + projection, zero exchanges;
    * the planted set is a fixed 1/(every) fraction. */
  def reuploadTwins(media: DataFrame, every: Long = 7L,
      idOffset: Long = 2000000000L): DataFrame = {
    require(every >= 1, s"reuploadTwins: every=$every must be >= 1")
    media.where(col("media_id") % every === 0)
      .select((col("media_id") + idOffset).as("media_id"), col("kind"),
        col("payload"))
  }

  /** Frame-aligned video near-dup vote over [[videoFrameDHash]]
    * fingerprints — the cross-media-row VIDEO twin of [[phashPairs]]:
    * two videos are near-dups when at least `minVotes` of their
    * shared sampled frame positions hash within `maxHamming` of each
    * other. The banded machinery is x8's, bucketed on
    * (frame_idx, blk, key): including the frame position in the
    * bucket key makes the equi-join pair ONLY same-position frames —
    * alignment costs nothing extra, and within each frame position the
    * 4×15-bit pigeonhole stays EXACT for hamming ≤ 3. Hot buckets drop
    * under the same loud `maxBucket` contract.
    *
    * The vote (≥ minVotes matched positions, a pure groupBy over the
    * surviving pairs) is what makes this a VIDEO decision and not a
    * per-image one: a single coincidental frame collision cannot
    * fire it. Stride alignment is the documented contract — videos
    * with different frame counts compare only on the frame indices
    * both sampled. Output: (a, b, n_matched, ham_max), a < b. */
  def videoNeardupPairs(frameHashes: DataFrame, maxHamming: Int = 3,
      minVotes: Int = 2, maxBucket: Int = 1 << 16): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"videoNeardupPairs: maxHamming=$maxHamming breaks the 4-band pigeonhole (<= 3)")
    require(minVotes >= 1 && maxBucket >= 2,
      s"videoNeardupPairs: minVotes=$minVotes / maxBucket=$maxBucket out of range")
    val blocks = (0 until 4).map { blk =>
      struct(lit(blk).as("blk"),
        shiftright(col("phash"), blk * 15).bitwiseAND(lit(0x7FFFL)).as("key"))
    }
    val bucketW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("frame_idx"), col("blk"), col("key"))
    val guarded = frameHashes
      .select(col("media_id"), col("frame_idx"), col("phash"),
        explode(array(blocks: _*)).as("b"))
      .select(col("media_id"), col("frame_idx"), col("phash"),
        col("b.blk").as("blk"), col("b.key").as("key"))
      .withColumn("__n", count(lit(1)).over(bucketW))
      .where(col("__n") <= maxBucket)
      .drop("__n")
      // pinned (round 18): both self-join sides embed this subtree —
      // without the pin the payload frame-hashing + bucket-guard window
      // ran twice per query (exchange reuse across differently-
      // projected aliases is not guaranteed). ≤4·maxFrames narrow rows
      // per video.
      .localCheckpoint(false)
    val l = guarded.select(col("frame_idx"), col("blk"), col("key"),
      col("media_id").as("a"), col("phash").as("sa"))
    val r = guarded.select(col("frame_idx"), col("blk"), col("key"),
      col("media_id").as("b"), col("phash").as("sb"))
    l.join(r, Seq("frame_idx", "blk", "key")).where(col("a") < col("b"))
      .select(col("a"), col("b"), col("frame_idx"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_matched"), max(col("hamming")).as("ham_max"))
      .where(col("n_matched") >= minVotes)
  }

  /** Silence-trim plan for the audio corpus — the VAD pre-filter an
    * ASR/TTS curation pipeline runs before spending decode/transcribe
    * budget: window each payload's amplitude into `windows` equal
    * spans, call a window silent when its sampled energy is at most
    * `silenceMax`, and emit the trim decision — the first and last
    * voiced windows (NULL = drop the row entirely, it is all silence),
    * the silent-window count, and the total sampled energy.
    *
    * The GRID is the decode seam's stand-in (no audio codecs in this
    * container): window `c`'s energy sums `samplesPerWindow` RAW
    * PAYLOAD BYTES at the evenly-spread offsets
    * `(i·n_bytes) div (windows·samplesPerWindow)` — a real pipeline
    * sums |PCM amplitude| per window off the [[FakeDecoder]] seam; the
    * windowing, thresholding, trim semantics and everything downstream
    * are the production contract. Byte values go through the payload's
    * hex image on BOTH engines (`conv(hex, 16, 10)` here, the
    * `('0x' || …)::INT` cast in the oracle), so parity holds for
    * arbitrary payloads.
    *
    * 100 TB posture: the whole plan is ONE scan-side projection —
    * windows·samplesPerWindow sampled bytes folded into static energy
    * columns, the trim bounds as coalesce ladders over them — zero
    * explode, zero exchange, whole-stage codegen; a 100 TB audio
    * corpus plans its entire trim pass in the scan that reads the
    * envelope. Output: (media_id, first_voiced, last_voiced,
    * n_silent, energy_q). */
  /** The shared audio energy grid (the decode seam's stand-in): the
    * audio slice with its hex image, plus the `windows` static energy
    * columns — window `c` sums `samplesPerWindow` bytes at offsets
    * `(i·n) div (windows·spw)`. Pure scan-side arithmetic, shared by
    * [[audioTrimPlan]] and [[audioSegments]] so their window grids can
    * never drift apart. */
  private def audioEnergyGrid(media: DataFrame, windows: Int,
      samplesPerWindow: Int): (DataFrame, Seq[Column]) = {
    require(windows >= 2 && windows <= 64,
      s"audio grid: windows=$windows out of range [2, 64]")
    require(samplesPerWindow >= 1 && samplesPerWindow <= 16,
      s"audio grid: samplesPerWindow=$samplesPerWindow out of range [1, 16]")
    val S = windows * samplesPerWindow
    val base = media.where(col("kind") === "audio")
      .select(col("media_id"), hex(col("payload")).as("__hx"),
        length(col("payload")).as("__n"))
      .where(col("__n") >= 1)
      // loud ceiling, not a silent wrap: substr takes an INT position
      // and the hex image doubles the payload, so rows past 1 GB would
      // wrap the position negative and return wrong energies — refuse
      // them per-row instead (assert_true throws; NULL on pass keeps
      // the row, and living inside a Filter it can't be pruned away)
      .where(assert_true(col("__n") <= 1000000000L,
        lit("audioEnergyGrid: payload exceeds the 1 GB hex-image ceiling " +
          "(substr position is INT and hex doubles the length) — chunk " +
          "oversized media upstream")).isNull)
    // offsets in 64-bit on purpose: length(payload) is INT, and
    // __n * (S-1) wraps 32 bits at ~34 MB payloads — silently-wrong
    // energies here, an overflow error in the oracle (the round-13
    // review catch); BIGINT arithmetic plus the 1 GB guard above keeps
    // the final INT position exact over the whole admitted range
    def byteAt(i: Int): Column =
      conv(col("__hx").substr(
        (lit(1L) + expr(s"(CAST(__n AS BIGINT) * $i) DIV $S") * 2).cast("int"),
        lit(2)), 16, 10).cast("int")
    val energies: Seq[Column] = (0 until windows).map { c =>
      (0 until samplesPerWindow).map(j => byteAt(c * samplesPerWindow + j))
        .reduce(_ + _)
    }
    (base, energies)
  }

  def audioTrimPlan(media: DataFrame, windows: Int = 16,
      samplesPerWindow: Int = 4, silenceMax: Int = 260): DataFrame = {
    require(silenceMax >= 0, s"audioTrimPlan: silenceMax=$silenceMax must be >= 0")
    val (base, energies) = audioEnergyGrid(media, windows, samplesPerWindow)
    val voiced = energies.map(_ > silenceMax)
    val firstVoiced = coalesce(
      voiced.zipWithIndex.map { case (v, c) => when(v, lit(c)) }: _*)
    val lastVoiced = coalesce(
      voiced.zipWithIndex.reverse.map { case (v, c) => when(v, lit(c)) }: _*)
    val nSilent = voiced.map(v => when(v, lit(0)).otherwise(lit(1)))
      .reduce(_ + _)
    base.select(col("media_id"),
      firstVoiced.as("first_voiced"), lastVoiced.as("last_voiced"),
      nSilent.as("n_silent"),
      energies.map(_.cast("long")).reduce(_ + _).as("energy_q"))
  }

  /** Voiced-run segmentation over the [[audioTrimPlan]] window grid —
    * the operator after VAD: where the trim plan answers "does this row
    * carry speech at all", the segmenter answers "WHERE", emitting one
    * row per maximal run of voiced windows (the chunks an ASR pass
    * actually transcribes; silence inside a row splits it into
    * separately-billable segments). Same grid, same threshold, shared
    * via [[audioEnergyGrid]] so the two plans can never disagree about
    * which windows are voiced.
    *
    * Runs via gaps-and-islands: explode the static energy columns into
    * (window, energy) rows (ONE bounded Generate — ≤ `windows` rows per
    * media), keep voiced, `island = c − row_number per media` (constant
    * within a run, strictly decreasing across gaps), then one rollup
    * per (media, island).
    *
    * 100 TB posture: the Generate is bounded at `windows` rows per
    * media; ONE hash(media_id) exchange serves both the run window and
    * the island rollup (hash(media_id) satisfies the (media_id, island)
    * clustering). Output: (media_id, seg_start, seg_end, n_windows,
    * seg_energy), one row per voiced run. */
  def audioSegments(media: DataFrame, windows: Int = 16,
      samplesPerWindow: Int = 4, silenceMax: Int = 260): DataFrame = {
    require(silenceMax >= 0, s"audioSegments: silenceMax=$silenceMax must be >= 0")
    val (base, energies) = audioEnergyGrid(media, windows, samplesPerWindow)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("c"))
    base
      .select(col("media_id"),
        posexplode(array(energies: _*)).as(Seq("c", "energy")))
      .where(col("energy") > silenceMax)
      .withColumn("island", col("c") - row_number().over(w))
      .groupBy(col("media_id"), col("island"))
      .agg(min(col("c")).as("seg_start"), max(col("c")).as("seg_end"),
        count(lit(1)).cast("int").as("n_windows"),
        sum(col("energy")).as("seg_energy"))
      .select(col("media_id"), col("seg_start"), col("seg_end"),
        col("n_windows"), col("seg_energy"))
  }

  /** Per-window quantized energy profile over the [[audioEnergyGrid]]
    * — the audio corpus's banding signature, completing the perceptual
    * matrix (image [[dHash60]], video [[videoFrameDHash]], audio THIS):
    * window `c`'s energy integer-divides by `quantum`, so two
    * recordings whose per-window loudness contours agree to within a
    * quantum land in the same coarse level (the chromaprint idea,
    * grid-exact and engine-reproducible — no FFT, no floats). Same
    * grid as [[audioTrimPlan]]/[[audioSegments]] (shared helper — the
    * profiles can never drift from the VAD's view of the signal).
    *
    * 100 TB posture: one scan-side projection + ONE bounded Generate
    * (≤ `windows` rows per media), zero exchange.
    * Output: (media_id, c, q) — one row per (audio row, window). */
  def audioEnergyProfile(media: DataFrame, windows: Int = 16,
      samplesPerWindow: Int = 4, quantum: Int = 16): DataFrame = {
    require(quantum >= 1 && quantum <= 1024,
      s"audioEnergyProfile: quantum=$quantum out of range [1, 1024]")
    val (base, energies) = audioEnergyGrid(media, windows, samplesPerWindow)
    base.select(col("media_id"),
        posexplode(array(energies.map(_.cast("long")): _*)).as(Seq("c", "energy")))
      .select(col("media_id"), col("c"),
        expr(s"energy DIV $quantum").as("q"))
  }

  /** Window-aligned AUDIO near-dup vote over [[audioEnergyProfile]]
    * signatures — the cross-media-row audio twin of [[phashPairs]] /
    * [[videoNeardupPairs]]: two recordings are near-dups when at least
    * `minVotes` of their window positions carry quantized energies
    * within ±1 level of each other (boundary straddles are tolerated;
    * the per-window probe explodes exactly the levels {q−1, q, q+1},
    * so a qualifying pair matches each window EXACTLY ONCE — the δ is
    * determined — and the vote needs no dedup). The banded machinery
    * is x8's shape keyed on (window_idx, level): including the window
    * position in the bucket key makes the equi-join pair only
    * same-position windows, alignment for free, exactly as x243's
    * frame-aligned vote.
    *
    * PIGEONHOLE BANDING (round 14 — replaces the per-window
    * (position, level) bucket join, whose key space was a CONSTANT
    * ~windows·1020/quantum buckets, so organic buckets grew O(N) and
    * the join went quadratic: 517 s at sf1, this round's one sf1
    * outlier): the `windows` positions split into
    * `windows − minVotes + 1` consecutive bands. A qualifying pair
    * (≥ minVotes windows within ±1) has at most `windows − minVotes`
    * violating windows, so at least ONE band is entirely within ±1 —
    * exactly x8/x241's block-pigeonhole, with ±1 tolerance in place of
    * bit equality. The probe side explodes every per-window delta
    * combo in {−1, 0, +1}^bandSize (≤ 3⁴ = 81 rows per band, a bounded
    * Generate) against the other side's EXACT band key, a composite of
    * all the band's levels — CONTENT-rich, so organic buckets stay
    * thin at any corpus size. Candidates then verify EXACTLY against
    * the full window profiles (the x7 band-then-verify shape), which
    * makes the result set identical to the all-window vote.
    *
    * IDENTICAL-PROFILE PRE-COLLAPSE (round 16 — the skew receipt's
    * find): before any banding, medias group by their FULL profile
    * vector into families (representative = min media_id). Only the
    * DISTINCT-profile representatives enter the banded candidate join;
    * each family ≥2 emits (rep, member) STAR rows instead of its pair
    * expansion. A 210k-row re-encode flood — mutually identical by
    * construction — therefore costs O(family) here, where the old
    * pair contract paid O(family²) in TRUE answer rows (the sf1 skew
    * receipt measured 206 s for ~24M pairs; a 60k family under the old
    * 65,536 membership cap would have materialized ~1.8e9). The x49
    * struct-argmax idiom, applied to the pair table itself.
    *
    * Hot (band, key) buckets beyond `maxBucket` DROP under the loud
    * family contract. Post-collapse the cap's bound is on PAIRS, not
    * members: every bucket member is a DISTINCT profile, so a capped
    * bucket contributes ≤ 3^bandSize·maxBucket candidate rows and the
    * verified output among survivors is ≤ maxBucket² per bucket of
    * genuinely-distinct near-dups — identical floods can no longer ride
    * under the cap into a quadratic verify, because they never reach
    * the buckets at all. The DISTINCT-profile flood (e.g. many unique
    * near-silence recordings sharing band keys) still collapses into
    * hot buckets and drops loudly-by-absence rather than detonating
    * (tripwire-probed); the guard is a combinable count broadcast back,
    * never a count-over window. Because the x250 ORACLE states the
    * capless vote, parity depends on no gate-corpus REP bucket
    * approaching the cap — OBSERVED, not assumed: [[audioBandOccupancy]]
    * measures the max representative-side occupancy and ExtSpec asserts
    * the gate corpus sits far below `maxBucket`.
    *
    * 100 TB posture: family collapse is one exchange on the 16-long
    * profile vector; band rows are ≤ bands per REPRESENTATIVE; probes
    * ≤ Σ 3^bandSize per rep (bounded Generate); the candidate join is
    * equi on (band, key) with content-driven buckets; the exact verify
    * touches candidates × windows rows. Never all-pairs, no
    * constant-cardinality key space, no quadratic family cost.
    *
    * Output (a, b, n_matched, dq_max, kind), a < b:
    *   - kind='family': b is a non-representative member of a's family
    *     (identical profiles — n_matched = profile size, dq_max = 0);
    *     emitted only when the family's profile size ≥ minVotes (a
    *     shorter shared profile could not pass the vote).
    *   - kind='pair': a, b are representatives of DISTINCT profiles
    *     passing the ≥ minVotes vote.
    * The full pair table is the clique-star expansion (see
    * [[audioNeardupPairs]]); connected components are IDENTICAL on
    * either form (stars connect exactly the members their cliques
    * connect). */
  def audioNeardupStars(profile: DataFrame, minVotes: Int = 12,
      maxBucket: Int = 1 << 16, windows: Int = 16): DataFrame = {
    require(maxBucket >= 2,
      s"audioNeardupStars: maxBucket=$maxBucket must be >= 2")
    val prof = profGuarded(profile, minVotes, windows)
    val (famMap, repProf) = repCollapse(prof)
    val famStars = famMap
      .where(col("media_id") =!= col("rep") && col("sig_n") >= minVotes)
      .select(col("rep").as("a"), col("media_id").as("b"),
        col("sig_n").cast("long").as("n_matched"), lit(0L).as("dq_max"),
        lit("family").as("kind"))
    repPairs(repProf, minVotes, maxBucket, windows)
      .withColumn("kind", lit("pair"))
      .unionByName(famStars)
  }

  /** Pair-table view of [[audioNeardupStars]] — (a, b, n_matched,
    * dq_max), a < b, exactly the capless all-window vote over every
    * media pair. The star form expands back: intra-family pairs carry
    * (profile size, 0); cross-family pairs inherit their
    * representatives' vote verbatim (identical profiles ⇒ identical
    * votes). The expansion is OUTPUT-LINEAR — cost is the answer size —
    * but the answer itself is quadratic in identical-family size, so
    * families larger than `maxFamily` REFUSE loudly (per-row
    * assert_true, the audioEnergyGrid contract style) instead of
    * quietly materializing a flood's O(g²) clique; flood-safe consumers
    * (clustering, keep-one, dedup accounting) should consume the star
    * form, which is what x250/x256 register. */
  def audioNeardupPairs(profile: DataFrame, minVotes: Int = 12,
      maxBucket: Int = 1 << 16, windows: Int = 16,
      maxFamily: Int = 4096): DataFrame = {
    require(maxBucket >= 2,
      s"audioNeardupPairs: maxBucket=$maxBucket must be >= 2")
    require(maxFamily >= 1,
      s"audioNeardupPairs: maxFamily=$maxFamily must be >= 1")
    val prof = profGuarded(profile, minVotes, windows)
    val (famMap0, repProf) = repCollapse(prof)
    val famMap = famMap0
      .where(assert_true(col("fam_n") <= maxFamily,
        lit(s"audioNeardupPairs: identical-profile family larger than " +
          s"maxFamily=$maxFamily — the pair expansion of a flood family " +
          "is quadratic in its size; consume audioNeardupStars instead")).isNull)
    // intra-family expansion: every ordered member pair, all windows
    // matching at dq 0 (profiles identical by construction of the key)
    val m1 = famMap.select(col("rep"), col("media_id").as("a"),
      col("sig_n"))
    val m2 = famMap.select(col("rep"), col("media_id").as("b"))
    val intra = m1.join(m2, Seq("rep"))
      .where(col("a") < col("b") && col("sig_n") >= minVotes)
      .select(col("a"), col("b"), col("sig_n").cast("long").as("n_matched"),
        lit(0L).as("dq_max"))
    // cross-family expansion: the representative pair's vote, verbatim,
    // for every member cross pair
    val rp = repPairs(repProf, minVotes, maxBucket, windows)
    val fa = famMap.select(col("rep").as("ra"), col("media_id").as("ma"))
    val fb = famMap.select(col("rep").as("rb"), col("media_id").as("mb"))
    val cross = rp
      .join(fa, col("ra") === col("a"))
      .join(fb, col("rb") === col("b"))
      .select(least(col("ma"), col("mb")).as("a"),
        greatest(col("ma"), col("mb")).as("b"),
        col("n_matched"), col("dq_max"))
    intra.unionByName(cross)
  }

  /** Banded candidate generation + exact verify over DISTINCT-profile
    * representatives — the vote core shared by [[audioNeardupStars]]
    * and [[audioNeardupPairs]]. Input must be the rep-only profile. */
  private def repPairs(repProf: DataFrame, minVotes: Int, maxBucket: Int,
      windows: Int): DataFrame = {
    val (exactSides, probeSides) = audioBandSides(repProf, minVotes, windows)
    // hot-bucket guard: combinable count joined back (the exact side
    // defines occupancy — the probe side is its bounded x3^size). NO
    // broadcast hint (round 18): bucket cardinality GROWS with the
    // corpus, so a forced broadcast is a driver-side OOM at 100 TB —
    // AQE broadcasts while small, shuffles when not
    val bucketCounts = exactSides.groupBy("band", "key")
      .agg(count(lit(1)).as("__n"))
    val okBuckets = bucketCounts.where(col("__n") <= maxBucket)
      .select(col("band"), col("key"))
    val cand = probeSides.join(okBuckets, Seq("band", "key"))
      .join(exactSides, Seq("band", "key"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    // exact verify against the full profiles — result identical to the
    // all-window vote
    val pa = repProf.select(col("media_id").as("a"), col("c"),
      col("q").as("qa"))
    val pb = repProf.select(col("media_id").as("b"), col("c"),
      col("q").as("qb"))
    cand.join(pa, Seq("a")).join(pb, Seq("b", "c"))
      .groupBy(col("a"), col("b"))
      .agg(sum(when(abs(col("qa") - col("qb")) <= 1, 1L).otherwise(0L))
          .as("n_matched"),
        max(when(abs(col("qa") - col("qb")) <= 1,
          abs(col("qa") - col("qb")))).as("dq_max"))
      .where(col("n_matched") >= minVotes)
  }

  /** Identical-profile family collapse: (famMap, repProfile) where
    * famMap = (media_id, rep, sig_n, fam_n) — rep the family's min
    * media_id, sig_n the profile size, fam_n the family size — and
    * repProfile the profile rows of representatives only. One exchange
    * on the full profile vector (exact key, not a hash — no collision
    * caveat), then a rep-side semi join. */
  private def repCollapse(prof: DataFrame): (DataFrame, DataFrame) = {
    val sig = prof.groupBy(col("media_id"))
      .agg(expr("transform(sort_array(collect_list(struct(c, q))), s -> s.q)")
          .as("sig"),
        count(lit(1)).as("sig_n"))
    val reps = sig.groupBy(col("sig"))
      .agg(min(col("media_id")).as("rep"), count(lit(1)).as("fam_n"))
    val famMap = sig.join(reps, Seq("sig"))
      .select(col("media_id"), col("rep"), col("sig_n"), col("fam_n"))
      .localCheckpoint(false)
    val repProf = prof.join(
      famMap.where(col("media_id") === col("rep")).select("media_id"),
      Seq("media_id"), "left_semi")
    (famMap, repProf)
  }

  /** Max representative-side (band, key) bucket occupancy of the
    * [[audioNeardupStars]] banding for this profile — the observability
    * probe behind the capless-oracle parity contract: the engine DROPS
    * rep buckets past `maxBucket` while the x250 oracle votes
    * caplessly, so the gate corpus' proximity to the cap must be
    * MEASURED (ExtSpec asserts it sits far below 65536), never assumed.
    * Measured AFTER the identical-profile collapse, matching what the
    * candidate join actually sees. 0 for an empty profile. */
  private[graft] def audioBandOccupancy(profile: DataFrame,
      minVotes: Int = 12, windows: Int = 16): Long = {
    val prof = profGuarded(profile, minVotes, windows)
    val (_, repProf) = repCollapse(prof)
    val (exactSides, _) = audioBandSides(repProf, minVotes, windows)
    val r = exactSides.groupBy("band", "key")
      .agg(count(lit(1)).as("__n")).agg(max(col("__n"))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Window-index guard + checkpoint shared by every profile consumer:
    * the profile feeds several consumers (family collapse, banding,
    * both verify sides), so the scan-side energy grid (64 hex-substr
    * reads per payload) is paid once. A profile built with MORE windows
    * than the call assumes would silently break the pigeonhole
    * soundness (extra windows collapse into the last band and escape
    * its key) — refuse loudly per-row instead. */
  private def profGuarded(profile: DataFrame, minVotes: Int,
      windows: Int): DataFrame = {
    require(minVotes >= 1 && minVotes <= windows,
      s"audioNeardupPairs: minVotes=$minVotes out of [1, $windows]")
    profile
      .where(assert_true(col("c") >= 0 && col("c") < windows,
        lit(s"audioNeardupPairs: window index outside [0, $windows) — " +
          "pass windows= matching the audioEnergyProfile that built " +
          "this profile")).isNull)
      .localCheckpoint(false)
  }

  /** Banded-side construction over an (already guarded, rep-only)
    * profile: exact band-key side (b, band, key) and ±1-combo probe
    * side (a, band, key). */
  private def audioBandSides(profile: DataFrame, minVotes: Int,
      windows: Int): (DataFrame, DataFrame) = {
    // pigeonhole soundness needs bands >= violations + 1; MORE bands
    // stay sound (fewer violations per band can only leave more bands
    // intact), so also cap band size at 4 to bound the probe explosion
    // at 3^4 = 81 rows per band
    val nBands = math.max(windows - minVotes + 1,
      (windows + 3) / 4)
    val sizes = Array.tabulate(nBands)(i =>
      windows / nBands + (if (i < windows % nBands) 1 else 0))
    require(sizes.max <= 4, s"audioNeardupPairs: internal banding bug " +
      s"(size ${sizes.max})")
    val starts = sizes.scanLeft(0)(_ + _)
    val prof = profile
    // band of window c = number of band starts <= c, minus one
    val bandExpr = (1 until nBands)
      .map(i => s"(CASE WHEN c >= ${starts(i)} THEN 1 ELSE 0 END)")
      .foldLeft("0")((a, b) => s"$a + $b")
    // per-(media, band) level vector, window order pinned by sort_array.
    // Pinned once (round 18): the per-band slices below embed this
    // groupBy under EVERY union arm — nBands exact + nBands probe
    // slices re-ran the profile aggregation ~8-10× per query
    // (StageProbe: five identical scan+agg stages inside one x256
    // execution). The pinned frame is (media, band)-cardinality.
    val banded = prof
      .withColumn("band", expr(s"CAST($bandExpr AS INT)"))
      .groupBy(col("media_id"), col("band"))
      .agg(expr("transform(sort_array(collect_list(struct(c, q))), s -> s.q)")
        .as("qs"))
      .localCheckpoint(false)
    // composite exact key: levels are energy DIV quantum <= 1020, +2
    // shifts the -1 probe non-negative; base 4096 keeps a 4-window
    // band inside 2^48
    def keyOf(qsCol: String, deltas: Seq[Int]): Column =
      deltas.zipWithIndex.map { case (d, i) =>
        (element_at(col(qsCol), i + 1) + lit(d.toLong + 2L)) *
          lit(math.pow(4096.0, i).toLong)
      }.reduce(_ + _)
    // key arity must match the band's size, so build exact + probe
    // sides per band and union
    def bandSlice(df: DataFrame, band: Int) =
      df.where(col("band") === band)
    def combos(size: Int): Seq[Seq[Int]] =
      Seq.fill(size)(Seq(-1, 0, 1)).foldLeft(Seq(Seq.empty[Int])) {
        (acc, ds) => acc.flatMap(pfx => ds.map(pfx :+ _))
      }
    val exactSides = (0 until nBands).map { bIdx =>
      bandSlice(banded, bIdx).select(col("media_id").as("b"),
        col("band"), keyOf("qs", Seq.fill(sizes(bIdx))(0)).as("key"))
    }.reduce(_ unionAll _)
    val probeSides = (0 until nBands).map { bIdx =>
      val ks = combos(sizes(bIdx)).map(ds => keyOf("qs", ds))
      bandSlice(banded, bIdx).select(col("media_id").as("a"),
        col("band"), explode(array(ks: _*)).as("key"))
    }.reduce(_ unionAll _)
    (exactSides, probeSides)
  }

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
