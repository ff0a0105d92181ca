package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The one-call curation decision: every per-document keep/drop signal
  * a pre-training sweep needs, composed from the individually-oracled
  * operators — normalization-keyed exact dedup (x1/x25), heuristic
  * language ID (x4), C4/Gopher quality gates (x42), and deterministic
  * per-language hash downsampling (x27) — into a single flags row per
  * document. A user runs ONE query and gets the corpus keep-list plus
  * the reason each dropped doc dropped.
  *
  * 100 TB posture: every text-derived signal (fingerprint, language,
  * quality counts) is computed SCAN-SIDE in one projection, and the
  * text is dropped before anything moves — the only full-corpus
  * exchange carries (doc_id, 16-byte fingerprint, a few small ints),
  * the slim canonical-election shuffle on the content fingerprint.
  * Language filter, quality gate, and sampling are zero-shuffle row
  * predicates. Dropping a signal column from the output does not
  * un-shuffle anything, so compute them all; the marginal flag is free.
  */
object Curation {

  /** Per-document curation flags:
    * `(doc_id, predicted, is_canonical, keep_lang, keep_quality,
    * keep_sample, keep_flag)` — all flags 0/1 ints, `keep_flag` their
    * conjunction.
    *
    *   - `is_canonical`: this doc is the min-id owner of its normalized
    *     content fingerprint (later byte-near-identical copies drop);
    *   - `keep_lang`: predicted language (CJK check + stopword argmax)
    *     is in `keepLangs`;
    *   - `keep_quality`: the C4/Gopher composite (word-count floor,
    *     mean-word-length band, lorem-ipsum ban, bullet-ratio cap);
    *   - `keep_sample`: deterministic md5-hash downsample at the
    *     PREDICTED language's rate (reproducible on any cluster, and
    *     keyed on what the pipeline believes the doc is, not on
    *     possibly-absent source metadata). */
  def curationFlags(docs: DataFrame, id: Column, text: Column,
      keepLangs: Seq[String] = Seq("en", "de"),
      rates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0): DataFrame = {
    val slim = docs.select(
      id.as("doc_id"),
      // unhex: the election key is the 16 raw digest bytes, not the
      // 32-char hex rendering — half the width on the only exchange
      // that scales with the corpus
      unhex(md5(TextAnalysis.normalize(text))).as("nfp"),
      TextAnalysis.langId(text).as("predicted"),
      TextAnalysis.wsTokenCount(text).as("n_words"),
      TextAnalysis.meanWordLen(text).as("mean_word_len"),
      TextAnalysis.bulletLineCount(text).as("bullet_lines"),
      size(TextAnalysis.lines(text)).as("n_lines"),
      lower(text).contains("lorem ipsum").cast("int").as("has_lorem"))
    val rate = rates.foldLeft(lit(math.round(defaultRate * 10000)): Column) {
      case (acc, (s, r)) =>
        when(col("predicted") === s, lit(math.round(r * 10000))).otherwise(acc)
    }
    // canonical election as a map-side-combinable min + join back, NOT a
    // window over the fingerprint: a viral doc (100k+ byte-identical
    // copies, the tripwire's flood) would put its entire nfp group into
    // one WindowExec buffer, while the agg combines per-partition and
    // the join's hot bucket streams (and AQE can skew-split it).
    // The keeper branch re-reads the corpus but computes ONLY the
    // fingerprint — the expensive signals (language ID's 20 stopword
    // scans, quality counts) run once, on the probe side
    val keepers = docs
      .select(id.as("doc_id"), unhex(md5(TextAnalysis.normalize(text))).as("nfp"))
      .groupBy(col("nfp")).agg(min(col("doc_id")).as("keep_id"))
    slim
      .join(keepers, Seq("nfp"))
      .withColumn("is_canonical", (col("doc_id") === col("keep_id")).cast("int"))
      .withColumn("keep_lang", col("predicted").isin(keepLangs: _*).cast("int"))
      .withColumn("keep_quality",
        TextAnalysis.c4Keep(col("n_words"), col("mean_word_len"),
          col("has_lorem") === 1, col("bullet_lines"), col("n_lines")))
      .withColumn("keep_sample", (Sampling.hashBucket(col("doc_id")) < rate).cast("int"))
      .withColumn("keep_flag",
        (col("is_canonical") * col("keep_lang") * col("keep_quality") *
          col("keep_sample")).cast("int"))
      .select("doc_id", "predicted", "is_canonical", "keep_lang",
        "keep_quality", "keep_sample", "keep_flag")
  }
}
