package graft.streaming

import graft.ext.{Sampling, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One slim curation arrival — everything the stream ever ships per
  * document. Every text-derived signal (fingerprint, language ID,
  * quality gate, sampling verdict) is computed SCAN-SIDE by
  * [[CurationStream.arrivalsFrom]] and the text is dropped before the
  * row moves: only ~50 bytes per document cross the wire or touch
  * state, exactly [[graft.ext.Curation.curationFlags]]' slim-exchange
  * posture carried into the stream. */
final case class CurationArrival(doc_id: Long, nfp: String, predicted: String,
    keep_lang: Int, keep_quality: Int, keep_sample: Int)

/** Cumulative per-document curation verdict. `is_canonical` is the
  * min-id election over the document's content fingerprint so far;
  * `keep_flag` is the conjunction the batch op emits. `keeper_changed`
  * = 1 on the row that WON an election this batch (first sight of the
  * fingerprint, or a smaller id displacing the old keeper) and on the
  * DEMOTION row re-issued for the displaced old keeper — the signal a
  * downstream upsert consumer keys invalidation on. */
final case class CurationVerdict(doc_id: Long, predicted: String,
    is_canonical: Int, keep_lang: Int, keep_quality: Int, keep_sample: Int,
    keep_flag: Int, keeper_changed: Int)

/** Streaming twin of [[graft.ext.Curation.curationFlags]] — the
  * LLM-pipeline family's flagship one-call curation sweep, maintained
  * incrementally: every arriving document gets its full flags row, and
  * the one cross-document flag (`is_canonical`, x1's min-id election
  * per normalized-content fingerprint) is held as keyed state, exactly
  * [[DedupStream]]'s state shape extended with the keeper's stateless
  * flags so a demotion can re-issue the OLD keeper's corrected row.
  *
  * Lateness/replay contract (the [[DedupStream]] contract): the
  * election is a MIN — commutative AND idempotent — so ANY arrival
  * order converges to the batch answer, and an at-least-once replay
  * re-emits rows VALUE-identical in every verdict column EXCEPT
  * `keeper_changed` (first-sight fires only on the original delivery
  * — a replayed keeper row carries keeper_changed=0; consumers must
  * upsert by doc_id, never dedup by whole-row equality). The keeper
  * itself can never change on a replay. The stateless flags
  * (language, quality, sampling) are pure per-row functions — order
  * and replay trivially cannot move them. Batch parity is therefore
  * total: the LATEST verdict per doc_id equals the batch
  * `curationFlags` row — spec-pinned over shuffled arrival, and
  * pinned again under a full-stream replay.
  *
  * State is O(1) per DISTINCT content fingerprint: the keeper's slim
  * arrival row (~50 bytes; text NEVER enters state). A 100k-copy
  * viral flood folds into one fingerprint's entry. Per-batch the group
  * handler buffers its OWN batch's arrivals (never state) to run the
  * election before emitting — bounded by the group's batch slice,
  * the same order of memory as the verdict rows the operator must
  * emit for that slice anyway.
  */
object CurationStream {

  /** Scan-side projection from a raw docs frame (static or streaming)
    * to [[CurationArrival]] rows: the same signals, computed by the
    * same expressions, as the batch `curationFlags` — `nfp` is the
    * md5 of the normalized text (hex here: the state key; the batch op
    * ships raw bytes on its shuffle, the stream pays 32 chars per
    * DISTINCT fingerprint in state, not per row moved), `predicted`
    * the stopword-argmax language, and the three stateless keep flags
    * evaluated eagerly so the stream ships verdict-ready rows. */
  def arrivalsFrom(docs: DataFrame, id: Column, text: Column,
      keepLangs: Seq[String] = Seq("en", "de"),
      rates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0): Dataset[CurationArrival] = {
    import docs.sparkSession.implicits._
    val rate = rates.foldLeft(lit(math.round(defaultRate * 10000)): Column) {
      case (acc, (s, r)) =>
        when(col("predicted") === s, lit(math.round(r * 10000))).otherwise(acc)
    }
    docs.select(
        id.cast("long").as("doc_id"),
        md5(TextAnalysis.normalize(text)).as("nfp"),
        TextAnalysis.langId(text).as("predicted"),
        TextAnalysis.wsTokenCount(text).as("n_words"),
        TextAnalysis.meanWordLen(text).as("mean_word_len"),
        TextAnalysis.bulletLineCount(text).as("bullet_lines"),
        size(TextAnalysis.lines(text)).as("n_lines"),
        lower(text).contains("lorem ipsum").cast("int").as("has_lorem"))
      .select(col("doc_id"), col("nfp"), col("predicted"),
        col("predicted").isin(keepLangs: _*).cast("int").as("keep_lang"),
        TextAnalysis.c4Keep(col("n_words"), col("mean_word_len"),
          col("has_lorem") === 1, col("bullet_lines"), col("n_lines"))
          .cast("int").as("keep_quality"),
        (Sampling.hashBucket(col("doc_id")) < rate).cast("int")
          .as("keep_sample"))
      .as[CurationArrival]
  }

  /** The stateful election + verdict emission (see object doc). */
  def verdicts(arrivals: Dataset[CurationArrival]): Dataset[CurationVerdict] = {
    import arrivals.sparkSession.implicits._
    arrivals.groupByKey(_.nfp)
      .flatMapGroupsWithState[CurationArrival, CurationVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (nfp: String, batch: Iterator[CurationArrival],
            state: GroupState[CurationArrival]) =>
          // Bounded buffer: THIS group's slice of THIS micro-batch only
          // (the election must finish before any verdict is right);
          // state itself stays the single keeper row.
          val arr = batch.toArray
          if (arr.isEmpty) Iterator.empty
          else {
            val prev = state.getOption
            val batchBest = arr.minBy(_.doc_id)
            val keeper = prev match {
              case Some(k) if k.doc_id <= batchBest.doc_id => k
              case _ => batchBest
            }
            val changed = prev.forall(_.doc_id != keeper.doc_id)
            state.update(keeper)
            def row(a: CurationArrival, canon: Int, kc: Int) =
              CurationVerdict(a.doc_id, a.predicted, canon, a.keep_lang,
                a.keep_quality, a.keep_sample,
                canon * a.keep_lang * a.keep_quality * a.keep_sample, kc)
            val out = arr.iterator.map { a =>
              val canon = if (a.doc_id == keeper.doc_id) 1 else 0
              row(a, canon, if (canon == 1 && changed) 1 else 0)
            }
            val demotion = prev match {
              case Some(old) if changed => Iterator.single(row(old, 0, 1))
              case _ => Iterator.empty
            }
            out ++ demotion
          }
      }
  }
}
