package graft.streaming

import graft.ext.Packing
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One chunk-dedup cell arrival — the batch op's exact wire shape
  * ([[graft.ext.Dedup.chunkDedup]]'s (hash, doc) CELLS): `h` the md5
  * hex of one non-empty fixed-grid block, `doc_id` the document, `c`
  * how many times the block value occurs in that document. Text never
  * enters the stream — cells are computed scan-side by
  * [[ChunkDedupStream.cellsFrom]] and one cell is ≤ ~50 bytes.
  * Contract: at most ONE cell per (h, doc_id) pair per logical
  * document delivery (the batch wire's uniqueness); at-least-once
  * replays of the SAME cell are safe, partial re-counts are not. */
final case class ChunkCell(h: String, doc_id: Long, c: Long)

/** Cumulative per-(hash, doc) duplication verdict. `is_dup` = 1 when
  * the hash has been seen in ≥ minDocs DISTINCT documents so far;
  * `dup_changed` = 1 on the row that FLIPPED the hash to duplicated
  * this batch (including the CORRECTION rows re-issued for documents
  * that arrived before the flip — the invalidation signal a downstream
  * upsert consumer keys on). Consumers upsert by (h, doc_id); the
  * latest row per pair aggregated by doc reproduces the batch
  * [[graft.ext.Dedup.chunkDedup]] accounting exactly. */
final case class ChunkDupRow(h: String, doc_id: Long, c: Long,
    is_dup: Int, dup_changed: Int)

/** Streaming twin of [[graft.ext.Dedup.chunkDedup]] — chunk-level
  * (paragraph/block) exact-dedup accounting maintained incrementally,
  * the 14th monitor twin: with [[CurationStream]] covering whole-doc
  * dedup-on-ingest, THIS covers the block grid, completing "every
  * first-pass dedup surface has an incremental form".
  *
  * State shape: keyed by chunk hash, the state is the ≤ (minDocs−1)
  * SMALLEST distinct document ids seen (with their cell counts) until
  * the hash flips duplicated, then the sticky flip marker plus the
  * same bounded id set for idempotence — O(minDocs) per DISTINCT chunk
  * value, never per arrival; a 210k-doc viral block costs one entry.
  *
  * Lateness/replay contract (the [[DedupStream]] family's, and
  * STRONGER on values): the flip condition "≥ minDocs distinct docs"
  * is monotone and the stored id set is a bounded MIN set —
  * commutative and idempotent — so ANY arrival order converges to the
  * batch verdict and an at-least-once replay can never un-flip a hash
  * or change a stored id. Unlike DedupStream's `n_seen`, the emitted
  * `c` is carried per cell (not accumulated), so replayed rows are
  * VALUE-identical in every column except `dup_changed` (flip fires
  * only on the original delivery; replays of pre-flip cells after the
  * flip re-emit is_dup=1 with dup_changed=0). Consumers must upsert by
  * (h, doc_id), never dedup by whole-row equality. Batch parity is
  * total and spec-pinned over shuffled arrival and full replay:
  * latest-row-per-(h, doc) summed per doc == batch chunkDedup.
  */
object ChunkDedupStream {

  /** Scan-side projection from a docs frame (static or streaming) to
    * [[ChunkCell]] rows: the SAME grid, empty/NULL-chunk filter, md5,
    * and per-(h, doc) collapse as the batch op — parity by shared
    * construction, not re-implementation. */
  def cellsFrom(docs: DataFrame, id: Column, text: Column,
      window: Int = 200): Dataset[ChunkCell] = {
    import docs.sparkSession.implicits._
    Packing.chunk(docs.select(id.as("doc_id"), text.as("text")),
        col("doc_id"), col("text"), window = window, overlap = 0)
      .where(col("chunk").isNotNull && length(col("chunk")) > 0)
      .select(md5(col("chunk")).as("h"), col("doc_id"))
      .groupBy("h", "doc_id").agg(count(lit(1)).as("c"))
      .as[ChunkCell]
  }

  /** Per-hash bounded state: the smallest distinct (doc_id, c) pairs
    * seen (≤ minDocs−1 before the flip; kept after for idempotence)
    * and the sticky duplicated marker. */
  private[streaming] final case class HashState(
      docs: List[(Long, Long)], dup: Boolean)

  /** The stateful verdict stream (see object doc). `minDocs` ≥ 2,
    * matching the batch op's contract. */
  def verdicts(cells: Dataset[ChunkCell], minDocs: Int = 2)
      : Dataset[ChunkDupRow] = {
    require(minDocs >= 2, s"verdicts: minDocs=$minDocs must be >= 2")
    import cells.sparkSession.implicits._
    cells.groupByKey(_.h)
      .flatMapGroupsWithState[HashState, ChunkDupRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (h: String, batch: Iterator[ChunkCell],
            state: GroupState[HashState]) =>
          // Bounded buffer: this group's slice of THIS micro-batch only
          // (cells per hash per batch ≤ docs delivered this batch).
          val arr = batch.toArray
          if (arr.isEmpty) Iterator.empty
          else {
            val st0 = state.getOption.getOrElse(HashState(Nil, dup = false))
            // fold the batch's distinct docs into the bounded min set
            val merged = (st0.docs ++ arr.map(a => (a.doc_id, a.c)))
              .groupBy(_._1).map { case (d, vs) =>
                require(vs.map(_._2).distinct.size == 1,
                  s"verdicts: hash '$h' doc $d re-arrived with a DIFFERENT " +
                    "cell count — cells must be unique per (hash, doc); " +
                    "partial re-counts violate the wire contract")
                (d, vs.head._2)
              }.toList.sortBy(_._1)
            val nowDup = st0.dup || merged.size >= minDocs
            val flipped = nowDup && !st0.dup
            // state keeps only the smallest minDocs ids: enough to (a)
            // re-derive the flip on replay, (b) stay idempotent under
            // any order — later ids never displace the decision
            val st1 = HashState(merged.take(minDocs), nowDup)
            state.update(st1)
            val dupInt = if (nowDup) 1 else 0
            val batchRows = arr.map(a =>
              ChunkDupRow(h, a.doc_id, a.c, dupInt, if (flipped) 1 else 0))
            // corrections: docs stored BEFORE this batch flipped the
            // hash get their upgraded row re-issued (skip docs already
            // emitted in this batch's own rows)
            val inBatch = arr.map(_.doc_id).toSet
            val corrections =
              if (!flipped) Iterator.empty
              else st0.docs.filterNot(d => inBatch(d._1)).iterator
                .map { case (d, c) => ChunkDupRow(h, d, c, 1, 1) }
            batchRows.iterator ++ corrections
          }
      }
  }
}
