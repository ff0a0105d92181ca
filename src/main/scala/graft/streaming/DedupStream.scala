package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (doc_id, content digest) arrival — the ONLY thing the dedup
  * stream ever ships: the digest is computed scan-side upstream
  * (`md5(text)`, x1's election key), so document text never enters
  * streaming state. */
final case class DocDigest(doc_id: Long, digest: String)

/** Cumulative per-digest verdict, re-issued whenever a micro-batch
  * touches the digest: the current keeper (min doc_id seen), the
  * arrivals counted so far, and whether THIS batch changed the keeper
  * (1 on first sight or on a smaller id arriving — the signal a
  * downstream invalidation consumer keys on). */
final case class DedupRow(digest: String, keeper: Long, n_seen: Long,
    keeper_changed: Int)

/** Streaming twin of x1/x30's exact dedup — the dedup-on-ingest a
  * training-data firehose runs: every arriving document folds into its
  * content-digest group and the group's keeper is always `min(doc_id)`
  * over everything seen, exactly the batch election
  * ([[graft.ext.Dedup.exactGroups]]' keeper; x30 anti-joins a batch
  * against history — THIS holds the history as keyed state instead).
  *
  * Lateness/replay contract (the strongest of the twin family, like
  * [[EwmaStream]]): the keeper is a MIN — commutative AND idempotent —
  * so ANY arrival order converges to the batch answer and an
  * at-least-once replay can never change the keeper. `n_seen` is a
  * plain count: replays double-count it (the documented trade —
  * deltas carry no identity; a consumer needing exact multiplicity
  * reads the batch x1 roll instead). Spec-pinned: shuffled arrival →
  * identical final keepers; replayed batch → keepers unchanged.
  *
  * O(1) state per digest (keeper + count — 16 bytes; text NEVER enters
  * state, the upstream projection ships only (id, digest)). State
  * cardinality is the number of DISTINCT contents, the same scale as
  * the batch dedup's shuffle key space; duplicates fold into their
  * group without growing state — the flood case (100k identical docs)
  * costs one digest's 16 bytes.
  */
object DedupStream {

  def keepers(arrivals: Dataset[DocDigest]): Dataset[DedupRow] = {
    import arrivals.sparkSession.implicits._
    arrivals.groupByKey(_.digest)
      .flatMapGroupsWithState[(Long, Long), DedupRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (digest: String, batch: Iterator[DocDigest],
            state: GroupState[(Long, Long)]) =>
          var (keeper, n) = state.getOption.getOrElse((Long.MaxValue, 0L))
          val before = keeper
          val hadState = state.exists
          var touched = false
          batch.foreach { d =>
            require(d.doc_id >= 0,
              s"keepers: digest '$digest' got doc_id ${d.doc_id} < 0 — " +
                "ids must be non-negative (Long.MaxValue is the unset sentinel)")
            if (d.doc_id < keeper) keeper = d.doc_id
            n += 1
            touched = true
          }
          if (!touched) Iterator.empty
          else {
            state.update((keeper, n))
            val changed = !hadState || keeper != before
            Iterator.single(DedupRow(digest, keeper, n, if (changed) 1 else 0))
          }
      }
  }
}
