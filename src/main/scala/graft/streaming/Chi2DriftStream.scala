package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One increment of a key's log2-value histogram: bin `b` (= ⌊log2 v⌋,
  * 0..62) gained `n` observations. The upstream scan's map-side rollup
  * produces these — counts, never raw values, cross the stream. */
final case class BinDelta(k: String, b: Int, n: Long)

/** One χ²-drift verdict for a key, re-issued each micro-batch as the
  * key's histogram grows: own/ref totals, occupied bins, and the χ² of
  * own-vs-reference in exact ppm (NULL when the reference is empty,
  * matching the batch operator's loud N2 = 0 contract). */
final case class Chi2DriftRow(k: String, n_own: Long, n_ref: Long,
    bins_occupied: Long, chi2_ppm: Option[Long],
    chi2_per_dof_ppm: Option[Long], drifted: Int)

/** Streaming twin of [[graft.ext.Profile.log2Chi2Drift]] — the drift
  * monitor a pipeline actually runs continuously: each key's ONLINE
  * log2 histogram tested against a FIXED calibration histogram (the
  * baseline corpus snapshot `ref`), instead of the batch operator's
  * own-vs-rest (unknowable online — "the rest" keeps growing too).
  *
  * Exactness: every per-bin term is the batch plan's single truncating
  * DIV, computed here in BigInt — `d = n1·nn − cb·N1`,
  * `term = d²·1e6 div (cb·N1·N2)` — over the union spine of bins
  * either side occupies. Feeding the batch operator the two-stratum
  * corpus (own ∪ ref) makes "the rest" BE the reference, so the
  * stream's latest verdict equals that batch row exactly (spec-pinned
  * in MonitorStreamSpec — the own-vs-rest and own-vs-ref forms coincide
  * at two strata).
  *
  * O(bins) state per key — at most 63 longs, regardless of how many
  * rows ever flowed. Emissions are cumulative verdicts (Append mode;
  * the LATEST row per key is the current verdict — a monitor reads the
  * newest, a forensics query reads the trajectory), and a verdict is
  * emitted only when the micro-batch actually CHANGED the histogram —
  * no duplicate trajectory rows. Malformed deltas (bin outside
  * [0, 63) or n ≤ 0) poison the query loudly, matching the `ref` map's
  * contract: the upstream rollup produces them in-range by
  * construction, so an invalid delta is a bug, not data. Counts are
  * commutative, so late bins fold in with no frontier; replays under
  * at-least-once delivery double-count (the documented trade — exactly-
  * once needs the upstream sink's idempotent batch ids, S6's contract).
  */
object Chi2DriftStream {

  private val Bins = 63

  def drifts(deltas: Dataset[BinDelta], ref: Map[Int, Long])
      : Dataset[Chi2DriftRow] = {
    ref.foreach { case (b, n) =>
      require(b >= 0 && b < Bins && n >= 0, s"drifts: ref bin ($b, $n) out of range")
    }
    val n2 = ref.valuesIterator.sum
    import deltas.sparkSession.implicits._
    deltas.groupByKey(_.k)
      .flatMapGroupsWithState[Seq[Long], Chi2DriftRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[BinDelta],
            state: GroupState[Seq[Long]]) =>
          val own = state.getOption
            .map(_.toArray).getOrElse(Array.fill(Bins)(0L))
          var changed = false
          batch.foreach { d =>
            require(d.b >= 0 && d.b < Bins && d.n > 0,
              s"drifts: key '$key' got invalid BinDelta(b=${d.b}, n=${d.n}) " +
                s"— the upstream rollup must emit bins in [0, $Bins) with n > 0")
            own(d.b) += d.n
            changed = true
          }
          if (changed) state.update(own.toSeq)
          val n1 = own.sum
          if (!changed || n1 <= 0) Iterator.empty
          else {
            val nn = BigInt(n1) + n2
            var chi2 = BigInt(0)
            var bins = 0L
            (0 until Bins).foreach { b =>
              val cb = BigInt(own(b)) + BigInt(ref.getOrElse(b, 0L))
              if (cb > 0) {
                bins += 1
                if (n2 > 0) {
                  val d = BigInt(own(b)) * nn - cb * n1
                  val den = cb * n1 * n2
                  chi2 += d * d * 1000000 / den
                }
              }
            }
            val chi2Opt = if (n2 > 0) Some(chi2.toLong) else None
            val perDof = chi2Opt.flatMap(c =>
              if (bins >= 2) Some(c / (bins - 1)) else None)
            Iterator.single(Chi2DriftRow(key, n1, n2, bins, chi2Opt, perDof,
              if (perDof.exists(_ > 2000000L)) 1 else 0))
          }
      }
  }
}
