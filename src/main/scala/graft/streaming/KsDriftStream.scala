package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One KS-drift verdict for a key, re-issued each micro-batch as the
  * key's histogram grows: own/ref totals, the KS statistic in exact ppm
  * and the (smallest) bin where the CDF gap peaks — NULL when the
  * reference is empty, matching the batch operator's n_tot > n_s
  * contract. */
final case class KsDriftRow(k: String, n_own: Long, n_ref: Long,
    ks_ppm: Option[Long], ks_bin: Option[Long], drifted: Int)

/** Streaming twin of [[graft.ext.Profile.log2Ks]] — the max-deviation
  * drift monitor to [[Chi2DriftStream]]'s sum-of-squares: χ² reacts to
  * total reshaping, KS to the single largest CDF gap (a spike in one
  * length band trips KS first). Same production contract: each key's
  * ONLINE log2 histogram against a FIXED calibration histogram `ref`
  * (the batch operator's own-vs-REST is unknowable online), fed by the
  * same [[BinDelta]] rollup rows as the χ² monitor — one upstream
  * map-side rollup serves both monitors.
  *
  * Exactness: the batch plan's cross-multiplied CDF gap, here in
  * BigInt — `dx_b = |cumOwn_b·n_ref − cumRef_b·n_own|`, maximum over
  * the 63-bin spine with the batch tie rule (smallest bin at the max —
  * the `max(struct(dx, -b))` in the batch plan), then ONE truncating
  * div `ks_ppm = max·1e6 div (n_own·n_ref)`. Feeding the batch operator
  * the two-stratum corpus (own ∪ ref) makes "the rest" BE the
  * reference, so the stream's latest verdict equals that batch row
  * exactly (spec-pinned in MonitorStreamSpec).
  *
  * `drifted` trips at `thresholdPpm` (default 100000 ppm = D > 0.10 —
  * a 10-point CDF gap; calibrate per deployment, it is a parameter
  * precisely because KS critical values depend on n).
  *
  * O(bins) state per key — at most 63 longs. Emission discipline is
  * [[Chi2DriftStream]]'s: cumulative verdicts in Append mode, emitted
  * only when the micro-batch changed the histogram; malformed deltas
  * poison the query loudly; late bins fold commutatively; at-least-once
  * replays double-count (the documented trade).
  */
object KsDriftStream {

  private val Bins = 63

  def drifts(deltas: Dataset[BinDelta], ref: Map[Int, Long],
      thresholdPpm: Long = 100000L): Dataset[KsDriftRow] = {
    ref.foreach { case (b, n) =>
      require(b >= 0 && b < Bins && n >= 0, s"drifts: ref bin ($b, $n) out of range")
    }
    require(thresholdPpm > 0, s"drifts: thresholdPpm=$thresholdPpm must be > 0")
    val refArr = Array.tabulate(Bins)(b => ref.getOrElse(b, 0L))
    val n2 = refArr.sum
    import deltas.sparkSession.implicits._
    deltas.groupByKey(_.k)
      .flatMapGroupsWithState[Seq[Long], KsDriftRow](
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
          else if (n2 <= 0)
            Iterator.single(KsDriftRow(key, n1, 0L, None, None, 0))
          else {
            var cumOwn = BigInt(0)
            var cumRef = BigInt(0)
            var best = BigInt(-1)
            var bestBin = -1
            (0 until Bins).foreach { b =>
              cumOwn += own(b)
              cumRef += refArr(b)
              val dx = (cumOwn * n2 - cumRef * n1).abs
              if (dx > best) { best = dx; bestBin = b } // strict: keeps min bin
            }
            val ksPpm = (best * 1000000 / (BigInt(n1) * n2)).toLong
            Iterator.single(KsDriftRow(key, n1, n2, Some(ksPpm),
              Some(bestBin.toLong), if (ksPpm > thresholdPpm) 1 else 0))
          }
      }
  }
}
