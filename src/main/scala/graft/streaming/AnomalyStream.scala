package graft.streaming

import org.apache.spark.sql.Dataset

/** Streaming twin of [[graft.ops.RateAnomaly]]: per-key bucket counts
  * arrive as a stream; each count is z-scored against the key's OWN
  * history-so-far (the integer state `(n, Σc, Σc²)` — the same exact
  * variance arithmetic as the batch form, held in `GroupState` instead
  * of a window), then folded into the state. An alert row is emitted on
  * the micro-batch where the outlier arrives — the monitoring daemon's
  * "rate spiked NOW" shape, with no rescan of history.
  *
  * State is three longs per key — millions of keys fit in executor
  * memory, and the HDFS/RocksDB state store shards them by key.
  */
object AnomalyStream {

  case class BucketCount(key: Long, bucket: java.sql.Timestamp, cnt: Long)
  case class RateState(n: Long, s: Long, ss: Long)
  case class RateAlert(key: Long, bucket: java.sql.Timestamp, cnt: Long, z: Double)

  /** Alerts for buckets whose |z| against the key's history exceeds
    * `flagAt`, once at least `minHistory` buckets have been folded in.
    * Buckets inside one micro-batch are processed in time order. */
  def alerts(counts: Dataset[BucketCount], flagAt: Double, minHistory: Int)
      : Dataset[RateAlert] = {
    import counts.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    counts.groupByKey(_.key)
      .flatMapGroupsWithState[RateState, RateAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, batch: Iterator[BucketCount], state: GroupState[RateState]) =>
          val s0 = state.getOption.getOrElse(RateState(0L, 0L, 0L))
          var n = s0.n; var s = s0.s; var ss = s0.ss
          val out = batch.toSeq.sortBy(_.bucket.getTime).flatMap { b =>
            // score BEFORE folding in (self-inclusion would dampen z).
            // n·Σc² − (Σc)² through BigInt: in plain Long arithmetic the
            // product silently wraps once a key's history passes ~2^31.5
            // count-mass (the batch twin runs the same formula under ANSI
            // SQL, which would throw; the JVM would not), and a wrapped
            // negative just suppresses alerts with no error. Two BigInt
            // multiplies per event is noise next to state-store access.
            val varNum = BigInt(n) * BigInt(ss) - BigInt(s) * BigInt(s)
            val alert =
              if (n >= minHistory && varNum > 0) {
                val variance = varNum.toDouble / (n.toDouble * (n - 1).toDouble)
                val z = (b.cnt.toDouble - s.toDouble / n.toDouble) /
                  math.sqrt(variance)
                if (math.abs(z) > flagAt) Some(RateAlert(key, b.bucket, b.cnt, z))
                else None
              } else None
            // exact accumulation: Σc² itself is a plain Long, so at
            // extreme count-mass it could wrap BEFORE the BigInt product
            // above ever sees it — addExact/multiplyExact turn that
            // silent corruption into an ArithmeticException at the
            // offending event (restart with a wider state type; no key
            // with < 2^63 total squared count-mass ever hits it)
            n += 1
            s = Math.addExact(s, b.cnt)
            ss = Math.addExact(ss, Math.multiplyExact(b.cnt, b.cnt))
            alert
          }
          state.update(RateState(n, s, ss))
          out.iterator
      }
  }
}
