package graft.ext

import org.apache.spark.sql.DataFrame

/** Scan starvation guard, shared form (rounds 16–17).
  *
  * A parquet scan's partition count is governed by row-group splits, so
  * a SMALL file (one or two row groups) runs everything downstream of
  * the scan on one or two cores — fatal when the next stage MULTIPLIES
  * rows (corpus×centroid streams, per-word shingle explodes: x21 read
  * 143 s at ~1.7 cores; x66's 50M-shingle explode read 30 s at ~1.7
  * cores on the sf1 corpus). When the scan has fewer partitions than
  * the cluster's parallelism, the input is spread first: the exchange
  * ships N small pre-explosion rows to buy the k×N downstream work
  * full-width. At 100 TB scans arrive pre-partitioned and this is a
  * no-op — the guard only triggers on under-split inputs. */
object Spread {
  /** Below this input size the spread is a net LOSS: the exchange plus
    * 32 downstream task launches cost more than finishing the k×N work
    * on the scan's own 1-2 cores (measured round 17: gating the spread
    * off at sf0.1 — 0.6 MB documents — returned the multimodal family's
    * in-pool walls from 12-15 s to 4-6 s, while the sf1 corpus — 6 MB
    * compressed, ~100 MB of explode output — keeps its 4-7× spread
    * wins). Compressed plan-stats bytes, so the threshold is a property
    * of the SCAN, not the blow-up factor. */
  private val MinSpreadBytes = 2L * 1000 * 1000

  def toClusterWidth(df: DataFrame): DataFrame = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < MinSpreadBytes) return df
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
