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
  def toClusterWidth(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
