package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Chunked report batching.
  *
  * Reference (StreamTest.cpp:516-531, 573-582, 1239-1243): reports are
  * sent in fixed-size batches (30 rows / 30 programs / 2 vendors per
  * message) with a "(batch i/n)" header and, on the first batch, a total
  * count. Expressed relationally: a global rank over the report order,
  * `batch_id = floor((rn-1)/size)+1`, plus per-batch and global counts.
  *
  * Scale note: a naive `Window.orderBy` with no partition funnels ALL
  * rows through one task. Instead we do a two-phase rank: a distributed
  * range-partitioned sort, then `zipWithIndex` on the sorted RDD —
  * Spark's zipWithIndex computes per-partition sizes in one lightweight
  * count job and assigns each partition a cumulative offset, so every
  * partition numbers its own rows in parallel. Same output, no
  * single-task funnel. `n_batches` likewise avoids the empty global
  * window (`Window.partitionBy()`) by broadcasting a 1-row aggregate.
  *
  * `rn`/`batch_id` stay INT for parity with the reference's int batch
  * counters (report-sized output, not fact-sized).
  */
object Batching {

  def withBatches(df: DataFrame, orderBy: Seq[Column], batchSize: Int): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.sort(orderBy: _*)
    val schema = sorted.schema.add("rn", LongType, nullable = false)
    // Phase 1: count per-partition sizes; phase 2: number rows with the
    // partition's cumulative offset. Both phases are fully parallel.
    val ranked = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) },
      schema)
    val withBatch = ranked
      .withColumn("rn", col("rn").cast("int"))
      .withColumn("batch_id", (floor((col("rn") - 1) / batchSize.toDouble) + 1).cast("int"))
    val nb = withBatch.agg(
      ceil(count(lit(1)) / batchSize.toDouble).cast("int").as("n_batches"))
    withBatch
      .withColumn("batch_rows", count(lit(1)).over(Window.partitionBy(col("batch_id"))))
      .crossJoin(broadcast(nb))
  }

  /** Driver-side chunking for the presentation layer (mirrors the
    * reference's `for (batch = 0; ...; batch += batchSize)` loops). */
  def chunk[T](rows: Seq[T], batchSize: Int): Seq[Seq[T]] =
    rows.grouped(batchSize).toSeq
}
