package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chunked report batching.
  *
  * Reference (StreamTest.cpp:516-531, 573-582, 1239-1243): reports are
  * sent in fixed-size batches (30 rows / 30 programs / 2 vendors per
  * message) with a "(batch i/n)" header and, on the first batch, a total
  * count. Expressed relationally: `row_number` over the report order,
  * `batch_id = floor((rn-1)/size)+1`, plus per-batch and global counts.
  *
  * The global `Window.orderBy` (no partition) funnels through a single
  * task — correct for report-sized data (the reference collects these
  * rows into one process anyway), but NOT for 100 TB facts; batch
  * upstream aggregates, not raw events.
  */
object Batching {

  def withBatches(df: DataFrame, orderBy: Seq[Column], batchSize: Int): DataFrame = {
    val w = Window.orderBy(orderBy: _*)
    df.withColumn("rn", row_number().over(w))
      .withColumn("batch_id", (floor((col("rn") - 1) / batchSize.toDouble) + 1).cast("int"))
      .withColumn("batch_rows", count(lit(1)).over(Window.partitionBy(col("batch_id"))))
      .withColumn("n_batches",
        ceil(count(lit(1)).over(Window.partitionBy()) / batchSize.toDouble).cast("int"))
  }

  /** Driver-side chunking for the presentation layer (mirrors the
    * reference's `for (batch = 0; ...; batch += batchSize)` loops). */
  def chunk[T](rows: Seq[T], batchSize: Int): Seq[Seq[T]] =
    rows.grouped(batchSize).toSeq
}
