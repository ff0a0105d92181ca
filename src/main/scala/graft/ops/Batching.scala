package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chunked report batching.
  *
  * Reference (StreamTest.cpp:516-531, 573-582, 1239-1243): reports are
  * sent in fixed-size batches (30 rows / 30 programs / 2 vendors per
  * message) with a "(batch i/n)" header and, on the first batch, a total
  * count. Expressed relationally: a global rank over the report order,
  * `batch_id = floor((rn-1)/size)+1`, plus per-batch and global counts.
  *
  * Scale note: a naive `Window.orderBy` with no partition funnels ALL
  * rows through one task. Instead we do a two-phase rank that stays
  * entirely inside Catalyst (no RDD round-trip, so codegen and AQE still
  * apply): a distributed range-partitioned sort; `spark_partition_id()`
  * stamped on each row; a `row_number` window PARTITIONED by that id
  * (parallel, one task per source partition); and a broadcast join
  * against the per-partition cumulative offsets. The offsets come from a
  * `groupBy(_pid).count()` — numPartitions rows on the driver, not data
  * — which also yields the exact total, so `n_batches` is a literal
  * rather than a second aggregate pass.
  *
  * `rn`/`batch_id` stay INT for parity with the reference's int batch
  * counters; the rank is computed in LONG and the total is checked
  * against Int.MaxValue on the driver, so overflow fails fast instead of
  * silently wrapping negative.
  *
  * PRECONDITION (same contract as `RDD.zipWithIndex`): the input must be
  * deterministic — the offsets job and the ranked job each re-execute
  * the range sort, and global ranks are only correct because both jobs
  * reproduce the same partition assignment. A nondeterministic source
  * (`rand()`-filtered, sampled, or a re-listed directory that changed
  * between jobs) breaks that silently; `localCheckpoint` such inputs
  * before calling (we deliberately don't checkpoint here: it would pin
  * the full sorted data in block store and put an RDD scan in the
  * middle of an otherwise whole-stage-codegen plan — the wrong default
  * for the deterministic report queries this serves).
  */
object Batching {

  def withBatches(df: DataFrame, orderBy: Seq[Column], batchSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withPid = df.sort(orderBy: _*).withColumn("_pid", spark_partition_id())
    // RangePartitioning puts partition i's keys entirely before partition
    // i+1's, so global rank = (rows in earlier partitions) + local rank.
    val counts = withPid.groupBy("_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.iterator.map(_._2).sum
    require(total <= Int.MaxValue,
      s"withBatches: $total rows exceed the int rank range the report " +
        "format requires; chunk the input upstream")
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val off = acc; acc += c; (pid, off) }
    val nBatches = ((total + batchSize - 1) / batchSize).toInt
    val ranked = withPid
      .withColumn("_lrn", row_number().over(
        Window.partitionBy(col("_pid")).orderBy(orderBy: _*)))
      .join(broadcast(offsets.toSeq.toDF("_pid", "_off")), "_pid")
      .withColumn("rn", (col("_off") + col("_lrn")).cast("int"))
      .drop("_pid", "_off", "_lrn")
    ranked
      .withColumn("batch_id",
        (floor((col("rn") - lit(1)) / batchSize.toDouble) + 1).cast("int"))
      .withColumn("batch_rows", count(lit(1)).over(Window.partitionBy(col("batch_id"))))
      .withColumn("n_batches", lit(nBatches))
  }

  /** Driver-side chunking for the presentation layer (mirrors the
    * reference's `for (batch = 0; ...; batch += batchSize)` loops). */
  def chunk[T](rows: Seq[T], batchSize: Int): Seq[Seq[T]] =
    rows.grouped(batchSize).toSeq
}
