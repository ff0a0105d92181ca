package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence preparation for LLM training: overlapping document
  * chunking and shard-parallel sequence packing.
  *
  * Both are pure integer/substring arithmetic over one explode or one
  * partitioned window — no UDFs, no driver loops, embarrassingly
  * parallel per shard at 100 TB.
  */
object Packing {

  /** Split each document into fixed-size character windows of `window`
    * with `overlap` characters shared between consecutive chunks
    * (stride = window - overlap). Every document yields at least one
    * chunk; the final chunk may be short. One `explode` — rows grow by
    * len/stride, nothing shuffles. */
  def chunk(df: DataFrame, id: Column, text: Column,
      window: Int, overlap: Int): DataFrame = {
    require(window > overlap && overlap >= 0,
      s"need window > overlap >= 0, got window=$window overlap=$overlap")
    val stride = window - overlap
    val n = length(text)
    // chunks start at 0, stride, 2·stride, …; count =
    // max(1, ceil((len - overlap) / stride)) = max(1, (len + stride - 1
    // - overlap) floor-div stride) — the numerator is always >= 0, so
    // floor of the double division is exact integer math on both engines
    val nChunks = greatest(lit(1L),
      floor((n.cast("long") + lit(stride - 1 - overlap)) / lit(stride)).cast("long"))
    df.select(id.as("doc_id"), text.as("text"))
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .select(col("doc_id"), col("chunk_id"),
        substring(col("text"), (col("chunk_id") * stride + 1).cast("int"), lit(window))
          .as("chunk"))
  }

  /** Shard-parallel greedy packing (the standard concat-then-cut
    * pretraining layout): within each `shard`, documents concatenate in
    * `order` order and are cut into `target`-sized sequences; each doc
    * reports the pack it STARTS in and its offset there. One
    * partitioned window (cumulative sum) — each shard packs
    * independently, so parallelism = shard count and no global funnel. */
  def packAssignments(df: DataFrame, shard: Column, order: Column,
      len: Column, target: Int): DataFrame = {
    require(target > 0, "target must be positive")
    val w = Window.partitionBy(shard).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before", coalesce(sum(len.cast("long")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("cum_before") / target))
      .withColumn("pack_offset", pmod(col("cum_before"), lit(target.toLong)))
      .drop("cum_before")
  }
}
