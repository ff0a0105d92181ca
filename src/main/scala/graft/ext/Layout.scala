package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering keys.
  *
  * At 100 TB the scan you avoid is worth more than the scan you
  * optimize: parquet keeps min/max stats per row group, so sorting the
  * write by a key that interleaves the bits of two filter columns
  * clusters BOTH dimensions into every file — a range predicate on
  * either column (or both) then prunes most row groups, where a plain
  * sort only serves its leading column. The key is pure integer bit
  * math (codegen, zero shuffle to compute; one range exchange to sort
  * the write by it).
  */
object Layout {

  /** Morton key: interleave the low `bits` bits of `a` (even positions)
    * and `b` (odd positions). Inputs are treated as non-negative ints;
    * 2·bits ≤ 62 keeps everything in a signed long. */
  def zorderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms: Seq[Column] = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** The same key as portable SQL (for oracles and documentation). */
  def zorderKeySql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** Cluster a frame for writing: range-partition and sort by the
    * Morton key of the two filter columns (plus a unique tiebreaker for
    * deterministic file contents). */
  def zorderWrite(df: DataFrame, a: Column, b: Column, bits: Int,
      tiebreak: Column): DataFrame = {
    val keyed = df.withColumn("__z", zorderKey(a, b, bits))
    keyed.repartitionByRange(col("__z"), tiebreak)
      .sortWithinPartitions(col("__z"), tiebreak)
      .drop("__z")
  }
}
