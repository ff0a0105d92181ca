package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-rate anomaly scoring — the alerting analytic a monitoring
  * pipeline (reference StreamTest.cpp:830-944's rollup + §score family)
  * runs over its own detection-event rates: bucket the fact by time,
  * z-score each key's buckets against that key's own history, flag
  * outliers.
  *
  * Float discipline: mean and variance come from INTEGER window sums
  * (`n`, `Σcnt`, `Σcnt²`) — `var = (n·Σcnt² − (Σcnt)²) / (n·(n−1))` — so
  * the only float ops are two divisions, one correctly-rounded `sqrt`,
  * one subtraction and one final division, each bit-identical on any
  * IEEE-754 engine. The guard (`n·Σcnt² − (Σcnt)² > 0`) is integer too.
  * Overflow bound: exact while `n·Σcnt² < 2^53` — at larger per-key
  * volumes pre-aggregate to coarser buckets first (ANSI mode faults
  * loudly rather than wrapping).
  *
  * 100 TB posture: one combinable shuffle on (key, bucket), then one on
  * key shared by all three window sums; no join, no collect, no skew
  * amplification (per-key bucket counts are bounded by the time range).
  */
object RateAnomaly {

  /** Per-(key, bucket) event count with that key's z-score and an
    * |z| > `flagAt` outlier flag. `unit` is a `date_trunc` unit. */
  def rateZscores(df: DataFrame, key: Column, ts: Column, unit: String,
      flagAt: Double = 2.5): DataFrame = {
    val cnts = df.groupBy(key.as("key"), date_trunc(unit, ts).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("key"))
    val n = count(lit(1)).over(w)
    val s = sum(col("cnt")).over(w)
    val ss = sum(col("cnt") * col("cnt")).over(w)
    val varNum = n * ss - s * s
    val variance = varNum.cast("double") / (n * (n - 1)).cast("double")
    val z = when(n > lit(1L) && varNum > lit(0L),
      (col("cnt").cast("double") - s.cast("double") / n.cast("double")) /
        sqrt(variance))
      .otherwise(lit(0.0))
    cnts.select(col("key"), col("bucket"), col("cnt"), z.as("z"))
      .withColumn("is_outlier", (abs(col("z")) > flagAt).cast("int"))
  }
}
