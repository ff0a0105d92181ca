package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vendor flow-score histogram.
  *
  * Reference (StreamTest.cpp:441-464): classify catalog rows into vendors
  * by URL LIKE prefixes (CASE ladder), restrict to the active universe
  * (`target_matching_id >= 237 AND is_del = 0 AND stream_type <> 'XXX'`),
  * keep only the named vendors (IN list), then per vendor count scores in
  * `< 60`, `BETWEEN 60 AND 80`, `> 80 AND <= 100` plus COUNT(*).
  * Percentages are `count * 100.0 / total`, 0 when total = 0
  * (VendorFlowStat, StreamTest.h:108-119).
  */
object VendorStats {

  final case class VendorRule(prefixes: Seq[String], label: String)

  /** CASE ladder over URL prefixes; first matching rule wins. */
  def vendorColumn(url: Column, rules: Seq[VendorRule], fallback: String = "Other"): Column = {
    val ladder = rules.foldLeft(null: Column) { (acc, r) =>
      val cond = r.prefixes.map(p => url.like(p + "%")).reduce(_ || _)
      if (acc == null) when(cond, r.label) else acc.when(cond, r.label)
    }
    if (ladder == null) lit(fallback) else ladder.otherwise(fallback)
  }

  /** Histogram over an active-universe catalog (FIXTURES.md §A2 schema). */
  def vendorFlowStats(
      sources: DataFrame,
      rules: Seq[VendorRule],
      minMatchingId: Int = 237): DataFrame = {
    val labels = rules.map(_.label)
    def bucket(cond: Column) = sum(when(cond, 1).otherwise(0)).cast("int")
    val fs = col("flow_score")
    sources
      // try_cast: the reference's MySQL comparison silently coerces
      // empty/non-numeric ids (which occur upstream) instead of erroring;
      // a null cast simply excludes the row, matching that behavior.
      .where(col("target_matching_id").try_cast("int") >= minMatchingId &&
        col("is_del") === 0 && col("stream_type") =!= "XXX")
      .withColumn("vendor", vendorColumn(col("url"), rules))
      .where(col("vendor").isin(labels: _*))
      .groupBy(col("vendor"))
      .agg(
        bucket(fs < 60).as("count_lt60"),
        bucket(fs.between(60, 80)).as("count_60_80"),
        bucket(fs > 80 && fs <= 100).as("count_80_100"),
        count(lit(1)).cast("int").as("total"))
      .withColumn("pct_lt60", pct(col("count_lt60"), col("total")))
      .withColumn("pct_60_80", pct(col("count_60_80"), col("total")))
      .withColumn("pct_80_100", pct(col("count_80_100"), col("total")))
  }

  /** `count * 100.0 / total`, 0.0 when total = 0 (StreamTest.h:116-118). */
  def pct(cnt: Column, total: Column): Column =
    when(total === 0, 0.0).otherwise(cnt * 100.0 / total)
}
