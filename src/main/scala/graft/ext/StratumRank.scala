package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase per-stratum rank / running sum — the shared scale-safe
  * replacement for every `OVER (PARTITION BY stratum ORDER BY ...)`
  * whose stratum is LOW-cardinality (sources, languages, log2 bins,
  * cohorts, days): a plain window there caps the rank's parallelism at
  * the stratum cardinality, so a fat stratum over a 100 TB corpus sorts
  * multi-TB in a single task. Round 14 generalizes the idiom the repo
  * already used in `Batching.withBatches` / `Profile.globalRank` /
  * `Sampling.stratumHashRank` so ONE implementation carries the whole
  * family: x48/x249 (hash rank), x89 (token-budget cumsum), x97/x98
  * (curriculum/quantile ranks), x103/x126/x156 (order-statistic
  * quantiles), x128 (MAD medians), x163 (allocation rank), x164
  * (weighted-median cumsum).
  *
  * Decomposition (value-identical to the single window when `order` is
  * a total order; rank-permutation-identical under ties, which keeps
  * every position-pick `rn = pos` value-stable because tied rows share
  * the ordering value):
  *
  *   1. ONE range-partitioned sort on (stratum-shadow, order...) — a
  *      fat stratum SPANS partitions instead of landing in one task;
  *   2. per-(partition, stratum) weight totals to the driver
  *      (O(partitions × strata) rows, loud refusal past 2^20 — the
  *      helper is FOR low-cardinality strata; user-keyed windows
  *      should stay hash windows, see `lowCardStrata` call sites);
  *   3. broadcast prefix offsets;
  *   4. a (partition, stratum)-local window + offset add.
  *
  * Strata are bookkept by an injective string shadow ("n:" for NULL,
  * "v:" + canonical string otherwise) so a NULL stratum is its own
  * group (SQL PARTITION BY semantics) and real values cannot collide
  * with the sentinel. Order columns are ranked ASC NULLS LAST —
  * DuckDB/ANSI's default, pinned explicitly because Spark's ASC is
  * nulls-first; callers with nullable order keys get the
  * engine-portable order.
  *
  * `localCheckpoint` pins ONE sort: the offsets job and the rank job
  * must see identical partition boundaries (range boundaries are
  * sampled — nondeterministic across jobs).
  */
object StratumRank {

  /** Rank rows 1..n within `stratum` by `order` (asc nulls last).
    * Output: input columns + `__s` (the stratum value) + `__rn` (LONG),
    * plus — when `withTotal` — `__cs` (LONG, the stratum's TOTAL row
    * count). The total is FREE: the offsets table the decomposition
    * already collects at the driver knows every stratum's final running
    * sum, so it rides the existing broadcast join — quantile/median
    * callers previously paid a whole extra pass over the input for
    * exactly this number (round 18). Equivalent to `row_number() OVER
    * (PARTITION BY stratum ORDER BY order...)` with ANSI nulls-last, at
    * cluster-partition parallelism. */
  def rank(df: DataFrame, stratum: Column, order: Seq[Column],
      withTotal: Boolean = false): DataFrame =
    twoPhase(df, stratum, order, lit(1L), "__rn", withTotal)

  /** Inclusive running sum of `weight` within `stratum` by `order`
    * (asc nulls last; pass a TOTAL order — ties would make per-row
    * running sums order-dependent). Output: input + `__s` + `__cum`,
    * plus `__cs` (the stratum's total weight) when `withTotal`. */
  def cumsum(df: DataFrame, stratum: Column, order: Seq[Column],
      weight: Column, withTotal: Boolean = false): DataFrame =
    twoPhase(df, stratum, order, weight.cast("long"), "__cum", withTotal)

  private def twoPhase(df: DataFrame, stratum: Column, order: Seq[Column],
      weight: Column, out: String, withTotal: Boolean = false): DataFrame = {
    require(order.nonEmpty, "StratumRank: order columns required")
    val spark = df.sparkSession
    import spark.implicits._
    val oNames = order.indices.map(i => s"__o$i")
    // the internal bookkeeping columns are added via withColumn, which
    // silently REPLACES same-named caller columns — a frame already
    // carrying e.g. __s or _pid would get corrupted ranks with no error
    val reserved = Set("__s", "__sk", "__w", "__cs", "_pid", "_lc", "_off", out) ++ oNames
    val clash = df.columns.toSet intersect reserved
    require(clash.isEmpty,
      s"StratumRank: input columns ${clash.toSeq.sorted.mkString(", ")} collide " +
        "with internal bookkeeping names (__s, __sk, __w, __o<i>, _pid, _lc, " +
        s"_off, $out) — rename them before calling")
    val base0 = df
      .withColumn("__s", stratum)
      .withColumn("__sk", when(stratum.isNull, lit("n:"))
        .otherwise(concat(lit("v:"), stratum.cast("string"))))
      .withColumn("__w", weight)
    val base = order.zip(oNames).foldLeft(base0) {
      case (d, (c, n)) => d.withColumn(n, c)
    }
    // LAZY checkpoint (round-16 job-count audit): the offsets
    // aggregation below is the FIRST action and computes every
    // partition, so the sort's sampled range boundaries pin exactly as
    // the old eager form pinned them — minus one whole materialization
    // job per call (this helper runs 1-2× inside a dozen registered
    // queries; ConstantProbe measured x123 at 35 jobs/execution)
    val sorted = base
      .sort(col("__sk") +: oNames.map(col(_).asc_nulls_last): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)
    val counts = sorted.groupBy("_pid", "__sk")
      // coalesce: a cell whose weights are ALL NULL must contribute a
      // zero offset, not a driver-side NPE at getLong
      .agg(coalesce(sum(col("__w")), lit(0L)).as("w")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._2, t._1))
    require(counts.length <= (1 << 20),
      s"StratumRank: ${counts.length} (partition, stratum) cells — " +
        "stratum cardinality too high for the driver-side offset table; " +
        "high-cardinality strata should use a plain hash window instead")
    val offs = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var curS: String = null
    var acc = 0L
    counts.foreach { case (pid, s, c) =>
      if (s != curS) { curS = s; acc = 0L }
      offs += ((pid, s, acc)); acc += c
    }
    // per-stratum TOTAL weight, known for free once the offsets are
    // accumulated (the final running sum per stratum) — exported as
    // `__cs` on every output row so quantile/median callers don't pay
    // a second full pass over the input for the count they need in
    // their position arithmetic
    val totals = scala.collection.mutable.HashMap.empty[String, Long]
    counts.foreach { case (_, s, c) => totals(s) = totals.getOrElse(s, 0L) + c }
    val offRows = offs.toSeq.map { case (pid, s, off) => (pid, s, off, totals(s)) }
    sorted
      .withColumn("_lc", sum(col("__w")).over(
        Window.partitionBy(col("_pid"), col("__sk"))
          .orderBy(oNames.map(col(_).asc_nulls_last): _*)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(offRows.toDF("_pid", "__sk", "_off", "__cs")),
        Seq("_pid", "__sk"))
      .withColumn(out, col("_off") + col("_lc"))
      .drop("_pid" :: "_lc" :: "_off" :: "__sk" :: "__w" :: oNames.toList
        ::: (if (withTotal) Nil else List("__cs")): _*)
  }
}
