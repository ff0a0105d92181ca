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

  /** Prune-to-existing-column probe (round 18): callers almost always
    * pass plain references to columns the frame ALREADY carries
    * (`col("v")`, `col("cnt")`) — materializing a bookkeeping copy of
    * each (`__o0`, `__w`, `__s`) doubled the checkpointed cache
    * (StageProbe, x128: 165 bytes/row, three duplicated columns of
    * which two strings) and every one of the 3–4 downstream passes
    * re-paid the width. A Column is prunable when its expression is a
    * bare (1-part, unambiguous) attribute of `df` — or a no-op
    * LONG-to-LONG cast of one, which is exactly what [[cumsum]]'s
    * defensive `.cast("long")` produces over an already-long weight. */
  private def existingCol(df: DataFrame, c: Column): Option[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression}
    import org.apache.spark.sql.types.LongType
    def attrName(e: Expression): Option[String] = e match {
      case UnresolvedAttribute(parts) if parts.length == 1 => Some(parts.head)
      case a: AttributeReference => Some(a.name)
      case c2: Cast if c2.dataType == LongType =>
        attrName(c2.child)
          .filter(n => df.columns.count(_ == n) == 1 &&
            df.schema(n).dataType == LongType)
      case _ => None
    }
    attrName(org.apache.spark.sql.GraftSqlBridge.expression(c))
      .filter(n => df.columns.count(_ == n) == 1)
  }

  private def twoPhase(df: DataFrame, stratum: Column, order: Seq[Column],
      weight: Column, out: String, withTotal: Boolean = false): DataFrame = {
    require(order.nonEmpty, "StratumRank: order columns required")
    val spark = df.sparkSession
    import spark.implicits._
    // the internal bookkeeping columns are added via withColumn, which
    // silently REPLACES same-named caller columns — a frame already
    // carrying e.g. __s or _pid would get corrupted ranks with no error
    val reserved = Set("__s", "__sk", "__w", "__cs", "_pid", "_lc", "_off", out) ++
      order.indices.map(i => s"__o$i")
    val clash = df.columns.toSet intersect reserved
    require(clash.isEmpty,
      s"StratumRank: input columns ${clash.toSeq.sorted.mkString(", ")} collide " +
        "with internal bookkeeping names (__s, __sk, __w, __o<i>, _pid, _lc, " +
        s"_off, $out) — rename them before calling")
    // bookkeeping pruning (see [[existingCol]]): reference prunable
    // order/weight columns in place; materialize only genuine
    // expressions. `__s` is not cached at all any more — it is
    // re-projected from the input columns AFTER the join (all callers
    // pass deterministic stratum expressions; the input columns ride
    // the whole pipeline untouched).
    val oCols: Seq[String] = order.zipWithIndex.map { case (c, i) =>
      existingCol(df, c).getOrElse(s"__o$i")
    }
    val oMat = order.zipWithIndex.filter { case (c, _) => existingCol(df, c).isEmpty }
    val wName = existingCol(df, weight).getOrElse("__w")
    val base1 = df
      .withColumn("__sk", when(stratum.isNull, lit("n:"))
        .otherwise(concat(lit("v:"), stratum.cast("string"))))
    val base2 = if (wName == "__w") base1.withColumn("__w", weight) else base1
    val base = oMat.foldLeft(base2) {
      case (d, (c, i)) => d.withColumn(s"__o$i", c)
    }
    // LAZY checkpoint (round-16 job-count audit): the offsets
    // aggregation below is the FIRST action and computes every
    // partition, so the sort's sampled range boundaries pin exactly as
    // the old eager form pinned them — minus one whole materialization
    // job per call (this helper runs 1-2× inside a dozen registered
    // queries; ConstantProbe measured x123 at 35 jobs/execution)
    val sorted = base
      .sort(col("__sk") +: oCols.map(col(_).asc_nulls_last): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)
    val counts = sorted.groupBy("_pid", "__sk")
      // coalesce: a cell whose weights are ALL NULL must contribute a
      // zero offset, not a driver-side NPE at getLong
      .agg(coalesce(sum(col(wName)), lit(0L)).as("w")).collect()
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
    // Phase-4 running sum, PARTITION-LOCAL (round 18, guide §2.4): the
    // checkpointed sort already holds every (partition, stratum) cell
    // CONTIGUOUS and ordered by the rank order — exactly the layout the
    // old `Window.partitionBy(_pid, __sk)` re-created by exchanging and
    // re-sorting the ENTIRE frame (StageProbe: the exchange+window pair
    // was the single heaviest stage family in every StratumRank caller,
    // ~2.6 of x128's 10.2 CPU-s, all to keep ≤1 row per stratum
    // downstream). A sequential per-partition scan over the cached rows
    // computes the identical running sum with ZERO exchange and no
    // second sort. mapPartitions is deliberately a non-codegen island:
    // it replaces a full shuffle of the frame, its input is the already
    // narrow checkpoint cache (nothing left to prune), and the window
    // semantics it must reproduce — sum IGNORES null weights, result is
    // NULL until the cell's first non-null weight — are pinned in
    // StratumRankSpec.
    val inSchema = sorted.schema
    val skIdx = inSchema.fieldIndex("__sk")
    val wIdx = inSchema.fieldIndex(wName)
    val outSchema = inSchema.add("_lc", org.apache.spark.sql.types.LongType)
    val scanned = sorted.mapPartitions { it =>
      var curSk: String = null
      var acc = 0L
      var seen = false
      it.map { r =>
        val sk = r.getString(skIdx)
        if (sk != curSk) { curSk = sk; acc = 0L; seen = false }
        if (!r.isNullAt(wIdx)) { acc += r.getLong(wIdx); seen = true }
        val lc: Any = if (seen) acc else null
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ lc)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    scanned
      .join(broadcast(offRows.toDF("_pid", "__sk", "_off", "__cs")),
        Seq("_pid", "__sk"))
      .withColumn(out, col("_off") + col("_lc"))
      // `__s` re-projected here (NOT cached through the sort): the
      // input columns survive the pipeline untouched, so a post-join
      // projection of the (deterministic) stratum expression is free
      // and keeps a whole column — a string for most callers — out of
      // the checkpoint cache and both sort exchanges
      .withColumn("__s", stratum)
      .drop("_pid" :: "_lc" :: "_off" :: "__sk" ::
        (if (wName == "__w") List("__w") else Nil)
        ::: oMat.map { case (_, i) => s"__o$i" }.toList
        ::: (if (withTotal) Nil else List("__cs")): _*)
  }
}
