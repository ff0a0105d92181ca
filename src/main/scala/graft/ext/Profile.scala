package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: per-column summary statistics in ONE table pass.
  *
  * The reference engine has no profiling surface (its 29-column CSV
  * report is a fixed query, `StreamTest.cpp` has no schema
  * introspection); any engine curating 100 TB needs one — you profile
  * BEFORE you write the dedup/filter config, not after.
  *
  * 100 TB posture: a single scan producing one wide row of aggregates
  * (the multi-distinct plans as one Expand pass — k× row inflation
  * map-side, never a per-column rescan), then a driver-free `stack`
  * unpivot of that single row into the k-row result. No joins, one
  * aggregation exchange, output size O(columns).
  */
object Profile {

  /** Profile `cols` of `df`: row count, null count, exact distinct
    * count, and min/max (rendered as strings so heterogeneous column
    * types share one schema). Restrict to exact-render types (integers,
    * strings) when cross-engine string parity matters — float and
    * timestamp formatting is engine-specific.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // the unpivot below interpolates names into a SQL string: a name
    // containing a quote/space/dot would break parsing — or inject an
    // arbitrary expression into the plan — unless every identifier is
    // backtick-quoted and every label literal is escaped. A backtick
    // inside a name cannot itself be backtick-quoted portably; reject.
    cols.foreach(c => require(!c.contains("`"),
      s"profile: column name ${c} contains a backtick and cannot be " +
        "safely quoted in the unpivot expression — rename it upstream"))
    // plan-side lookups go through col("`name`") / backticked aliases,
    // so dots in source names never parse as struct-field access
    def q(name: String): String = s"`$name`"
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(q(c)).isNull.cast("long")).as(s"__null_$c"),
        countDistinct(col(q(c))).as(s"__nd_$c"),
        min(col(q(c))).cast("string").as(s"__min_$c"),
        max(col(q(c))).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // one literal label per column; stack unpivots the single wide row.
    // Labels are backslash-escaped string literals, aggregate
    // references backtick-quoted identifiers.
    val stackArgs = cols.map { c =>
      val label = c.replace("\\", "\\\\").replace("'", "\\'")
      s"'$label', ${q(s"__null_$c")}, ${q(s"__nd_$c")}, " +
        s"${q(s"__min_$c")}, ${q(s"__max_$c")}"
    }.mkString(", ")
    wide.select(col("__n"), expr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_val, max_val)"))
      .select(col("col_name"), col("__n").as("n_rows"), col("n_null"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
