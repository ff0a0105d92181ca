package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row (by event
  * time, id tiebreak) with the same key and `rightTime <= leftTime`.
  *
  * Not in the reference's surface; a staple of training-data pipelines
  * (attach latest catalog state / label / price to each event). Expressed
  * Spark-first as the union + ordered window `last(ignoreNulls)` pattern:
  * ONE shuffle on (key), no range self-join blowup, no custom physical
  * operator needed —
  *
  *  1. tag both sides and union them on the shared (key, time, id) spine;
  *  2. within each key, ordered by (time, id, side-priority), carry the
  *     last non-null right-row id forward;
  *  3. keep left rows and broadcast-or-shuffle join the right payload
  *     back by the carried id.
  *
  * Ties: a right row at exactly `leftTime` IS visible (<=), with the id
  * tiebreak making the result deterministic.
  */
object AsofJoin {

  /** @param left      left rows (must contain `key`, `leftTime`, `leftId`)
    * @param right     right rows (must contain `key`, `rightTime`, `rightId`)
    * @param key       join key column name on both sides
    * @param leftTime  left event-time column name
    * @param rightTime right event-time column name
    * @param leftId    unique left id (tiebreak + output key)
    * @param rightId   unique right id (tiebreak; joined back as `asof_<rightId>`)
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      leftId: String, rightId: String): DataFrame = {
    val l = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), col(leftId).as("__id"),
      lit(1).as("__side"), lit(null).cast(right.schema(rightId).dataType).as("__rid"))
    val r = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), col(rightId).as("__id"),
      lit(0).as("__side"), col(rightId).as("__rid"))
    // side-priority 0 before 1 at equal (time, id): right rows at exactly
    // leftTime are visible to the left row
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__asof", last(col("__rid"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__id").as(leftId), col("__asof").as(s"asof_$rightId"))
    left.join(carried, Seq(leftId), "left_outer")
  }

  /** Nearest as-of join — [[asof]]'s bidirectional sibling (pandas
    * `merge_asof(direction='nearest')`): every left row gets the right
    * row with the SMALLEST |Δt| on the same key, backward winning ties.
    * Same one-shuffle union discipline: carry the latest-prior right
    * (time, id) forward AND the earliest-later one backward over the
    * one keyed spine, then pick per row by distance — still no range
    * self-join, no second shuffle (two window frames over one sort).
    *
    * A right row at exactly the left time sorts BEFORE the left row
    * (side priority), so it is the backward candidate at distance 0
    * and always wins.
    *
    * Frame discipline (measured, not theoretical): the forward carry
    * must NOT be `first(...)` over a (currentRow → unboundedFollowing)
    * frame — Spark's UnboundedFollowing frame recomputes the aggregate
    * from scratch per row, O(n²) in the partition, and the tripwire's
    * 90k-row hot user took 29 s that way. Instead the spine is scanned
    * a second time in REVERSED order with the same expanding
    * `last(ignoreNulls)` — incremental O(n), one exchange, two local
    * sorts. Output: (leftId, asof_<rightId>, dist_us, dir — 'b'/'f',
    * all NULL when the key has no right rows at all). */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      leftId: String, rightId: String): DataFrame = {
    val ridT = right.schema(rightId).dataType
    val l = left.select(
      col(key).as("__k"), unix_micros(col(leftTime)).as("__t"),
      col(leftId).as("__id"), lit(1).as("__side"),
      lit(null).cast("long").as("__rt"), lit(null).cast(ridT).as("__rid"))
    val r = right.select(
      col(key).as("__k"), unix_micros(col(rightTime)).as("__t"),
      col(rightId).as("__id"), lit(0).as("__side"),
      unix_micros(col(rightTime)).as("__rt"), col(rightId).as("__rid"))
    val back = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward candidate via the REVERSED expanding frame (see the
    // Scaladoc) — "last non-null so far" walking from the future back
    val fwd = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side").desc, col("__id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__brid", last(col("__rid"), ignoreNulls = true).over(back))
      .withColumn("__brt", last(col("__rt"), ignoreNulls = true).over(back))
      .withColumn("__frid", last(col("__rid"), ignoreNulls = true).over(fwd))
      .withColumn("__frt", last(col("__rt"), ignoreNulls = true).over(fwd))
      .where(col("__side") === 1)
      .withColumn("__takeB",
        col("__brid").isNotNull &&
          (col("__frid").isNull ||
            (col("__t") - col("__brt")) <= (col("__frt") - col("__t"))))
      .select(col("__id").as(leftId),
        when(col("__takeB"), col("__brid"))
          .otherwise(col("__frid")).as(s"asof_$rightId"),
        when(col("__takeB"), col("__t") - col("__brt"))
          .when(col("__frid").isNotNull, col("__frt") - col("__t"))
          .as("dist_us"),
        when(col("__takeB"), lit("b"))
          .when(col("__frid").isNotNull, lit("f")).as("dir"))
  }
}
