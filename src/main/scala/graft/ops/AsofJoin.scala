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
}
