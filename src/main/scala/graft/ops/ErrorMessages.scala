package graft.ops

import graft.model.ErrorCode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Error-code → display-message lookup (J5).
  *
  * Reference (StreamTest.h:59-77): `StreamErrorMap` consulted per event.
  * Spark-first: the 17-entry map ships as a `typedlit` map literal inside
  * the plan (broadcast with the task binaries — no join, no shuffle);
  * `element_at` returns NULL for unknown codes, coalesced to a default.
  */
object ErrorMessages {

  private val messageMap: Column = typedlit(ErrorCode.messages)

  def messageFor(item: Column): Column =
    coalesce(element_at(messageMap, item), lit("unknown error"))

  def withErrorMessage(df: DataFrame, itemCol: String = "item",
      outCol: String = "error_message"): DataFrame =
    df.withColumn(outCol, messageFor(col(itemCol)))
}
