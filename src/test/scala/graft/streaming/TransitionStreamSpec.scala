package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[TransitionStream.transitions]] against the batch lag
  * extraction: NO open tail — the union of emissions across batches is
  * the exact batch pair multiset, including the chain across the
  * batch boundary.
  */
class TransitionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runBatches(batches: Seq[Seq[TypedEvent]]): Seq[Transition] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TypedEvent]
    val q = TransitionStream.transitions(mem.toDS())
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("transitions").as[Transition].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS transitions")
    got
  }

  private def batchPairs(all: Seq[TypedEvent]): Seq[Transition] = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    all.toDF()
      .withColumn("from_type", lag(col("et"), 1).over(w))
      .where(col("from_type").isNotNull)
      .select(col("user_id"), col("from_type"), col("et").as("to_type"))
      .as[Transition].collect().toSeq
  }

  test("union of emissions == batch lag pairs, chaining across the batch boundary") {
    val b1 = Seq(
      TypedEvent(1L, 100L, 1L, "A"), TypedEvent(1L, 200L, 2L, "B"),
      TypedEvent(2L, 100L, 3L, "X"))
    val b2 = Seq(
      TypedEvent(1L, 300L, 4L, "C"),  // chains B -> C across batches
      TypedEvent(2L, 200L, 5L, "X"))  // X -> X self-transition
    val streamed = runBatches(Seq(b1, b2))
    val batch = batchPairs(b1 ++ b2)
    assert(streamed.groupBy(identity).view.mapValues(_.size).toMap ===
      batch.groupBy(identity).view.mapValues(_.size).toMap)
    assert(streamed.size === 3)
  }

  test("late event at-or-before the frontier is dropped, not re-ordered") {
    val b1 = Seq(TypedEvent(1L, 500L, 1L, "A"))
    val b2 = Seq(
      TypedEvent(1L, 100L, 2L, "Z"),  // before the frontier: dropped
      TypedEvent(1L, 600L, 3L, "B"))
    assert(runBatches(Seq(b1, b2)) === Seq(Transition(1L, "A", "B")))
  }
}
