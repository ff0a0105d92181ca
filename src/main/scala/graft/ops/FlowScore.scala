package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The 0–100 flow score.
  *
  * Reference (StreamTest.cpp:987-996): when `detections > 0 &&
  * errors <= detections`, `score = (detections - errors) / detections *
  * 100.0` as a double, clamped at 0, then C-style `(int)` truncation;
  * otherwise 0. Spark's `cast("int")` on a double truncates toward zero,
  * matching the C++ cast exactly (SURVEY.md §7.4 numeric-edge note).
  */
object FlowScore {
  def score(detections: Column, errors: Column): Column =
    when(detections > 0 && errors <= detections,
      greatest(lit(0.0),
        (detections - errors).cast("double") / detections.cast("double") * 100.0)
        .cast("int"))
      .otherwise(0)

  /** Scala-side twin for unit tests and driver-side use. */
  def score(detections: Int, errors: Int): Int =
    if (detections > 0 && errors <= detections) {
      var s = (detections - errors).toDouble / detections * 100.0
      if (s < 0) s = 0
      s.toInt
    } else 0
}
