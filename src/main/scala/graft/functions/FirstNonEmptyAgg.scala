package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for strict arrival-order first-non-empty — the
  * custom-aggregate candidate SURVEY §7.3 reserved in case the built-in
  * `min_by(value, when(nonEmpty, ord))` form proved insufficient. The
  * built-in form passed the oracle gate, so the engine uses it in query
  * paths; this Aggregator is kept as the typed-API equivalent (usable
  * with `Dataset.groupByKey(...).agg(...)`) and is property-tested to
  * agree with it.
  *
  * Buffer = (bestOrd, value): merge keeps the smaller ord whose value is
  * non-empty — associative and commutative, so it is map-side combinable
  * exactly like min_by.
  */
class FirstNonEmptyAgg[I](ord: I => Long, value: I => String)
    extends Aggregator[I, (Long, String), String] {

  override def zero: (Long, String) = (Long.MaxValue, null)

  override def reduce(b: (Long, String), in: I): (Long, String) = {
    val v = value(in)
    if (v != null && v.nonEmpty && ord(in) < b._1) (ord(in), v) else b
  }

  override def merge(a: (Long, String), b: (Long, String)): (Long, String) =
    if (a._1 <= b._1) a else b

  override def finish(b: (Long, String)): String = b._2

  override def bufferEncoder: Encoder[(Long, String)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING)

  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object FirstNonEmptyAgg {
  def column[I](ord: I => Long, value: I => String): TypedColumn[I, String] =
    new FirstNonEmptyAgg(ord, value).toColumn
}
