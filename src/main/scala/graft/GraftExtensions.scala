package graft

import graft.functions.{DotProduct, PolyHash}
import org.apache.spark.sql.SparkSessionExtensions

/** Registers graft's native expressions as SQL functions
  * (`poly_hash(text)`, `dot_product(a, b)`), so `spark.sql(...)` users
  * get them too:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT poly_hash(text), dot_product(a, b) FROM t")
  * }}}
  */
object GraftExtensions {
  /** Register the functions on an already-running session (builder-time
    * `withExtensions` is ignored by `getOrCreate` when a session exists). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("poly_hash",
      exprs => PolyHash(exprs.head, PolyHash.DefaultBase, PolyHash.DefaultMod),
      "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("poly_hash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[PolyHash].getName, "poly_hash"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          children match {
            case Seq(c) => PolyHash(c, PolyHash.DefaultBase, PolyHash.DefaultMod)
            case Seq(c, b, m) =>
              PolyHash(c,
                b.eval().asInstanceOf[Number].longValue(),
                m.eval().asInstanceOf[Number].longValue())
            case _ => throw new IllegalArgumentException(
              "poly_hash(text[, base, mod])")
          }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, "dot_product"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          children match {
            case Seq(a, b) => DotProduct(a, b)
            case _ => throw new IllegalArgumentException("dot_product(a, b)")
          }))
  }
}
