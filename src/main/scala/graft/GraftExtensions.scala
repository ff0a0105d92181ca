package graft

import graft.functions.{DotProduct, Md5Hash60, PolyHash, StopwordCount, WordShingles}
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
  import org.apache.spark.sql.catalyst.expressions.Expression

  /** Parameter arguments (shingle size, stopword list, hash base/mod)
    * are folded at registration time, so they must be literal and
    * non-null — `.eval()` on a non-foldable column would throw an opaque
    * planner error and a NULL literal would NPE. Fail with the usage
    * string instead. */
  private[graft] def litValue(e: Expression, usage: String): Any = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"argument ${e.sql} must be a foldable literal; usage: $usage")
    val v = e.eval()
    if (v == null) throw new IllegalArgumentException(
      s"argument must not be NULL; usage: $usage")
    v
  }
  private[graft] def litNum(e: Expression, usage: String): Number =
    litValue(e, usage) match {
      case n: Number => n
      case other => throw new IllegalArgumentException(
        s"expected a numeric literal, got '$other'; usage: $usage")
    }
  private[graft] def litStr(e: Expression, usage: String): String =
    litValue(e, usage).toString

  /** Register the functions on an already-running session (builder-time
    * `withExtensions` is ignored by `getOrCreate` when a session exists). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("poly_hash",
      exprs => PolyHash(exprs.head, PolyHash.DefaultBase, PolyHash.DefaultMod),
      "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("md5_hash60",
      exprs => Md5Hash60(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs(0),
        litNum(exprs(1), "word_shingles(text, n)").intValue()), "built-in")
    reg.createOrReplaceTempFunction("stopword_count",
      exprs => StopwordCount(exprs(0),
        exprs.drop(1).map(litStr(_, "stopword_count(text, 'a', 'b', ...)"))),
      "built-in")
    reg.createOrReplaceTempFunction("zorder_key",
      exprs => zorderExpr(exprs(0), exprs(1),
        litNum(exprs(2), "zorder_key(a, b, bits)").intValue()), "built-in")
  }

  /** [[graft.ext.Layout.zorderKey]] built from raw catalyst nodes (the
    * Column DSL's ColumnNode wrappers can't re-enter the function
    * registry). Same bit math, same codegen arithmetic. */
  private[graft] def zorderExpr(a: Expression, b: Expression,
      bits: Int): Expression = {
    // Same domain check as Layout.zorderKey: bits >= 32 would silently
    // wrap (JVM long shift is mod 64) and bits <= 0 would die in
    // empty.reduce with an opaque error.
    require(bits >= 1 && bits <= 31,
      s"zorder_key: bits must be in [1, 31], got $bits")
    import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, Cast, Literal, ShiftLeft, ShiftRight}
    import org.apache.spark.sql.types.LongType
    def side(e: Expression, odd: Int): Seq[Expression] = (0 until bits).map { i =>
      ShiftLeft(
        BitwiseAnd(ShiftRight(Cast(e, LongType), Literal(i)), Literal(1L)),
        Literal(2 * i + odd))
    }
    (side(a, 0) ++ side(b, 1)).reduce(Add(_, _))
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
                GraftExtensions.litNum(b, "poly_hash(text, base, mod)").longValue(),
                GraftExtensions.litNum(m, "poly_hash(text, base, mod)").longValue())
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
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("md5_hash60"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[Md5Hash60].getName, "md5_hash60"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          children match {
            case Seq(c) => Md5Hash60(c)
            case _ => throw new IllegalArgumentException("md5_hash60(text)")
          }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[WordShingles].getName, "word_shingles"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          children match {
            case Seq(c, n) =>
              WordShingles(c,
                GraftExtensions.litNum(n, "word_shingles(text, n)").intValue())
            case _ => throw new IllegalArgumentException("word_shingles(text, n)")
          }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("stopword_count"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[StopwordCount].getName, "stopword_count"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          children match {
            case c +: words if words.nonEmpty =>
              StopwordCount(c, words.map(
                GraftExtensions.litStr(_, "stopword_count(text, 'a', 'b', ...)")))
            case _ => throw new IllegalArgumentException(
              "stopword_count(text, word, ...)")
          }))
  }
}
