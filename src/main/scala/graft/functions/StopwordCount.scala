package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of single-space-delimited tokens of `text` that appear in a
  * fixed word set — semantically identical to
  * `size(filter(split(text, " "), w => w.isin(words)))`, but the
  * higher-order `filter` evaluates its lambda INTERPRETED per token
  * (x2/x3/x4 call it up to 8× per row); this is one JVM pass over the
  * split with a hash-set probe, kept inside whole-stage codegen via a
  * referenced-object call.
  */
case class StopwordCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_count"

  @transient private lazy val set: java.util.HashSet[UTF8String] =
    StopwordCount.toSet(words)

  override def nullSafeEval(input: Any): Any =
    StopwordCount.count(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwords", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.StopwordCount.count($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCount =
    copy(child = newChild)
}

object StopwordCount {
  private val Space = UTF8String.fromString(" ")

  def toSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def count(text: UTF8String, words: java.util.HashSet[UTF8String]): Int = {
    val toks = text.split(Space, -1)
    var n = 0
    var i = 0
    while (i < toks.length) {
      if (words.contains(toks(i))) n += 1
      i += 1
    }
    n
  }

  /** Column API: `stopword_count(text, words)`. */
  def stopword_count(text: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(StopwordCount(GraftSqlBridge.expression(text), words))
}
