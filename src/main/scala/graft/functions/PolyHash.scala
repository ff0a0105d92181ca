package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string: `h = (h * base + codepoint) % mod`
  * over UTF-16 code units — the classic document-fingerprinting primitive
  * (the reference has no hashing at all; this is part of the §7.4
  * training-data-pipeline extensions).
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode`, so it
  * stays inside whole-stage codegen (no UDF serialization, no boxing in
  * the hot loop) — the preferred extension point per the build charter.
  * Default mod 1e9+7 keeps the accumulator far from Long overflow
  * (max ~31e9), making the result reproducible in any engine with exact
  * 64-bit ints (the DuckDB oracle mirrors it with `list_reduce`).
  */
case class PolyHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * ${base}L + (long) $s.charAt($i)) % ${mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val DefaultBase = 31L
  val DefaultMod = 1000000007L

  def hash(s: String, base: Long = DefaultBase, mod: Long = DefaultMod): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * base + s.charAt(i)) % mod
      i += 1
    }
    h
  }

  /** Column API: `poly_hash(text)`. */
  def poly_hash(c: Column, base: Long = DefaultBase, mod: Long = DefaultMod): Column =
    GraftSqlBridge.column(PolyHash(GraftSqlBridge.expression(c), base, mod))
}
