package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5-derived hash of a string, bit-identical to
  * `conv(substring(md5(x), 1, 15), 16, 10)` — the first 15 hex chars of
  * the md5 are exactly the top 60 bits of the digest's first 8 bytes —
  * but computed straight from the digest: no 32-char hex string, no
  * substring, no base-16 string parse. This is the base hash of the
  * MinHash/SimHash family (engine-reproducible: the DuckDB oracle uses
  * `('0x' || substring(md5(x),1,15))::BIGINT`).
  *
  * Native `doGenCode` keeps it inside whole-stage codegen; the digest
  * object is reused per thread.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"

  override def nullSafeEval(input: Any): Any =
    Md5Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def hash(s: UTF8String): Long = fromDigest(digest(s.getBytes))

  /** Same hash from a JVM String — `String.getBytes(UTF_8)` produces the
    * identical byte sequence as `UTF8String.fromString(s).getBytes`, so
    * [[WordShingleHashes]] can digest without a UTF8String round-trip. */
  def hashString(s: String): Long =
    fromDigest(digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  private def digest(bytes: Array[Byte]): Array[Byte] = {
    val md = digests.get()
    md.reset()
    md.digest(bytes)
  }

  private def fromDigest(d: Array[Byte]): Long = {
    val top64 =
      ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    top64 >>> 4
  }

  /** Column API: `md5_hash60(text)`. */
  def md5_hash60(c: Column): Column =
    GraftSqlBridge.column(Md5Hash60(GraftSqlBridge.expression(c)))
}
