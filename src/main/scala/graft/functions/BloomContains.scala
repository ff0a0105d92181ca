package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Membership probe against the repo's exportable 62-bit-word Bloom
  * filter ([[graft.ext.Sketches.bloomWords]] layout: `d` seeded
  * 2-universal positions over `words·62` bits, bit `b` lives in word
  * `b div 62` at offset `b mod 62`), as a native Catalyst expression.
  *
  * The filter is collected to the driver at PLAN BUILD (≤ 1024 words =
  * 8 KiB — the whole point of the exportable layout) and embedded here,
  * so the probe side pays d multiply-mod-test steps per row inside
  * whole-stage codegen: ZERO joins, zero shuffle — the classic
  * semi-join reduction that, at 100 TB, prunes the fact scan's output
  * before anything reaches an exchange. The declarative alternative
  * (probe ⋈ words on word_idx + count-all-d-hits groupBy) is what the
  * DuckDB oracle runs — same semantics, deliberately different plan.
  *
  * `child` is the 60-bit key hash ([[Md5Hash60]]); `seeds` are the
  * `(a, b, c)` triples of [[graft.ext.Dedup.hashCoeffs]] — embedded
  * explicitly so the expression is self-contained and canonicalizable
  * (Seq equality, like [[RingSuccessor]]'s ring).
  */
case class BloomContains(child: Expression, words: Seq[Long],
    seeds: Seq[(Long, Long, Long)]) extends UnaryExpression {

  require(words.nonEmpty && words.size <= 1024,
    s"BloomContains: ${words.size} words out of range")
  require(seeds.nonEmpty && seeds.size <= 8,
    s"BloomContains: d=${seeds.size} out of range")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  @transient private lazy val wordArr: Array[Long] = words.toArray
  @transient private lazy val seedArr: Array[Long] =
    seeds.flatMap { case (a, b, c) => Seq(a, b, c) }.toArray

  override def nullSafeEval(input: Any): Any =
    BloomContains.test(input.asInstanceOf[Long], wordArr, seedArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bloomWords", wordArr, "long[]")
    val sRef = ctx.addReferenceObj("bloomSeeds", seedArr, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomContains.test($c, $wRef, $sRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BloomContains {
  private val P: Long = 1000000007L // Dedup.HashP

  /** All d seeded bits set? seeds laid out flat as (a,b,c)*d. */
  def test(h: Long, words: Array[Long], seeds: Array[Long]): Boolean = {
    val nbits = words.length * 62L
    val lo = h & 1073741823L // low 30 bits
    val hi = h >>> 30
    var i = 0
    while (i < seeds.length) {
      val bit = ((seeds(i) * lo + seeds(i + 1) * hi + seeds(i + 2)) % P) % nbits
      if ((words((bit / 62L).toInt) & (1L << (bit % 62L).toInt)) == 0L) return false
      i += 3
    }
    true
  }

  /** Column API: probe `hk60` against the collected word array. */
  def bloom_contains(hk: Column, words: Seq[Long],
      seeds: Seq[(Long, Long, Long)]): Column =
    GraftSqlBridge.column(BloomContains(GraftSqlBridge.expression(hk), words, seeds))
}
