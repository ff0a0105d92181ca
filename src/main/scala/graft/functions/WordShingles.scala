package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text column.
  *
  * Semantically identical to the composed form
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ", toks[i],
  * ...)))` — whitespace-split of the trimmed text, n-grams joined with a
  * single space, first-occurrence-distinct, whole trimmed text as the
  * single shingle for docs shorter than n words — but ~40× cheaper:
  * higher-order lambdas evaluate interpreted per element, while this is
  * one JVM pass per row (plain split + sliding window + LinkedHashSet).
  * `CodegenFallback` is fine here: the row-level work dominates, not the
  * call overhead.
  *
  * `distinct = false` keeps EVERY shingle in text order (with repeats),
  * so element index == word position of the shingle's first word — the
  * positioned form `posexplode` needs for substring-level span dedup.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.trim
    val toks = if (text.isEmpty) Array.empty[String] else text.split("\\s+")
    val out: mutable.Growable[String] with Iterable[String] =
      if (distinct) new mutable.LinkedHashSet[String]
      else new mutable.ArrayBuffer[String]
    if (toks.length >= n) {
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out += sb.toString
        i += 1
      }
    } else {
      out += text
    }
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Fused shingle→hash (round 17, the x66 sf1 constant): the 60-bit md5
  * hash of every word n-gram in text order with repeats — element-for-
  * element equal to `transform(word_shingles_pos(t, n), s →
  * md5_hash60(s))`, so every oracle pinned to
  * `('0x' || substring(md5(shingle),1,15))::BIGINT` is unchanged — but
  * the shingle string never materializes as a UTF8String array row:
  * one JVM pass builds each n-gram in a reused StringBuilder, digests
  * its UTF-8 bytes, and emits a PRIMITIVE long array
  * (`UnsafeArrayData.fromPrimitiveArray`, no per-element boxing). The
  * span-dedup pipelines (duplicateSpans, boilerplateCoverage) explode
  * this instead of exploding strings and re-hashing row-by-row —
  * corpus-scale string traffic (50M ~30-char shingles at sf1) becomes
  * 8 bytes/shingle at the explode boundary.
  *
  * Same sub-`n` contract as [[WordShingles]]: a doc shorter than n
  * words contributes ONE hash, of its whole trimmed text. */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.trim
    val toks = if (text.isEmpty) Array.empty[String] else text.split("\\s+")
    val out =
      if (toks.length >= n) {
        val hs = new Array[Long](toks.length - n + 1)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i + n <= toks.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          hs(i) = Md5Hash60.hashString(sb.toString)
          i += 1
        }
        hs
      } else Array(Md5Hash60.hashString(text))
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingles {
  def word_shingles(text: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text), n))

  /** Ordered, non-distinct shingles: index i = shingle starting at word i. */
  def word_shingles_pos(text: Column, n: Int): Column =
    GraftSqlBridge.column(
      WordShingles(GraftSqlBridge.expression(text), n, distinct = false))

  /** Ordered, non-distinct 60-bit shingle hashes: index i = word position. */
  def word_shingle_hashes_pos(text: Column, n: Int): Column =
    GraftSqlBridge.column(
      WordShingleHashes(GraftSqlBridge.expression(text), n))
}
