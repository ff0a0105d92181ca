package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Clockwise-successor lookup on a consistent-hash ring, as a native
  * Catalyst expression: given a 60-bit key hash, return the shard of
  * the first vnode whose ring position is `>= hk`, wrapping to the
  * lowest-position vnode when the key hashes past the last one.
  *
  * The ring is tiny (≤ 4096 vnodes by [[graft.ext.Sampling.hashRingLoad]]'s
  * contract) and fully deterministic at PLAN BUILD time — shard/replica
  * labels hashed with [[Md5Hash60]] — so it is embedded here as two
  * sorted parallel arrays and each row pays one O(log V) binary search.
  * That replaces the round-10 plan (keys × ring through a
  * BroadcastNestedLoopJoin, a ×V row amplification that was the sf0.1
  * suite max at 10.8 s) with zero amplification and zero extra
  * exchange; semantics are bit-identical, so the DuckDB oracle keeps
  * its declarative cross-join form.
  *
  * Tie-breaking matches the old `min(struct(vh, shard))` reduction:
  * `entries` must be sorted by `(vh, shard)`, so among equal positions
  * the binary search lands on the smallest shard.
  *
  * `entries` is a `Seq` (structural equality) so Catalyst
  * canonicalization/subexpression-elimination compares ring contents,
  * not array references.
  */
case class RingSuccessor(child: Expression, entries: Seq[(Long, Int)])
    extends UnaryExpression {

  require(entries.nonEmpty, "RingSuccessor: empty ring")
  require(entries == entries.sorted,
    "RingSuccessor: ring entries must be sorted by (vh, shard)")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ring_successor"

  @transient private lazy val vhs: Array[Long] = entries.map(_._1).toArray
  @transient private lazy val shards: Array[Int] = entries.map(_._2).toArray

  override def nullSafeEval(input: Any): Any =
    RingSuccessor.lookup(input.asInstanceOf[Long], vhs, shards)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vhsRef = ctx.addReferenceObj("ringVhs", vhs, "long[]")
    val shardsRef = ctx.addReferenceObj("ringShards", shards, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RingSuccessor.lookup($c, $vhsRef, $shardsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): RingSuccessor =
    copy(child = newChild)
}

object RingSuccessor {

  /** First index with `vhs(i) >= hk` (vhs sorted ascending), wrapping
    * to index 0 past the end — the classic ring successor. O(log V). */
  def lookup(hk: Long, vhs: Array[Long], shards: Array[Int]): Int = {
    var lo = 0
    var hi = vhs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vhs(mid) >= hk) hi = mid else lo = mid + 1
    }
    if (lo == vhs.length) shards(0) else shards(lo)
  }

  /** Column API: `ring_successor(hk60, ring)` with `ring` sorted by
    * `(vh, shard)`. */
  def ring_successor(hk: Column, ring: Seq[(Long, Int)]): Column =
    GraftSqlBridge.column(RingSuccessor(GraftSqlBridge.expression(hk), ring))
}
