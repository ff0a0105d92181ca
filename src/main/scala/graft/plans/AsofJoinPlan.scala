package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** As-of join as a WHOLE-OPERATOR Catalyst extension — the §(c)
  * preference tier: custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, planned through `spark.experimental.extraStrategies`.
  *
  * Physical semantics: both sides hash-cluster on the key with the SAME
  * required partition count and sort (key, time[, id]); `doExecute` then
  * zips the co-partitioned iterators and runs a streaming two-pointer
  * merge — O(n) per partition, a single long of carried state, no
  * buffering of either side, no window machinery.
  *
  * Output and tie semantics are IDENTICAL to the declarative
  * `ops/AsofJoin.asof` (union + carry-forward window): a right row at
  * exactly `leftTime` is visible; among equal-time right rows the
  * highest id wins; null keys match null keys; a null right id never
  * clears the carry (the window's `last(..., ignoreNulls = true)`).
  * AsofPlanSpec pins the equivalence on real data.
  *
  * Columns are referenced by NAME and must be key: int/long, time:
  * int/long/timestamp (micros), right id: long.
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    key: String, leftTime: String, rightTime: String, rightId: String,
    outAttr: AttributeReference) extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  /** The merge consumes key/time/id by NAME, invisibly to Catalyst —
    * declare them as references so column pruning keeps them alive. */
  override def references: AttributeSet = AttributeSet(
    left.output.filter(a =>
      a.name.equalsIgnoreCase(key) || a.name.equalsIgnoreCase(leftTime)) ++
    right.output.filter(a =>
      a.name.equalsIgnoreCase(key) || a.name.equalsIgnoreCase(rightTime) ||
        a.name.equalsIgnoreCase(rightId)))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(n.key, n.leftTime, n.rightTime, n.rightId, n.outAttr,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    key: String, leftTime: String, rightTime: String, rightId: String,
    outAttr: Attribute, left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  private def attrOf(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"asof: column '$name' not in [${side.output.map(_.name).mkString(", ")}]"))

  private def lKey = attrOf(left, key)
  private def rKey = attrOf(right, key)
  private def lT = attrOf(left, leftTime)
  private def rT = attrOf(right, rightTime)
  private def rId = attrOf(right, rightId)

  override def output: Seq[Attribute] = left.output :+ outAttr

  /** Murmur3 hashes Int and Long values differently, so equal logical
    * keys of differing types would land in DIFFERENT partitions and the
    * merge would silently return (mostly null) wrong matches — reject at
    * planning instead. The id is read via `getLong`, so it must be long. */
  private def validateTypes(): Unit = {
    require(lKey.dataType == rKey.dataType,
      s"asof: key '$key' has type ${lKey.dataType.simpleString} on the left " +
        s"but ${rKey.dataType.simpleString} on the right; hash partitioning " +
        "is type-sensitive — cast both sides to the same type first")
    require(rId.dataType == LongType,
      s"asof: right id '$rightId' must be bigint, got ${rId.dataType.simpleString}")
  }

  /** Pinning the partition count keeps the two shuffles zip-compatible
    * even under AQE partition coalescing (ValidateRequirements rejects a
    * coalesced plan that breaks it). */
  override def requiredChildDistribution: Seq[Distribution] = {
    validateTypes()
    val n = Some(conf.numShufflePartitions)
    Seq(ClusteredDistribution(Seq(lKey), requiredNumPartitions = n),
      ClusteredDistribution(Seq(rKey), requiredNumPartitions = n))
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(lKey, Ascending), SortOrder(lT, Ascending)),
      Seq(SortOrder(rKey, Ascending), SortOrder(rT, Ascending),
        SortOrder(rId, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  private def longGetter(dt: DataType, ord: Int): InternalRow => Long = dt match {
    case LongType | TimestampType | TimestampNTZType => _.getLong(ord)
    case IntegerType => _.getInt(ord).toLong
    case other => throw new IllegalArgumentException(
      s"asof: unsupported column type $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexOf(lKey)
    val lTOrd = left.output.indexOf(lT)
    val rKeyOrd = right.output.indexOf(rKey)
    val rTOrd = right.output.indexOf(rT)
    val rIdOrd = right.output.indexOf(rId)
    val getLK = longGetter(lKey.dataType, lKeyOrd)
    val getLT = longGetter(lT.dataType, lTOrd)
    val getRK = longGetter(rKey.dataType, rKeyOrd)
    val getRT = longGetter(rT.dataType, rTOrd)

    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val toUnsafe = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(outputAttrs, outputAttrs)
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val carryRow = new GenericInternalRow(1)
        // current right head, decomposed to primitives (rows are reused)
        private var rValid = false
        private var rkNull = false; private var rk = 0L
        private var rtNull = false; private var rt = 0L
        private var ridNull = false; private var rid = 0L
        // carried match for the key currently being merged
        private var carryValid = false
        private var ckNull = false; private var ck = 0L
        private var carry = 0L

        private def advanceRight(): Unit =
          if (ri.hasNext) {
            val r = ri.next()
            rkNull = r.isNullAt(rKeyOrd); rk = if (rkNull) 0L else getRK(r)
            rtNull = r.isNullAt(rTOrd); rt = if (rtNull) 0L else getRT(r)
            ridNull = r.isNullAt(rIdOrd); rid = if (ridNull) 0L else r.getLong(rIdOrd)
            rValid = true
          } else rValid = false
        advanceRight()

        // null-first total order, matching Spark's ascending sort
        private def keyCmp(aNull: Boolean, a: Long, bNull: Boolean, b: Long): Int =
          if (aNull && bNull) 0
          else if (aNull) -1
          else if (bNull) 1
          else java.lang.Long.compare(a, b)

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          val lkNull = l.isNullAt(lKeyOrd)
          val lk = if (lkNull) 0L else getLK(l)
          val ltNull = l.isNullAt(lTOrd)
          val lt = if (ltNull) 0L else getLT(l)
          // consume right rows at or before (lk, lt); null time = -inf
          var cmp = if (rValid) keyCmp(rkNull, rk, lkNull, lk) else 1
          while (rValid && (cmp < 0 ||
              (cmp == 0 && (rtNull || (!ltNull && rt <= lt))))) {
            if (cmp == 0 && !ridNull) {
              carryValid = true; ckNull = rkNull; ck = rk; carry = rid
            }
            advanceRight()
            cmp = if (rValid) keyCmp(rkNull, rk, lkNull, lk) else 1
          }
          if (carryValid && keyCmp(ckNull, ck, lkNull, lk) == 0)
            carryRow.setLong(0, carry)
          else carryRow.setNullAt(0)
          toUnsafe(joined(l, carryRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinPlan {

  /** As-of join through the custom operator: left rows gain
    * `asof_<rightId>` = the id of the latest right row with the same key
    * and `rightTime <= leftTime` (null when none). */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightId: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[AsofJoinStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new AsofJoinStrategy
    val node = AsofJoinNode(
      GraftSqlBridge.logicalPlan(left), GraftSqlBridge.logicalPlan(right),
      key, leftTime, rightTime, rightId,
      AttributeReference(s"asof_$rightId", LongType, nullable = true)())
    GraftSqlBridge.ofRows(spark, node)
  }
}
