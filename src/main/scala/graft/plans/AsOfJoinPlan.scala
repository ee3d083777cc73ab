package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join (logical node + strategy + physical exec).
  *
  * The composed form (graft.operators.AsOfJoin: union + carry-forward
  * window) is correct and single-shuffle, but it materializes padded
  * null columns for every row of both sides and pays a window-function
  * frame per carried column. This native operator is the classic
  * sort-merge formulation instead: co-partition both sides on the key,
  * sort each partition by (key, ts), and stream-merge with one carried
  * right row per key — O(1) state, zero padding, one pass.
  *
  * Left-outer semantics, inclusive match (`right.ts <= left.ts`), same
  * as the composed form and the oracle engine's ASOF JOIN.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTs: Attribute, rightTs: Attribute,
                        carried: Seq[Attribute]) extends BinaryNode {
  NativeJoinSupport.requireMatchingKeyTypes("as-of join", leftKeys, rightKeys)
  // The exec reads ordering values with getLong, which is only correct
  // for 8-byte-backed types; an int/date column would silently read an
  // unsigned-extended slot and mis-join. Fail at plan construction.
  for (a <- Seq(leftTs, rightTs))
    require(AsOfJoinNode.longBacked(a.dataType),
      s"as-of ordering column '${a.name}' must be TIMESTAMP or BIGINT, " +
        s"got ${a.dataType.simpleString} — cast it explicitly first")
  override def output: Seq[Attribute] =
    left.output ++ carried.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinNode = copy(left = l, right = r)
}

object AsOfJoinNode {
  import org.apache.spark.sql.types.{DataType, LongType, TimestampType, TimestampNTZType}
  def longBacked(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType || dt == LongType
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, carried) =>
      AsOfJoinExec(lk, rk, lts, rts, carried, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        carried: Seq[Attribute],
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ carried.map(_.withNullability(true))

  /** Co-partition both sides on the equi-key (EnsureRequirements makes
    * the two hash partitionings compatible, exactly as for SMJ). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** In-partition sort: (key..., ts) ascending on both sides. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lts = leftTs
    val rts = rightTs
    val carriedAttrs = carried
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lts), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rts), rOut)
      val carriedProj = UnsafeProjection.create(carriedAttrs, rOut)
      // Emit UnsafeRows: parents (shuffle, collect/take) cast rows to
      // UnsafeRow, so a raw JoinedRow would ClassCastException there.
      val carriedNullable = carriedAttrs.map(_.withNullability(true))
      val resultProj =
        UnsafeProjection.create(lOut ++ carriedNullable, lOut ++ carriedNullable)
      val keyOrdering =
        RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType).toIndexedSeq)
      val nullRight = new GenericInternalRow(carriedAttrs.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // lookahead on the right side; rows with a NULL key or NULL ts
        // can never satisfy `r.key = l.key AND r.ts <= l.ts` (SQL
        // three-valued logic), so skip them — getLong on a null slot
        // would otherwise read 0 and carry a 1970 "match"
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTsVal: Long = 0L
        private def advanceRight(): Unit = {
          rRow = null; rKey = null
          while (rRow == null && rIter.hasNext) {
            val cand = rIter.next()
            val k = rKeyProj(cand)
            val t = rTsProj(cand)
            if (!k.anyNull && !t.isNullAt(0)) {
              rRow = cand
              rKey = k.copy()
              rTsVal = t.getLong(0)
            }
          }
        }
        advanceRight()

        // carried state: last right row whose (key, ts) ≤ current left
        private var carriedKey: UnsafeRow = _
        private var carriedRow: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTsRow = lTsProj(l)
          // a left row with a NULL key or NULL ts matches nothing
          // (left-outer: emit it with NULL carried columns)
          if (lKey.anyNull || lTsRow.isNullAt(0))
            return resultProj(joined(l, nullRight))
          val lTsVal = lTsRow.getLong(0)
          // consume all right rows at-or-before this left position
          while (rRow != null && {
            val c = keyOrdering.compare(rKey, lKey)
            c < 0 || (c == 0 && rTsVal <= lTsVal)
          }) {
            carriedKey = rKey
            carriedRow = carriedProj(rRow).copy()
            advanceRight()
          }
          if (carriedKey != null && keyOrdering.compare(carriedKey, lKey) == 0)
            resultProj(joined(l, carriedRow))
          else resultProj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}
