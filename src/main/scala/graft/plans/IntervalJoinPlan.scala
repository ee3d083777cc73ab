package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator point-in-interval join (logical node + strategy +
  * physical exec) — the native generalization of [[AsOfJoinExec]].
  *
  * Inner-join semantics: emit (left ++ carried) for every right
  * interval on the same key with `start <= left.ts < end` — the same
  * predicate as the composed `Relational.rangeJoin` (and the
  * reference-shaped q38 oracle's BETWEEN theta join).
  *
  * The composed form equi-joins on an exploded time bucket, which
  * multiplies the right side by (interval length / bucket width); with
  * long intervals or a mis-sized bucket that explode factor IS the
  * cost. This operator instead co-partitions both sides on the key,
  * sorts left by (key, ts) and right by (key, start), and streams once
  * through both with an active-interval buffer: intervals enter when
  * `start <= ts` and are evicted permanently once `end <= ts` (left ts
  * is non-decreasing within the key). State is O(max concurrently
  * open intervals per key) — independent of interval length, no
  * explode, one shuffle per side.
  */
case class IntervalJoinNode(left: LogicalPlan, right: LogicalPlan,
                            leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                            leftTs: Attribute,
                            rightStart: Attribute, rightEnd: Attribute,
                            carried: Seq[Attribute]) extends BinaryNode {
  NativeJoinSupport.requireMatchingKeyTypes("interval join", leftKeys, rightKeys)
  // same getLong-backed restriction as AsOfJoinNode: int/date ordering
  // columns would silently read the wrong slot width — fail at build
  for (a <- Seq(leftTs, rightStart, rightEnd))
    require(AsOfJoinNode.longBacked(a.dataType),
      s"interval-join ordering column '${a.name}' must be TIMESTAMP or " +
        s"BIGINT, got ${a.dataType.simpleString} — cast it explicitly first")
  override def output: Seq[Attribute] = left.output ++ carried
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): IntervalJoinNode = copy(left = l, right = r)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinNode(l, r, lk, rk, lts, rs, re, carried) =>
      IntervalJoinExec(lk, rk, lts, rs, re, carried, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                            leftTs: Expression,
                            rightStart: Expression, rightEnd: Expression,
                            carried: Seq[Attribute],
                            left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carried

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Left sorted by (key, ts); right by (key, start) — end is NOT in
    * the sort, the active buffer handles out-of-order ends. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightStart, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lts = leftTs
    val rBounds = Seq(rightStart, rightEnd)
    val carriedAttrs = carried
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lts), lOut)
      val rBoundsProj = UnsafeProjection.create(rBounds, rOut)
      val carriedProj = UnsafeProjection.create(carriedAttrs, rOut)
      val resultProj =
        UnsafeProjection.create(lOut ++ carriedAttrs, lOut ++ carriedAttrs)
      val keyOrdering =
        RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType).toIndexedSeq)
      val joined = new JoinedRow

      // lookahead on the right side; NULL key/start/end rows can never
      // satisfy `key = key AND start <= ts AND ts < end` — skip them
      var rRow: InternalRow = null
      var rKey: UnsafeRow = null
      var rStartVal = 0L
      var rEndVal = 0L
      def advanceRight(): Unit = {
        rRow = null; rKey = null
        while (rRow == null && rIter.hasNext) {
          val cand = rIter.next()
          val k = rKeyProj(cand)
          val b = rBoundsProj(cand)
          if (!k.anyNull && !b.isNullAt(0) && !b.isNullAt(1)) {
            rRow = cand
            rKey = k.copy()
            rStartVal = b.getLong(0)
            rEndVal = b.getLong(1)
          }
        }
      }
      advanceRight()

      // active intervals for the current left key: (end, carried row).
      // Entered when start <= ts, evicted for good once end <= ts —
      // valid because left ts is non-decreasing within the key.
      val active = new scala.collection.mutable.ArrayBuffer[(Long, UnsafeRow)]
      var curKey: UnsafeRow = null

      lIter.flatMap { l =>
        val lKey = lKeyProj(l)
        val lTsRow = lTsProj(l)
        if (lKey.anyNull || lTsRow.isNullAt(0)) Iterator.empty
        else {
          val lTsVal = lTsRow.getLong(0)
          if (curKey == null || keyOrdering.compare(curKey, lKey) != 0) {
            active.clear()
            curKey = lKey.copy()
          }
          // pull right intervals for this key whose start has arrived
          var pulling = true
          while (pulling && rRow != null) {
            val c = keyOrdering.compare(rKey, lKey)
            if (c < 0) advanceRight()
            else if (c == 0 && rStartVal <= lTsVal) {
              // keep only intervals that can still match a future ts
              if (rEndVal > lTsVal) active += ((rEndVal, carriedProj(rRow).copy()))
              advanceRight()
            } else pulling = false
          }
          active.filterInPlace(_._1 > lTsVal)
          // lazy per-left emission: each next() re-applies resultProj,
          // so the shared output row is never handed out twice stale.
          // The buffer only mutates after this iterator is exhausted
          // (Iterator.flatMap pulls the next left row only then).
          active.iterator.map(e => resultProj(joined(l, e._2)))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): IntervalJoinExec =
    copy(left = l, right = r)
}
