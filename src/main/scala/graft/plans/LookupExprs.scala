package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native lookup expressions for broadcast-side reference data. */
object LookupExprs {
  /** Latest struct in `arr` (sorted ascending by its FIRST field, a
    * timestamp/long) whose first field is <= `ts`; NULL if none. */
  def asOfPick(arr: Column, ts: Column): Column =
    GraftShim.column(AsOfPick(GraftShim.expression(arr), GraftShim.expression(ts)))
}

/** Binary search over a sorted array<struct<ts, ...>> for the last
  * element with `elem.ts <= ts` — the probe side of the broadcast
  * as-of join (AsOfJoin.asOfBroadcast). O(log n) per row, full
  * codegen, no lambda frames.
  *
  * Preconditions (enforced by the caller, asserted here at analysis):
  * the array is sorted ascending by the struct's first field, the
  * first field and `ts` are both the same long-backed type
  * (timestamp or bigint), and no element has a NULL first field
  * (asOfBroadcast filters NULL-ts rows before packing).
  */
case class AsOfPick(left: Expression, right: Expression) extends BinaryExpression {
  private def elemType: StructType =
    left.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private def nFields: Int = elemType.size

  override def dataType: DataType = elemType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    left.dataType match {
      case ArrayType(st: StructType, _) if st.nonEmpty =>
        val tsType = st.head.dataType
        if (!AsOfJoinNode.longBacked(tsType) ||
            !DataType.equalsStructurally(right.dataType, tsType, ignoreNullability = true))
          TypeCheckResult.TypeCheckFailure(
            s"asOfPick needs matching timestamp/bigint types, got array " +
              s"ordered by ${tsType.simpleString} probed with " +
              s"${right.dataType.simpleString}")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"asOfPick needs array<struct<ts, ...>>, got ${other.simpleString}")
    }
  }

  override def nullSafeEval(arrAny: Any, tsAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val ts = tsAny.asInstanceOf[Long]
    val n = nFields
    var lo = 0
    var hi = arr.numElements() - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getStruct(mid, n).getLong(0) <= ts) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans < 0) null else arr.getStruct(ans, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, ts) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val ans = ctx.freshName("ans")
      val n = nFields
      s"""
         |int $lo = 0;
         |int $hi = $arr.numElements() - 1;
         |int $ans = -1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr.getStruct($mid, $n).getLong(0) <= $ts) {
         |    $ans = $mid; $lo = $mid + 1;
         |  } else { $hi = $mid - 1; }
         |}
         |if ($ans < 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $arr.getStruct($ans, $n); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AsOfPick =
    copy(left = l, right = r)
}
