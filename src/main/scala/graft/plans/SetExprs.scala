package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

object SetExprs {
  def jaccard(a: Column, b: Column): Column =
    GraftShim.column(ArrayJaccard(GraftShim.expression(a), GraftShim.expression(b)))
}

/** Jaccard similarity |A∩B| / |A∪B| of two string arrays (duplicates
  * ignored — set semantics), rounded to 6dp. One hash-set pass per
  * pair instead of the composed array_intersect + array_union (two
  * full set builds plus two materialized intermediate arrays) — this
  * sits in the inner loop of pairwise similarity joins. Matches
  * `round(size(array_intersect)/size(array_union), 6)` exactly:
  * integer set sizes, HALF_UP rounding. */
case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = compute(
    l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  def compute(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[Any](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val seenB = new java.util.HashSet[Any](b.numElements() * 2)
    var inter = 0
    var bOnly = 0
    i = 0
    while (i < b.numElements()) {
      val v = b.getUTF8String(i)
      if (seenB.add(v)) { if (setA.contains(v)) inter += 1 else bOnly += 1 }
      i += 1
    }
    val union = setA.size + bOnly
    if (union == 0) 0.0
    else java.math.BigDecimal.valueOf(inter.toDouble / union)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jac", this, classOf[ArrayJaccard].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayJaccard =
    copy(left = l, right = r)
}
