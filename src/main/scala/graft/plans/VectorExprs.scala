package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector-math expressions over array<double> columns. The
  * zip_with/aggregate higher-order forms are interpreted (one lambda
  * frame per element); these run the same IEEE-identical left-to-right
  * loops in plain JVM code. Used by the similarity operators where the
  * dot product sits inside a pairwise join (the hot loop).
  */
object VectorExprs {
  def dot(a: Column, b: Column): Column =
    GraftShim.column(VecDot(GraftShim.expression(a), GraftShim.expression(b)))
  def normSq(a: Column): Column =
    GraftShim.column(VecNormSq(GraftShim.expression(a)))
}

/** Σ aᵢ·bᵢ, accumulated left-to-right (bit-identical to the
  * aggregate(zip_with(...)) form it replaces). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Σ aᵢ², accumulated left-to-right. */
case class VecNormSq(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < a.numElements()) { val x = a.getDouble(i); acc += x * x; i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildInternal(c: Expression): VecNormSq =
    copy(child = c)
}
