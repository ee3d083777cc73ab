package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector-math expressions over array<double> columns with full
  * whole-stage codegen (`doGenCode` emits the loop inline — no lambda
  * frames, no boxing, no codegen boundary). Used by the similarity
  * operators where the dot product sits inside a pairwise join.
  */
object VectorExprs {
  def dot(a: Column, b: Column): Column =
    GraftShim.column(VecDot(GraftShim.expression(a), GraftShim.expression(b)))
  def normSq(a: Column): Column =
    GraftShim.column(VecNormSq(GraftShim.expression(a)))
  def l2normalize(a: Column): Column =
    GraftShim.column(VecL2Normalize(GraftShim.expression(a)))
  def firstAgreeIndex(a: Column, b: Column, groupSize: Int = 1): Column =
    GraftShim.column(FirstAgreeIndex(GraftShim.expression(a), GraftShim.expression(b), groupSize))
  def agreeCount(a: Column, b: Column): Column =
    GraftShim.column(AgreeCount(GraftShim.expression(a), GraftShim.expression(b)))
  def hyperplaneSigs(vec: Column, planes: Array[Array[Double]],
                     tables: Int, bitsPerTable: Int): Column =
    GraftShim.column(HyperplaneSigs(GraftShim.expression(vec), planes, tables, bitsPerTable))
  def matVecProject(vec: Column, planes: Array[Array[Double]]): Column =
    GraftShim.column(MatVecProject(GraftShim.expression(vec), planes))
}

/** Dense matrix-vector product in ONE fused pass: out[p] = dot(vec,
  * planes[p]) — the projection kernel of random-projection /
  * Johnson–Lindenstrauss dimensionality reduction. Same rationale as
  * [[HyperplaneSigs]]: one expression with the matrix in the codegen
  * references array keeps the whole outDim × dim loop inside
  * whole-stage codegen, where outDim separate VecDot trees against
  * array literals would each re-materialize the plane operand and risk
  * Janino method-size fallback. Accumulation is left-to-right per
  * plane, so values are IEEE-deterministic and match any engine that
  * folds the dot in index order. */
case class MatVecProject(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val out = new Array[Double](planes.length)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(a.numElements(), plane.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a.getDouble(i) * plane(i); i += 1 }
      out(p) = acc
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val plane = ctx.freshName("plane")
      s"""
         |double[] $out = new double[${planes.length}];
         |for (int $p = 0; $p < ${planes.length}; $p++) {
         |  double[] $plane = $mat[$p];
         |  int $n = java.lang.Math.min($a.numElements(), $plane.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $acc += $a.getDouble($i) * $plane[$i]; }
         |  $out[$p] = $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MatVecProject =
    copy(child = c)
}

/** All `tables` random-hyperplane signatures of a vector in ONE pass:
  * out[t] = Σ_b (dot(vec, planes[t·bits+b]) ≥ 0) · 2^b. Bit-identical
  * to the per-table `signature()` composition it replaces (same plane
  * order, same bit positions) but a single expression: composing it
  * from tables × bits separate VecDot trees generated a method too
  * large for Janino (observed InternalCompilerException → interpreted
  * fallback at 48 × 4 planes). The plane matrix lives in the codegen
  * references array, not in the generated source. */
case class HyperplaneSigs(child: Expression, planes: Array[Array[Double]],
                          tables: Int, bitsPerTable: Int) extends UnaryExpression {
  require(planes.length >= tables * bitsPerTable,
    s"need ${tables * bitsPerTable} planes, got ${planes.length}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def eval(a: ArrayData): Array[Long] = {
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bitsPerTable) {
        val plane = planes(t * bitsPerTable + b)
        val n = math.min(a.numElements(), plane.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += a.getDouble(i) * plane(i); i += 1 }
        if (acc >= 0) sig |= 1L << b
        b += 1
      }
      out(t) = sig
      t += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(eval(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val plane = ctx.freshName("plane")
      s"""
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $b = 0; $b < $bitsPerTable; $b++) {
         |    double[] $plane = $mat[$t * $bitsPerTable + $b];
         |    int $n = java.lang.Math.min($a.numElements(), $plane.length);
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) { $acc += $a.getDouble($i) * $plane[$i]; }
         |    if ($acc >= 0) $sig |= 1L << $b;
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSigs =
    copy(child = c)
}

/** First group index g where a and b agree on EVERY element of
  * [g·groupSize, (g+1)·groupSize) — −1 if no group agrees. The dedup
  * test for multi-table/banded LSH: a colliding pair is kept only in
  * the FIRST table (groupSize=1, one signature per table) or FIRST band
  * (groupSize=rows-per-band) whose signatures agree, so each candidate
  * surfaces exactly once and no pair-distinct() shuffle is needed.
  * Inputs are equal-length array<long> signature arrays; mismatched
  * lengths compare the common whole groups. A handful of long compares
  * replaces a re-ranked similarity computation per redundant collision. */
case class FirstAgreeIndex(left: Expression, right: Expression,
                           groupSize: Int = 1) extends BinaryExpression {
  require(groupSize >= 1, s"groupSize must be >= 1, got $groupSize")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val groups = math.min(a.numElements(), b.numElements()) / groupSize
    var g = 0
    while (g < groups) {
      var ok = true
      var i = g * groupSize
      val end = i + groupSize
      while (ok && i < end) { ok = a.getLong(i) == b.getLong(i); i += 1 }
      if (ok) return java.lang.Integer.valueOf(g)
      g += 1
    }
    java.lang.Integer.valueOf(-1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val groups = ctx.freshName("groups")
      val g = ctx.freshName("g")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val ok = ctx.freshName("ok")
      val res = ctx.freshName("res")
      s"""
         |int $groups = java.lang.Math.min($a.numElements(), $b.numElements()) / $groupSize;
         |int $res = -1;
         |for (int $g = 0; $g < $groups; $g++) {
         |  boolean $ok = true;
         |  int $end = ($g + 1) * $groupSize;
         |  for (int $i = $g * $groupSize; $ok && $i < $end; $i++) {
         |    $ok = $a.getLong($i) == $b.getLong($i);
         |  }
         |  if ($ok) { $res = $g; break; }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FirstAgreeIndex =
    copy(left = l, right = r)
}

/** Count of positions where a[i] == b[i] (over the common prefix) — the
  * MinHash similarity estimate numerator, one fused loop instead of an
  * interpreted zip_with + aggregate lambda pair. */
case class AgreeCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    java.lang.Integer.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AgreeCount =
    copy(left = l, right = r)
}

/** Σ aᵢ·bᵢ, accumulated left-to-right (bit-identical to the
  * aggregate(zip_with(...)) form it replaces for equal-length inputs;
  * mismatched lengths truncate to the shorter array, where the HOF
  * form would return NULL). */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Σ aᵢ², accumulated left-to-right. */
case class VecNormSq(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < a.numElements()) { val x = a.getDouble(i); acc += x * x; i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  $acc += $x * $x;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecNormSq =
    copy(child = c)
}

/** v / ‖v‖ in one pass over the array (norm computed once, then one
  * divide per element — the HOF `transform(a, x => x / norm(a))` form
  * re-evaluates the norm lambda-frame per element, O(d²) per row).
  * A zero vector is returned unchanged (no NaNs). */
case class VecL2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); acc += x * x; i += 1 }
    val norm = math.sqrt(acc)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = if (norm == 0.0) a.getDouble(i) else a.getDouble(i) / norm
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val norm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  $acc += $x * $x;
         |}
         |double $norm = java.lang.Math.sqrt($acc);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $norm == 0.0 ? $a.getDouble($i) : $a.getDouble($i) / $norm;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecL2Normalize =
    copy(child = c)
}
