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

  def markerCount(arr: Column, markers: Seq[String]): Column =
    GraftShim.column(MarkerCount(GraftShim.expression(arr), markers))

  def charGramMarkerCount(s: Column, markers: Seq[String], n: Int): Column =
    GraftShim.column(CharGramMarkerCount(GraftShim.expression(s), markers, n))

  def shingleArray(toks: Column, n: Int): Column =
    GraftShim.column(ShingleArray(GraftShim.expression(toks), n))

  def symbolCount(s: Column): Column =
    GraftShim.column(SymbolCount(GraftShim.expression(s)))

  def intersectCount(a: Column, b: Column): Column =
    GraftShim.column(ArrayIntersectCount(
      GraftShim.expression(a), GraftShim.expression(b)))

  def sortedLongIntersectCount(a: Column, b: Column): Column =
    GraftShim.column(SortedLongIntersectCount(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** Analysis-time input check for the public array-set SQL functions:
    * both operands must be array<string> — a non-string array would
    * otherwise ClassCastException at RUNTIME inside getUTF8String
    * (these are registered SQL functions; users deserve an analysis
    * error, the array_intersect contract). */
  private[plans] def requireStringArrays(fn: String, left: Expression,
      right: Expression): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$fn expects (array<string>, array<string>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  }
}

/** |A ∩ B| over string arrays with set semantics (long) — the
  * containment-verify hot loop (d19): one hash set + one membership
  * pass, no intermediate array. `size(array_intersect(a, b))`
  * materializes the intersection array per pair inside the verify
  * join's inner loop just to take its length (the ArrayJaccard
  * lesson). Registered as the public SQL `graft_intersect_count`, so
  * inputs are TYPE-CHECKED at analysis time (array<string> only — a
  * non-string array would otherwise ClassCastException mid-query) and
  * NULL elements follow array_intersect's set semantics: null is a
  * member value, in the intersection iff present in BOTH sides,
  * counted once. */
case class ArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SetExprs.requireStringArrays("graft_intersect_count", left, right)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = compute(
    l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  def compute(a: ArrayData, b: ArrayData): Long = {
    val nA = a.numElements()
    val nB = b.numElements()
    val setA = new java.util.HashSet[Any](nA * 2)
    var aHasNull = false
    var i = 0
    while (i < nA) {
      if (a.isNullAt(i)) aHasNull = true else setA.add(a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[Any](nB * 2)
    var bHasNull = false
    var inter = 0L
    i = 0
    while (i < nB) {
      if (b.isNullAt(i)) {
        if (!bHasNull) { bHasNull = true; if (aHasNull) inter += 1 }
      } else {
        val v = b.getUTF8String(i)
        if (seenB.add(v) && setA.contains(v)) inter += 1
      }
      i += 1
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ic", this, classOf[ArrayIntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayIntersectCount =
    copy(left = l, right = r)
}

/** |A ∩ B| over DISTINCT, ASCENDING-SORTED long arrays (long) — the
  * typed twin of [[ArrayIntersectCount]] for the d19 containment
  * verify stage (r19, optimization guide §4.2/codegen): with 64-bit
  * shingle keys (xxhash64) pre-sorted once per document at set build,
  * each candidate pair costs ONE allocation-free merge scan of two
  * long arrays — no hash-set build, no UTF8String hashing/equality
  * per element, no boxing. PRECONDITION (the caller's contract, not
  * checked at runtime): both arrays are element-distinct and sorted
  * ascending with nulls FIRST — exactly `sort_array(array_distinct(
  * ...), asc)`. Null elements follow array_intersect set semantics
  * (null is a member value, in the intersection iff present in both
  * sides, counted once); leading-null runs are tolerated so the
  * precondition degrades gracefully to set semantics on the null
  * member. Registered as the public SQL
  * `graft_sorted_intersect_count` with analysis-time type checking
  * (array<bigint> only). */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_intersect_count expects (array<bigint>, " +
          s"array<bigint>), got (${l.catalogString}, ${r.catalogString})")
    }
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = compute(
    l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  def compute(a: ArrayData, b: ArrayData): Long = {
    val nA = a.numElements()
    val nB = b.numElements()
    var i = 0
    var j = 0
    // sort_array(asc) places nulls first: consume the null prefix of
    // each side, counting the null member once if both sides carry it
    var aHadNull = false
    while (i < nA && a.isNullAt(i)) { aHadNull = true; i += 1 }
    var inter = 0L
    if (aHadNull) {
      var bHadNull = false
      while (j < nB && b.isNullAt(j)) { bHadNull = true; j += 1 }
      if (bHadNull) inter += 1
    } else {
      while (j < nB && b.isNullAt(j)) j += 1
    }
    while (i < nA && j < nB) {
      val av = a.getLong(i)
      val bv = b.getLong(j)
      if (av == bv) { inter += 1; i += 1; j += 1 }
      else if (av < bv) i += 1
      else j += 1
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sic", this,
      classOf[SortedLongIntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongIntersectCount =
    copy(left = l, right = r)
}

/** Count of codepoints OUTSIDE [A-Za-z0-9 ] (string → long) — the
  * symbol-ratio numerator of the Gopher quality rules. Replaces
  * `length(s) - length(regexp_replace(s, "[^A-Za-z0-9 ]", ""))`:
  * java.util.regex walks a per-char predicate lambda chain and builds
  * the scrubbed string just to take its length, which made the regex
  * the ENTIRE cost of t21 at the 100x sweep (thread dumps: all samples
  * in Pattern$BmpCharPredicate; 17.8 s → ~1 s). One pass over the
  * UTF-8 bytes, no allocation: an ASCII byte checks the class
  * directly; any non-ASCII LEAD byte (not 10xxxxxx) counts as one
  * symbol codepoint — exactly the codepoint arithmetic of the
  * length-difference spelling, for any UTF-8 input. */
case class SymbolCount(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("symcount", this, classOf[SymbolCount].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  def compute(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = s.numBytes()
    var i = 0
    var symbols = 0L
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (b < 0x80) {
        val ok = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9') || b == ' '
        if (!ok) symbols += 1
      } else if ((b & 0xc0) != 0x80) {
        symbols += 1 // lead byte of a non-ASCII codepoint
      }
      i += 1
    }
    symbols
  }

  override protected def withNewChildInternal(c: Expression): SymbolCount =
    copy(child = c)
}

/** Word n-gram shingles over a token array (array<string> →
  * array<string>), one pass: each shingle is a single UTF8String
  * concat. Replaces the composed `transform(sequence(...), i ->
  * concat_ws(" ", slice(toks, i+1, n)))`, whose interpreted lambda +
  * per-shingle slice allocation dominated the shingle-heavy operators
  * (d09 contamination measured 3.5 s warm → ~1 s at sf0.1). Semantics
  * identical to the composed form and to the SQL oracles' shingle CTE:
  * documents shorter than `n` collapse to one whole-document shingle.
  */
case class ShingleArray(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[ShingleArray].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  def compute(toks: ArrayData): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val sep = ShingleArray.Space
    val cnt = toks.numElements()
    val nShingles = if (cnt >= n) cnt - n + 1 else 1
    val width = if (cnt >= n) n else cnt
    val out = new Array[AnyRef](nShingles)
    val parts = new Array[UTF8String](width)
    var s = 0
    while (s < nShingles) {
      var j = 0
      while (j < width) { parts(j) = toks.getUTF8String(s + j); j += 1 }
      out(s) = UTF8String.concatWs(sep, parts: _*)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ShingleArray =
    copy(child = c)
}

object ShingleArray {
  private[plans] val Space =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")
}

/** Fused char-n-gram marker count over a STRING: slides an n-char
  * window and counts hash-set hits without materializing a gram array
  * (the transform(sequence...substring) form allocates one string per
  * position per row). Gram positions replicate the SQL form
  * `transform(sequence(1, greatest(len-(n-1), 1)), i -> substring(s, i, n))`:
  * strings shorter than n contribute their single whole-string
  * candidate. */
case class CharGramMarkerCount(child: Expression, markers: Seq[String], n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val markerBytes: Array[Array[Byte]] =
    markers.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  /** One O(bytes) pass builds char→byte offsets; each window is then a
    * direct byte-range compare against the few marker byte strings —
    * no per-gram string allocation, no O(position) re-scans (which
    * substringSQL would pay, making the naive loop O(len²)). */
  def compute(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    import org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte
    val bytes = s.getBytes
    val offs = new Array[Int](bytes.length + 1)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      offs(nChars) = i
      i += numBytesForFirstByte(bytes(i))
      nChars += 1
    }
    offs(nChars) = bytes.length
    val last = math.max(nChars - (n - 1), 1) // gram count (1-based SQL parity)
    var count = 0L
    var p = 0
    while (p < last) {
      val start = offs(p)
      val end = offs(math.min(p + n, nChars))
      val glen = end - start
      var m = 0
      var hit = false
      while (!hit && m < markerBytes.length) {
        val mb = markerBytes(m)
        if (mb.length == glen) {
          var k = 0
          while (k < glen && bytes(start + k) == mb(k)) k += 1
          hit = k == glen
        }
        m += 1
      }
      if (hit) count += 1
      p += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cgmc", this, classOf[CharGramMarkerCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): CharGramMarkerCount =
    copy(child = c)
}

/** Occurrence count of marker strings in a string array (NOT distinct —
  * each occurrence counts), as one loop against a prebuilt hash set.
  * Replaces size(filter(arr, x -> x IN (...))), whose lambda is
  * interpreted per element with a linear IN-list scan. */
case class MarkerCount(child: Expression, markers: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val set = {
    val s = new java.util.HashSet[Any](markers.size * 2)
    markers.foreach(m => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(m)))
    s
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  def compute(a: ArrayData): Long = {
    val len = a.numElements()
    var n = 0L
    var i = 0
    while (i < len) {
      if (set.contains(a.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mc", this, classOf[MarkerCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): MarkerCount =
    copy(child = c)
}

/** Jaccard similarity |A∩B| / |A∪B| of two string arrays (duplicates
  * ignored — set semantics), as the RAW IEEE quotient: integer set
  * sizes divide to the same double on every engine, whereas a 6dp
  * rounding diverges on exact 7-digit halves (|∪| = 128 with odd
  * |∩| — Spark rounds half-up, DuckDB half-to-even). One hash-set
  * pass per pair instead of the composed array_intersect +
  * array_union (two full set builds plus two materialized
  * intermediate arrays) — this sits in the inner loop of pairwise
  * similarity joins. Two empty arrays (a 0/0 union) yield NULL — the
  * oracle engine's division-by-zero result — rather than ANSI
  * Spark's DIVIDE_BY_ZERO error or a fabricated 0. Public SQL
  * (`graft_jaccard`): inputs type-checked at analysis time; NULL
  * elements follow array_intersect/array_union set semantics (null is
  * a member value — in the intersection iff in both, in the union if
  * in either, counted once). */
case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SetExprs.requireStringArrays("graft_jaccard", left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = compute(
    l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  /** Boxed so the 0/0 case can be NULL, matching the composed form. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val nA = a.numElements()
    val nB = b.numElements()
    val setA = new java.util.HashSet[Any](nA * 2)
    var aHasNull = false
    var i = 0
    while (i < nA) {
      if (a.isNullAt(i)) aHasNull = true else setA.add(a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[Any](nB * 2)
    var bHasNull = false
    var inter = 0
    var bOnly = 0
    i = 0
    while (i < nB) {
      if (b.isNullAt(i)) {
        if (!bHasNull) { bHasNull = true; if (aHasNull) inter += 1 else bOnly += 1 }
      } else {
        val v = b.getUTF8String(i)
        if (seenB.add(v)) { if (setA.contains(v)) inter += 1 else bOnly += 1 }
      }
      i += 1
    }
    val union = setA.size + (if (aHasNull) 1 else 0) + bOnly
    if (union == 0) null
    else java.lang.Double.valueOf(inter.toDouble / union)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jac", this, classOf[ArrayJaccard].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_r = $ref.compute($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayJaccard =
    copy(left = l, right = r)
}
