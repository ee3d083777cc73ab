package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hash-sketch operators.
  *
  * The composed higher-order-function forms (transform/aggregate/
  * zip_with) are interpreted per lambda frame — no whole-stage codegen,
  * no common-subexpression elimination — which made MinHash signatures
  * the hottest path in the dedup pipeline. These expressions do the
  * same math in one tight JVM loop per row (~10× less per-row overhead)
  * and keep the rest of the plan (joins, dedup, est-jaccard) in
  * ordinary codegen'd operators.
  *
  * Hashing matches `xxhash64(...)` (seed 42) so values line up with
  * the SQL-function-based paths where both appear.
  */
object TextHash {
  /** Largest prime below 2^32 — the MinHash permutation field. */
  val P32 = 4294967291L

  /** Deterministic affine-permutation coefficients (fixed LCG, bounded
    * to 2^30 so h*a+b stays well under 2^63). */
  def coeffs(n: Int): Array[(Long, Long)] = {
    var x = 0x9E3779B97F4A7C15L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    Array.fill(n)(((next() & 0x3FFFFFFFL) | 1L, next() & 0x3FFFFFFFL))
  }

  /** 64→64-bit finalizer (splitmix64) used to combine token hashes into
    * shingle hashes without materializing shingle strings. */
  @inline private[plans] def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def minhashSig(tokens: Column, shingleN: Int, numHashes: Int): Column =
    GraftShim.column(
      MinHashShingleSig(GraftShim.expression(tokens), shingleN, numHashes))

  def simhash(tokens: Column): Column =
    GraftShim.column(SimHash64(GraftShim.expression(tokens)))
}

/** MinHash signature over word-`shingleN`-gram shingles of a token
  * array (array<string> → array<long> of length `numHashes`).
  * Shingle hash = splitmix-combined xxhash64 of the member tokens;
  * short documents collapse to one whole-document shingle. One pass:
  * O(tokens × numHashes), no per-shingle string allocation.
  *
  * Codegen calls straight into [[compute]] via a reference object — the
  * surrounding operators stay in whole-stage codegen with no row
  * materialization or boxing at the boundary. */
case class MinHashShingleSig(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression {
  private lazy val cs = TextHash.coeffs(numHashes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashShingleSig].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  def compute(toks: ArrayData): GenericArrayData = {
    val n = toks.numElements()
    // token hashes
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = XxHash64Function.hash(toks.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val sig = Array.fill(numHashes)(TextHash.P32)
    val nShingles = if (n >= shingleN) n - shingleN + 1 else 1
    val width = if (n >= shingleN) shingleN else n
    var s = 0
    while (s < nShingles) {
      var acc = 0L
      var j = 0
      while (j < width) {
        acc = TextHash.mix(acc ^ th(s + j))
        j += 1
      }
      val h = { val m = acc % TextHash.P32; if (m < 0) m + TextHash.P32 else m }
      var k = 0
      while (k < numHashes) {
        val p = (h * cs(k)._1 + cs(k)._2) % TextHash.P32
        if (p < sig(k)) sig(k) = p
        k += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashShingleSig =
    copy(child = c)
}

/** 64-bit SimHash of a token array (array<string> → long): signed
  * per-bit vote of each token's xxhash64, packed by vote sign.
  * Codegen: reference-object call (see [[MinHashShingleSig]]). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  def compute(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.numElements()) {
      val h = XxHash64Function.hash(toks.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}
