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

  def minhashSigPortable(tokens: Column, shingleN: Int, numHashes: Int): Column =
    GraftShim.column(
      MinHashShinglePortable(GraftShim.expression(tokens), shingleN, numHashes))

  def simhash(tokens: Column): Column =
    GraftShim.column(SimHash64(GraftShim.expression(tokens)))

  def simhashPortable(tokens: Column): Column =
    GraftShim.column(SimHashPortable(GraftShim.expression(tokens)))

  def classifierScore(tokens: Column, nBuckets: Int = 4096): Column =
    GraftShim.column(
      HashedClassifierScore(GraftShim.expression(tokens), nBuckets))

  /** The unk floor score of a trained unigram vocab: well below the
    * rarest real piece, so the unk transition never outcompetes an
    * in-vocab segmentation — the SentencePiece discipline. ONE
    * definition, mirrored verbatim by the DuckDB oracles
    * (`MIN(score) - 10000000`). */
  def unkScoreOf(vocab: Map[String, Long]): Long = {
    require(vocab.nonEmpty, "unkScoreOf needs a non-empty vocab")
    vocab.valuesIterator.min - 10000000L
  }

  def unigramSegment(word: Column, vocab: Map[String, Long],
                     maxPieceLen: Int): Column =
    GraftShim.column(UnigramViterbi(GraftShim.expression(word), vocab,
      maxPieceLen, unkScoreOf(vocab)))

  /** Out-of-alphabet code points of `word` under `vocab`'s single-char
    * pieces — exactly the unk-piece count of the canonical
    * [[UnigramViterbi]] segmentation (no vocab piece contains an
    * out-of-alphabet code point, so each is covered by one unk
    * piece). */
  def unigramOovCount(word: Column, vocab: Map[String, Long]): Column =
    GraftShim.column(UnigramOovCount(GraftShim.expression(word),
      vocab.keysIterator
        .filter(p => p.codePointCount(0, p.length) == 1)
        .map(_.codePointAt(0)).toSet))

  def rollingTokenHash(tokens: Column): Column =
    GraftShim.column(RollingTokenHash(GraftShim.expression(tokens)))
}

/** Polynomial rolling hash of a token array (array<string> → long):
  * h ← (h·131 + ascii(t) + length(t)) mod 1000000007 over the tokens
  * in order — the order-sensitive document fingerprint of t05. One JVM
  * loop per row replacing an interpreted transform+aggregate lambda
  * pair. Per-token value matches `ascii(t) + length(t)` exactly:
  * ascii = the FIRST CODEPOINT (0 for empty — probed identical in
  * Spark and DuckDB, including multibyte: é→233, 中→20013), length =
  * codepoint count (UTF8String.numChars). All terms non-negative, so
  * plain % is the oracle's pmod. */
case class RollingTokenHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // A null ELEMENT yields a null result (the interpreted
  // transform+aggregate spelling this is bit-parity with propagates
  // lambda nulls), so nullability must also reflect containsNull.
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollhash", this, classOf[RollingTokenHash].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("rollhashRes")
      // ev.isNull is only DECLARED when nullable: with a non-nullable
      // child whose elements have containsNull=false, referencing it
      // is a janino compile error (silent interpreted fallback)
      if (nullable)
        s"""java.lang.Long $tmp = $ref.compute($a);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.longValue(); }""".stripMargin
      else
        s"${ev.value} = $ref.compute($a).longValue();"
    })
  }

  def compute(toks: ArrayData): java.lang.Long = {
    val n = toks.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      val t = toks.getUTF8String(i)
      h = (h * 131L + firstCodePoint(t) + t.numChars()) % 1000000007L
      i += 1
    }
    h
  }

  private def firstCodePoint(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val nb = s.numBytes()
    if (nb == 0) return 0L
    val b0 = s.getByte(0) & 0xff
    if (b0 < 0x80) b0.toLong
    else if (b0 < 0xe0)
      (((b0 & 0x1f) << 6) | (s.getByte(1) & 0x3f)).toLong
    else if (b0 < 0xf0)
      (((b0 & 0x0f) << 12) | ((s.getByte(1) & 0x3f) << 6) |
        (s.getByte(2) & 0x3f)).toLong
    else
      (((b0 & 0x07) << 18) | ((s.getByte(1) & 0x3f) << 12) |
        ((s.getByte(2) & 0x3f) << 6) | (s.getByte(3) & 0x3f)).toLong
  }

  override protected def withNewChildInternal(c: Expression): RollingTokenHash =
    copy(child = c)
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

/** Engine-PORTABLE MinHash signature (array<string> → array<long>):
  * component i = min over word-`shingleN`-gram shingles of
  * `(a + i·b) mod 1000000007`, where a/b are the first/second 15 hex
  * chars of md5(shingle) reduced mod p — pure md5 + bounded integer
  * arithmetic, so any engine reproduces the signatures bit-for-bit
  * (DuckDB: substr(md5(s)) + CAST('0x…' AS BIGINT); the d03 oracle).
  * One md5 per shingle (not per component) via the Kirsch-Mitzenmacher
  * affine family; thread-local digest because codegen shares the
  * expression instance across tasks. The xxhash64 [[MinHashShingleSig]]
  * stays the production signature (no string/digest work at all). */
case class MinHashShinglePortable(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression {
  import MinHashShinglePortable.P

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashP", this, classOf[MinHashShinglePortable].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  def compute(toks: ArrayData): GenericArrayData = {
    val n = toks.numElements()
    val nShingles = if (n >= shingleN) n - shingleN + 1 else 1
    val width = if (n >= shingleN) shingleN else n
    val md = MinHashShinglePortable.digest.get()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var s = 0
    while (s < nShingles) {
      sb.setLength(0)
      var j = 0
      while (j < width) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(s + j).toString)
        j += 1
      }
      md.reset()
      val hx = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // hex chars [0,15) and [16,31) as 60-bit ints, reduced mod p so
      // a + i*b never overflows (mirrors the oracle's % before the *)
      val a = MinHashShinglePortable.hexRange(hx, 0, 15) % P
      val b = MinHashShinglePortable.hexRange(hx, 16, 31) % P
      var k = 0
      while (k < numHashes) {
        val h = (a + k * b) % P
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashShinglePortable =
    copy(child = c)
}

object MinHashShinglePortable {
  /** The affine-family modulus (used identically in the SQL oracle). */
  val P = 1000000007L

  private[plans] val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Value of hex-digit positions [from, until) of a digest — exactly
    * `CAST('0x' || substr(hex, from+1, until-from) AS BIGINT)`. */
  def hexRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var v = 0L
    var i = from
    while (i < until) {
      val b = bytes(i / 2) & 0xff
      val nib = if (i % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
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

/** Engine-PORTABLE 60-bit SimHash (array<string> → long): per-token
  * hash = first 15 hex chars of md5(token) (60 bits), signed per-bit
  * vote, bit set iff the vote is strictly positive. Any md5-capable
  * engine reproduces it (the d04 oracle does, with `>>`/`&` on the
  * same hex-derived BIGINT). The xxhash64 [[SimHash64]] stays the
  * production variant. */
case class SimHashPortable(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashP", this, classOf[SimHashPortable].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  def compute(toks: ArrayData): Long = {
    val md = MinHashShinglePortable.digest.get()
    val votes = new Array[Int](60)
    var i = 0
    while (i < toks.numElements()) {
      md.reset()
      val hx = md.digest(toks.getUTF8String(i).toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = MinHashShinglePortable.hexRange(hx, 0, 15)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHashPortable =
    copy(child = c)
}

/** Hashed bag-of-n-grams linear classifier score (array<string> →
  * long): the fastText-style quality-gate inference pass as ONE native
  * expression. Features are the unigrams plus space-joined bigrams of
  * the token array; each feature's bucket is the first 13 hex chars of
  * its md5 (52 bits) mod `nBuckets`, and the score is the exact BIGINT
  * sum of the deterministic md5-derived bucket weights
  * (w(b) ∈ [-1000, 1000] — see [[HashedClassifierScore.weights]]).
  *
  * Bit-identical to the interpreted spelling
  * `hashedScoreOf(ngramFeatures(toks))` (TextAnalysis) and to the t20
  * DuckDB oracle, but it never materializes the feature array and runs
  * one JVM loop per row instead of two nested interpreted HOF lambdas
  * (no per-feature UTF8String concat, no base-16 string `conv`, no
  * 4096-element literal-array `element_at` walk). Measured ~5× on t20
  * at sf0.1. Codegen: reference-object call (see [[MinHashShingleSig]]),
  * so surrounding operators stay in whole-stage codegen. */
case class HashedClassifierScore(child: Expression, nBuckets: Int)
    extends UnaryExpression {
  require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // Null elements propagate to a null score (matching the interpreted
  // HOF spelling), so nullability reflects containsNull too.
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  @transient private lazy val w = HashedClassifierScore.weights(nBuckets)

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("clfScore", this, classOf[HashedClassifierScore].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("clfScoreRes")
      // see RollingTokenHash: ev.isNull is undeclared when nullable=false
      if (nullable)
        s"""java.lang.Long $tmp = $ref.compute($a);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.longValue(); }""".stripMargin
      else
        s"${ev.value} = $ref.compute($a).longValue();"
    })
  }

  def compute(toks: ArrayData): java.lang.Long = {
    val md = MinHashShinglePortable.digest.get()
    val n = toks.numElements()
    var score = 0L
    var prev: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      val cur = toks.getUTF8String(i).getBytes
      md.reset()
      score += w(bucketOf(md.digest(cur)))
      if (prev != null) {
        // bigram "prev cur" hashed without building a String
        val bi = new Array[Byte](prev.length + 1 + cur.length)
        System.arraycopy(prev, 0, bi, 0, prev.length)
        bi(prev.length) = ' '
        System.arraycopy(cur, 0, bi, prev.length + 1, cur.length)
        md.reset()
        score += w(bucketOf(md.digest(bi)))
      }
      prev = cur
      i += 1
    }
    score
  }

  @inline private def bucketOf(digest: Array[Byte]): Int =
    (MinHashShinglePortable.hexRange(digest, 0, 13) % nBuckets).toInt

  override protected def withNewChildInternal(c: Expression): HashedClassifierScore =
    copy(child = c)
}

/** Canonical unigram-LM Viterbi segmentation of one word (string →
  * array<string> of pieces) — the APPLY step of the SentencePiece-style
  * tokenizer family (Kudo 2018 §3). `vocab` maps each piece to an
  * INTEGER-scaled log-probability (round(ln(p)·10⁶), computed by
  * [[graft.operators.TextAnalysis.unigramVocab]]), so the DP is pure
  * 64-bit integer arithmetic — bit-exact across engines, no float
  * accumulation order to drift. The canonical optimum is total-ordered:
  * maximize score, then minimize token count, then prefer the SHORTEST
  * last piece at every DP cell (the oracle's ROW_NUMBER ORDER BY
  * score DESC, ntok ASC, bp ASC — ties cannot diverge).
  *
  * TOTAL over arbitrary input (the SentencePiece `<unk>` rule): a code
  * point outside the trained alphabet segments as ITS OWN single-char
  * piece at the floor score `unkScore` — applying a trained tokenizer
  * to NEW ingest (the operator's production purpose) must never throw
  * on content, exactly as the reference's stream parse never throws on
  * wire text (reference `spark/jobs/stock_stream.py:131-143`). The unk
  * transition exists only where the table lookup misses, so it never
  * competes with an in-alphabet piece; downstream counts unk pieces
  * via [[UnigramOovCount]] (≡ out-of-alphabet code points — no vocab
  * piece contains one, so the canonical segmentation covers each with
  * exactly one unk piece).
  *
  * One tight JVM loop per word: O(len × maxPieceLen) table lookups,
  * no joins, no window, no per-position rows — the vocab is a few
  * hundred entries by construction (the learner's vocabSize cap), so
  * it rides the expression as a reference object and the whole
  * segmentation is a map-side pass over the DISTINCT-WORD table.
  * Codegen calls straight into [[compute]] via a reference object, so
  * surrounding operators stay in whole-stage codegen. */
case class UnigramViterbi(child: Expression, vocab: Map[String, Long],
                          maxPieceLen: Int, unkScore: Long)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uniViterbi", this, classOf[UnigramViterbi].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.compute($w);")
  }

  def compute(w: org.apache.spark.unsafe.types.UTF8String): GenericArrayData = {
    // DP over CODE POINTS, not UTF-16 units: the seed vocab and the
    // oracle measure pieces with Spark/DuckDB substr/length (code
    // points), so a supplementary-plane char must cost ONE position —
    // indexing java.lang.String directly would double-count it and
    // diverge the canonical segmentation from the oracle
    val s = w.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    def sub(from: Int, until: Int): String =
      new String(cps, from, until - from)
    // dp over prefix lengths: best (score, ntok) + the chosen last-piece
    // length. Every cell is reachable: the l = 1 slot always has a
    // candidate — the vocab single (alphabet chars are never pruned)
    // or, for an out-of-alphabet code point, the unk transition at
    // `unkScore` — so the DP is total over arbitrary input
    val score = new Array[Long](n + 1)
    val ntok = new Array[Int](n + 1)
    val bp = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var bestS = Long.MinValue
      var bestT = Int.MaxValue
      var bestL = 0
      val lMax = if (maxPieceLen < j) maxPieceLen else j
      var l = 1
      while (l <= lMax) {
        val ps = table.get(sub(j - l, j))
        if ((ps ne null) || l == 1) {
          val cs = score(j - l) +
            (if (ps ne null) ps.longValue() else unkScore)
          val ct = ntok(j - l) + 1
          // strict improvement only: the first (smallest) l wins ties,
          // matching the oracle's bp ASC tiebreak
          if (cs > bestS || (cs == bestS && ct < bestT)) {
            bestS = cs; bestT = ct; bestL = l
          }
        }
        l += 1
      }
      score(j) = bestS; ntok(j) = bestT; bp(j) = bestL
      j += 1
    }
    val pieces = new Array[Any](ntok(n))
    var pos = n
    var k = ntok(n) - 1
    while (pos > 0) {
      val l = bp(pos)
      pieces(k) = org.apache.spark.unsafe.types.UTF8String
        .fromString(sub(pos - l, pos))
      pos -= l
      k -= 1
    }
    new GenericArrayData(pieces)
  }

  override protected def withNewChildInternal(c: Expression): UnigramViterbi =
    copy(child = c)
}

/** Count of code points outside `alphabet` (string → long) — the
  * `n_unk` companion of [[UnigramViterbi]]: because no trained vocab
  * piece contains an out-of-alphabet code point and alphabet singles
  * are never pruned, this equals the unk-piece count of the canonical
  * segmentation WITHOUT re-running the DP. One O(len) loop per word
  * over the distinct-word table; codegen via reference object keeps
  * the surrounding operators in whole-stage codegen. */
case class UnigramOovCount(child: Expression, alphabet: Set[Int])
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val set: java.util.HashSet[Integer] = {
    val s = new java.util.HashSet[Integer](alphabet.size * 2)
    alphabet.foreach(cp => s.add(Integer.valueOf(cp)))
    s
  }

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uniOov", this, classOf[UnigramOovCount].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.compute($w);")
  }

  def compute(w: org.apache.spark.unsafe.types.UTF8String): Long = {
    val it = w.toString.codePoints().iterator()
    var n = 0L
    while (it.hasNext) if (!set.contains(it.next())) n += 1L
    n
  }

  override protected def withNewChildInternal(c: Expression): UnigramOovCount =
    copy(child = c)
}

object HashedClassifierScore {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  /** The canonical md5-derived integer weight vector:
    * w(b) = (first-13-hex-chars of md5(b)) % 2001 - 1000 ∈ [-1000, 1000].
    * Deterministic stand-in for trained parameters (a real deployment
    * swaps in its trained array; nothing else changes). Cached per
    * size; also the source of truth for the interpreted spelling
    * (TextAnalysis.classifierWeights delegates here). */
  def weights(nBuckets: Int): Array[Long] =
    cache.computeIfAbsent(nBuckets,
      (n: Int) => {
        val md = java.security.MessageDigest.getInstance("MD5")
        Array.tabulate(n) { b =>
          MinHashShinglePortable.hexRange(
            md.digest(b.toString.getBytes(
              java.nio.charset.StandardCharsets.UTF_8)), 0, 13) % 2001L - 1000L
        }
      })
}
