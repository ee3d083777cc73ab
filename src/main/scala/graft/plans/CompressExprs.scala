package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed size of a string's UTF-8 bytes — the
  * "compression ratio" quality signal of large-corpus pipelines
  * (Gopher/RefinedWeb family): highly repetitive/boilerplate text
  * compresses far below natural prose, so compressed/raw is a cheap
  * one-pass gate no n-gram statistic fully replaces. zlib has no SQL
  * spelling, so this operator is ScalaTest-verified (no DuckDB oracle)
  * — the same bar as the DSv2 source and skew operators.
  *
  * Scale shape: per-row CPU, no shuffle, no state; the Deflater is
  * allocated per evaluation partition via a thread-local and reset per
  * row (allocation-free steady state). Codegen via the reference-object
  * pattern (one virtual call per row, stays inside whole-stage codegen
  * like SimHash64).
  */
object CompressExprs {
  /** Compressed byte count (long) at the given zlib level. */
  def deflateSize(text: Column, level: Int = 6): Column =
    GraftShim.column(DeflateSize(GraftShim.expression(text), level))
}

case class DeflateSize(child: Expression, level: Int) extends UnaryExpression {
  require(level >= 1 && level <= 9, s"zlib level must be 1-9, got $level")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val deflaters =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue() = new java.util.zip.Deflater(level, true)
    }

  def compute(s: UTF8String): Long = {
    val d = deflaters.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(compute(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflate", this, classOf[DeflateSize].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): DeflateSize =
    copy(child = c)
}
