package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built Spark
  * [[org.apache.spark.util.sketch.BloomFilter]] — the fact-side half of
  * semi-join reduction (see `Relational.bloomPruneJoin`). The
  * serialized sketch rides in the expression and is deserialized once
  * per executor via the codegen references array, so the per-row cost
  * is the sketch's own k hash probes inside whole-stage codegen; no
  * UDF, no boxing, no broadcast-variable plumbing in the hot loop.
  *
  * Mirrors Spark's own InjectRuntimeFilter machinery
  * (`BloomFilterMightContain`) but as an explicit, conf-independent
  * operator: the optimizer's version only fires under size thresholds
  * tuned for real clusters, which makes plans environment-dependent —
  * this one is part of the declared query, testable, and its sketch
  * can be built once and reused across queries.
  */
object BloomExprs {
  def mightContain(key: Column, bloomBits: Array[Byte]): Column =
    GraftShim.column(BloomMightContainKey(GraftShim.expression(key), bloomBits))

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def deserialize(bits: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bits))
}

/** `bloom.mightContainLong(key)` over an integral key column. A null
  * key row is dropped (null output ⇒ filter false), matching inner-join
  * semantics — a null key can never join, so pruning it is exact. */
case class BloomMightContainKey(child: Expression, bloomBits: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  // case-class equality on Array[Byte] is reference identity, which
  // would defeat Catalyst semantic equality (CSE, ReuseExchange) for
  // bit-identical probes built separately — compare sketch CONTENT
  override def equals(other: Any): Boolean = other match {
    case BloomMightContainKey(c, bits) =>
      c == child && java.util.Arrays.equals(bits, bloomBits)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBits)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom key must be integral, got $other")
    }

  // one deserialization per executor/task that references the expr;
  // the probe itself is lock-free reads of the bit array
  @transient private lazy val bloom: BloomFilter =
    BloomExprs.deserialize(bloomBits)

  override def nullSafeEval(k: Any): Any = {
    val key = child.dataType match {
      case LongType => k.asInstanceOf[Long]
      case _        => k.asInstanceOf[Int].toLong
    }
    bloom.mightContainLong(key)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, k =>
      s"${ev.value} = $bf.mightContainLong((long) $k);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainKey =
    copy(child = c)
}
