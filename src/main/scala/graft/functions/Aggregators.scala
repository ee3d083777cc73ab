package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregates (SURVEY §2.10: the engine's custom logic
  * rides `Aggregator[IN, BUF, OUT]`, not Python UDFs).
  */
object Aggregators {
  /** MinHash signatures are unionable: the signature of a document-set
    * union is the elementwise min of the members' signatures. Lets a
    * dedup pipeline keep ONE sketch per near-dup cluster (compare new
    * documents against clusters, not members) — buffer is a fixed-size
    * long array, merge is associative and commutative, so map-side
    * partial aggregation applies. */
  class MinHashUnion(numHashes: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)
    override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
      // a wrong-length signature must fail loudly: silently skipping the
      // tail would leave Long.MaxValue sentinels in the sketch, which
      // then spuriously "match" other truncated sketches downstream
      require(sig.length == numHashes,
        s"signature length ${sig.length} != numHashes $numHashes")
      var i = 0
      while (i < numHashes) {
        if (sig(i) < buf(i)) buf(i) = sig(i)
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column-API form: `df.groupBy(...).agg(minhashUnion(col("sig")))`. */
  /** Merge of serialized Count-Min sketches (the binary column Spark's
    * `count_min_sketch` aggregate emits): CMS counters are additive,
    * so merging per-segment sketches equals sketching the concatenated
    * data — the re-aggregatable-frequency twin of q83's HLL union,
    * which Spark exposes no SQL merge function for. Buffer is the
    * serialized form (empty = identity); segment-level inputs are few
    * per group (days, shards), so the per-row deserialize cost is
    * bounded by group fan-in, never data volume. */
  object CmsMerge extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def toBytes(c: org.apache.spark.util.sketch.CountMinSketch): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      c.writeTo(bos)
      bos.toByteArray
    }
    private def read(b: Array[Byte]): org.apache.spark.util.sketch.CountMinSketch =
      org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(b))
    private def combine(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val ca = read(a)
        ca.mergeInPlace(read(b))
        toBytes(ca)
      }
    override def zero: Array[Byte] = Array.empty
    override def reduce(buf: Array[Byte], row: Array[Byte]): Array[Byte] =
      combine(buf, row)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      combine(a, b)
    override def finish(buf: Array[Byte]): Array[Byte] = buf
    override def bufferEncoder: Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  def cmsMerge: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(CmsMerge)

  /** Point-estimate from a serialized CMS (driver- or executor-side). */
  def cmsEstimate(sketch: Array[Byte], item: Long): Long =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketch)).estimateCount(item)

  def minhashUnion(numHashes: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MinHashUnion(numHashes),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
}
