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
  def minhashUnion(numHashes: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MinHashUnion(numHashes),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
}
