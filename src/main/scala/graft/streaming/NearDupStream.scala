package graft.streaming

import java.time.Duration
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._
import graft.functions.TextOps

/** Streaming NEAR-duplicate suppression — the in-flight companion of
  * the batch MinHash jobs (d03/d07): drop arriving documents that are
  * near-duplicates of something admitted recently, before they land.
  *
  * Design (one stateful operator, theory-grounded recall):
  *   - Blocking key = the document's FIRST minhash value. Two docs
  *     collide on it with probability exactly equal to their Jaccard
  *     similarity (the defining property of a minwise hash), so a
  *     j=0.9 near-dup is routed to the same state bucket 90% of the
  *     time — no explosion of the doc into b band rows, no second
  *     stateful operator to AND the per-band verdicts back together.
  *   - Verification = full-signature comparison inside the bucket:
  *     estimated Jaccard is the fraction of agreeing minhashes over
  *     all `numHashes`; suppress at >= `threshold`. Blocking decides
  *     RECALL only — precision comes from this estimate, so false
  *     bucket collisions cost a comparison, never a wrong drop beyond
  *     the estimator's variance (sd ~ sqrt(j(1-j)/numHashes), ~0.09
  *     at j=0.5 with 32 hashes).
  *   - State = per-bucket list of admitted signatures with a
  *     PROCESSING-time TTL (RocksDB native TTL, the TtlState
  *     discipline) and a hard `maxPerBucket` cap, so a hot bucket is
  *     bounded by cap x signature size, not by traffic.
  *
  * What this is NOT: an exact cross-corpus near-dup pass. Suppression
  * is probabilistic in recall (misses a j-similar pair with
  * probability 1-j at the blocking step) and scoped to the TTL
  * horizon; the authoritative sweep stays the batch d03/d07 jobs over
  * landed data. The stream's job is to keep re-posts and near-verbatim
  * mirrors from dominating the landing zone — the same division of
  * labor as CorpusStream's exact-fingerprint dedup, one rung fuzzier.
  *
  * Requires the RocksDB state store ([[TtlState.RocksDbProvider]])
  * like every transformWithState operator.
  */
object NearDupStream {
  /** Doc + blocking key + signature, the processor's wire type. */
  case class Keyed(bucket: Long, doc_id: Long, text: String,
                   ts: java.sql.Timestamp, sig: Seq[Long])

  /** One admitted signature in bucket state (product-encoded — no
    * kryo in the state store). */
  case class StoredSig(h: Seq[Long])

  class NearDupProcessor(ttl: Duration, threshold: Double, maxPerBucket: Int)
      extends StatefulProcessor[Long, Keyed, Keyed] {
    @transient private var sigs: ListState[StoredSig] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sigs = getHandle.getListState[StoredSig]("sigs",
        Encoders.product[StoredSig], TTLConfig(ttl))

    override def handleInputRows(key: Long, rows: Iterator[Keyed],
                                 timerValues: TimerValues): Iterator[Keyed] = {
      // bounded by maxPerBucket, so the copy is small and in-batch
      // arrivals compare against earlier rows of the SAME batch too
      // length-mismatched state (a numHashes change across a
      // checkpoint restart) is incomparable: comparing a prefix would
      // skew the estimate and indexing past it would kill the query —
      // ignore those entries and let TTL age them out
      val stored = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
      sigs.get().foreach(s => stored += s.h.toArray)
      val out = scala.collection.mutable.ArrayBuffer.empty[Keyed]
      rows.foreach { r =>
        val sig = r.sig.toArray
        val n = sig.length
        val dup = stored.exists { s =>
          s.length == n && {
            var m = 0
            var i = 0
            while (i < n) { if (s(i) == sig(i)) m += 1; i += 1 }
            m.toDouble / n >= threshold
          }
        }
        if (!dup) {
          out += r
          if (stored.size < maxPerBucket) {
            stored += sig
            sigs.appendValue(StoredSig(r.sig))
          }
        }
      }
      out.iterator
    }
  }

  /** Admit only documents that are NOT near-duplicates (estimated
    * Jaccard >= `threshold`) of anything admitted in the last `ttl`
    * of processing time. Input needs (doc_id, text, ts); output is
    * the admitted subset with the same three columns. */
  def suppress(docs: DataFrame, ttl: Duration, threshold: Double = 0.7,
               shingleN: Int = 3, numHashes: Int = 32,
               maxPerBucket: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed: Dataset[Keyed] = docs
      // malformed wire docs (null id/text/ts from from_json) would put
      // a null into Keyed's primitive bucket field and kill the query;
      // an un-fingerprintable doc can't be deduped, so it is dropped
      // here like the corpus gate drops it
      .filter(col("doc_id").isNotNull && col("text").isNotNull &&
        col("ts").isNotNull)
      .select(col("doc_id"), col("text"), col("ts"),
        graft.plans.TextHash.minhashSig(
          TextOps.tokens(col("text")), shingleN, numHashes).as("sig"))
      .withColumn("bucket", element_at(col("sig"), 1))
      .as[Keyed]
    keyed.groupByKey(_.bucket)(Encoders.scalaLong)
      .transformWithState(
        new NearDupProcessor(ttl, threshold, maxPerBucket),
        TimeMode.ProcessingTime(), OutputMode.Append())
      .select("doc_id", "text", "ts")
  }
}
