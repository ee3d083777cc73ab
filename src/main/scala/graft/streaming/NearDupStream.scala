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
  * In particular a near-dup arriving AFTER its twin's bucket state
  * TTL'd out is falsely admitted, and that is HEALED at the next
  * batch cluster fold: [[graft.operators.Dedup
  * .appendClusterAssignments]] re-derives candidates from the
  * persisted key family (which never expires) and re-verifies them
  * exactly, so the missed pair lands as one cluster and downstream
  * dedup/canonical selection treats the false admit as the duplicate
  * it is (pinned by StreamTtlHealSpec).
  *
  * Requires the RocksDB state store ([[TtlState.RocksDbProvider]])
  * like every transformWithState operator.
  */
object NearDupStream {
  /** Doc + blocking key + signature, the processor's wire type. */
  case class Keyed(bucket: Long, doc_id: Long, text: String,
                   ts: java.sql.Timestamp, sig: Seq[Long])

  /** Multi-band wire type: one row per (doc, band) probe. `uid` hashes
    * the full input row (doc_id, ts, text) so the per-doc reduction
    * groups each arriving ROW's probes — keying on doc_id alone would
    * mix the verdicts of same-batch rows sharing an id. */
  case class BandRow(bucket: Long, band: Int, uid: Long, doc_id: Long,
                     text: String, ts: java.sql.Timestamp, sig: Seq[Long])

  /** Per-band verdict row feeding the any-band reduction: `band`
    * rides so the reducer can attribute verdicts per band — the
    * admit rule needs "does band b verify against PRIOR state",
    * which only the per-band flag pattern reveals. */
  case class FlagRow(uid: Long, band: Int, doc_id: Long, text: String,
                     ts: java.sql.Timestamp, dup: Boolean)

  /** One admitted signature in bucket state (product-encoded — no
    * kryo in the state store). */
  case class StoredSig(h: Seq[Long])

  /** Bucket-verify core shared by the single-band and banded
    * processors: full-signature agreement fraction >= threshold
    * against any stored signature of the same length (length
    * mismatches — a numHashes change across restart — are
    * incomparable and skipped; TTL ages them out). */
  private def matchesStored(stored: scala.collection.Seq[Array[Long]],
                            sig: Array[Long], threshold: Double): Boolean = {
    val n = sig.length
    stored.exists { s =>
      s.length == n && {
        var m = 0
        var i = 0
        while (i < n) { if (s(i) == sig(i)) m += 1; i += 1 }
        m.toDouble / n >= threshold
      }
    }
  }

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
        val dup = matchesStored(stored, sig, threshold)
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

  /** The banded twin of [[NearDupProcessor]]: same bucket state and
    * verify, but EMITS every probe with its verdict instead of
    * filtering — the per-doc any-band decision happens downstream in
    * [[AnyBandReducer]]. A locally-clean probe stores its signature
    * even if another band of the same doc flags it (no cross-key
    * channel exists to veto the store) — so bands>1 state holds
    * signatures of documents SEEN within the TTL, not only admitted
    * ones; the observable effect is transitive suppression (C near
    * suppressed-B near admitted-A gets suppressed via B), the usual
    * chain semantics of streaming dedup. */
  class BandFlagProcessor(ttl: Duration, threshold: Double, maxPerBucket: Int)
      extends StatefulProcessor[Long, BandRow, FlagRow] {
    @transient private var sigs: ListState[StoredSig] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sigs = getHandle.getListState[StoredSig]("sigs",
        Encoders.product[StoredSig], TTLConfig(ttl))

    override def handleInputRows(key: Long, rows: Iterator[BandRow],
                                 timerValues: TimerValues): Iterator[FlagRow] = {
      val stored = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
      sigs.get().foreach(s => stored += s.h.toArray)
      val out = scala.collection.mutable.ArrayBuffer.empty[FlagRow]
      rows.foreach { r =>
        val sig = r.sig.toArray
        val dup = matchesStored(stored, sig, threshold)
        if (!dup && stored.size < maxPerBucket) {
          stored += sig
          sigs.appendValue(StoredSig(r.sig))
        }
        out += FlagRow(r.uid, r.band, r.doc_id, r.text, r.ts, dup)
      }
      out.iterator
    }
  }

  /** Stateless per-row reduction: a row's `bands` probe verdicts all
    * arrive in the SAME micro-batch (the explode is batch-local), so
    * the group iterator holds every band flag and the admit decision
    * needs no persisted state. A uid group holds k byte-identical
    * copies × `bands` flags; per BAND the pattern is deterministic —
    * all-dup ⇔ the band verifies against PRIOR state (a pre-existing
    * near-dup), while ≥1 clean flag means the band's only matches are
    * the group's own just-stored first copy (or the cap blocked every
    * store and all k stay clean). The any-band suppression rule is
    * therefore: admit ONE row iff EVERY band has a clean witness. A
    * cross-copy clean COUNT would be wrong — two partially-dup copies
    * can jointly reach `bands` clean flags (dup in band 0, cap-
    * saturated clean band 1, posted twice) without any copy being
    * clean in every band. */
  class AnyBandReducer(bands: Int)
      extends StatefulProcessor[Long, FlagRow, FlagRow] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(key: Long, rows: Iterator[FlagRow],
                                 timerValues: TimerValues): Iterator[FlagRow] = {
      val rs = rows.toSeq
      val byBand = rs.groupBy(_.band)
      val admit = byBand.size == bands &&
        byBand.valuesIterator.forall(_.exists(f => !f.dup))
      if (admit) rs.iterator.take(1) else Iterator.empty
    }
  }

  /** Admit only documents that are NOT near-duplicates (estimated
    * Jaccard >= `threshold`) of anything admitted in the last `ttl`
    * of processing time. Input needs (doc_id, text, ts); output is
    * the admitted subset with the same three columns.
    *
    * `bands` picks the blocking recall/state tradeoff:
    *  - 1 (default): one probe per doc on its first minhash — a
    *    j-similar pair shares the bucket with probability exactly j;
    *    one state entry per admitted doc.
    *  - b > 1: the doc probes b buckets (band i keys on minhash i),
    *    and is suppressed if ANY band's bucket verifies — blocking
    *    recall rises to 1 − (1−j)^b, the lift that matters in the
    *    j ≈ threshold regime (j=0.5: 0.5 → 0.996 at b=8). Cost: b×
    *    the state (each seen doc stores in up to b buckets), b× the
    *    routing rows, and chain semantics ("seen", not "admitted" —
    *    see [[BandFlagProcessor]]). Suppression stays probabilistic
    *    either way; the batch d03/d07 sweep over landed data remains
    *    authoritative. */
  def suppress(docs: DataFrame, ttl: Duration, threshold: Double = 0.7,
               shingleN: Int = 3, numHashes: Int = 32,
               maxPerBucket: Int = 64, bands: Int = 1): DataFrame = {
    require(bands >= 1 && bands <= numHashes,
      s"bands ($bands) must be in [1, numHashes=$numHashes] — each band " +
        "keys on one distinct minhash component")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs
      // malformed wire docs (null id/text/ts from from_json) would put
      // a null into Keyed's primitive bucket field and kill the query;
      // an un-fingerprintable doc can't be deduped, so it is dropped
      // here like the corpus gate drops it
      .filter(col("doc_id").isNotNull && col("text").isNotNull &&
        col("ts").isNotNull)
      .select(col("doc_id"), col("text"), col("ts"),
        graft.plans.TextHash.minhashSig(
          TextOps.tokens(col("text")), shingleN, numHashes).as("sig"))
    if (bands == 1) {
      val keyed: Dataset[Keyed] = base
        .withColumn("bucket", element_at(col("sig"), 1))
        .as[Keyed]
      keyed.groupByKey(_.bucket)(Encoders.scalaLong)
        .transformWithState(
          new NearDupProcessor(ttl, threshold, maxPerBucket),
          TimeMode.ProcessingTime(), OutputMode.Append())
        .select("doc_id", "text", "ts")
    } else {
      // explode to one probe row per band; the bucket key mixes the
      // band index in so band i's keyspace never collides with band
      // j's (same state store holds all bands). uid hashes the whole
      // input row (monotonically_increasing_id is unsupported on
      // streams) so the reducer groups per arriving ROW, not per id
      val banded: Dataset[BandRow] = base
        .withColumn("uid", xxhash64(col("doc_id"), col("ts"), col("text")))
        .select(col("uid"), col("doc_id"), col("text"), col("ts"), col("sig"),
          posexplode(slice(col("sig"), 1, bands)).as(Seq("band", "bv")))
        .withColumn("bucket", xxhash64(col("band"), col("bv")))
        .select("bucket", "band", "uid", "doc_id", "text", "ts", "sig")
        .as[BandRow]
      banded.groupByKey(_.bucket)(Encoders.scalaLong)
        .transformWithState(
          new BandFlagProcessor(ttl, threshold, maxPerBucket),
          TimeMode.ProcessingTime(), OutputMode.Append())
        .groupByKey(_.uid)(Encoders.scalaLong)
        .transformWithState(new AnyBandReducer(bands),
          TimeMode.ProcessingTime(), OutputMode.Append())
        .select("doc_id", "text", "ts")
    }
  }
}
