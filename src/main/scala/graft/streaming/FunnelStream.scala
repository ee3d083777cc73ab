package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming conversion funnel — the online twin of the batch
  * `Relational.funnelTimes` (q75): per user, track the furthest stage
  * reached and emit one advance row each time a later stage is
  * completed strictly after the previous one in EVENT time.
  *
  * Semantics vs batch: within a micro-batch rows are processed in
  * event-time order (the batch's rows are sorted per key before the
  * state walk), so replaying a bounded log through the stream yields
  * exactly the batch result when arrival respects batch boundaries. A
  * late event whose stage has already been passed is ignored — the
  * standard monotone online-funnel semantics; the batch operator over
  * the full log is the exact-replay oracle for offline reconciliation.
  *
  * 100 TB / unbounded shape: state per user is ONE (int, long) cell —
  * stage index + last stage-completion time in epoch-µs — in the
  * RocksDB store, independent of event volume; no per-event state
  * growth, no window buffer. Output is advance-only (≤ #stages rows
  * per user ever), so the sink load is conversion-bound, not
  * traffic-bound. Requires the RocksDB state-store provider
  * ([[TtlState.RocksDbProvider]]), like every transformWithState
  * operator here.
  */
object FunnelStream {
  case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
                         event_type: String)
  case class StageAdvance(user_id: Long, stage: String, stage_idx: Int,
                          ts: java.sql.Timestamp)

  /** stages: ordered (stageName, eventType) pairs. */
  class FunnelProcessor(stages: Seq[(String, String)])
      extends StatefulProcessor[Long, FunnelEvent, StageAdvance] {
    // (next stage to complete, completion time of the previous stage, µs)
    @transient private var st: ValueState[(Int, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Int, Long)]("funnel",
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
                                 timerValues: TimerValues): Iterator[StageAdvance] = {
      var (idx, lastUs) =
        if (st.exists()) st.get() else (0, Long.MinValue)
      val out = scala.collection.mutable.ArrayBuffer.empty[StageAdvance]
      // event-time order inside the batch: a batch delivering
      // signup+purchase together must advance both stages regardless of
      // arrival interleaving
      val sorted = rows.toArray.sortBy(e => tsUs(e.ts))
      var i = 0
      while (i < sorted.length) {
        val e = sorted(i)
        if (idx < stages.length && e.event_type == stages(idx)._2 &&
            tsUs(e.ts) > lastUs) {
          out += StageAdvance(key, stages(idx)._1, idx, e.ts)
          lastUs = tsUs(e.ts)
          idx += 1
        }
        i += 1
      }
      if (out.nonEmpty) st.update((idx, lastUs))
      out.iterator
    }

    private def tsUs(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
  }

  /** Keyed funnel over a stream of [[FunnelEvent]]s. Append-mode:
    * each emitted row is a completed stage advance. */
  def advances(ds: Dataset[FunnelEvent], stages: Seq[(String, String)])
              : Dataset[StageAdvance] = {
    implicit val enc = Encoders.product[StageAdvance]
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new FunnelProcessor(stages),
        TimeMode.None(), OutputMode.Append())
  }
}
