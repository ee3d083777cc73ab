package graft.streaming

import java.time.Duration
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Operators on the Spark 4 arbitrary-state API (`transformWithState` +
  * `StatefulProcessor`) — the successor to `flatMapGroupsWithState`
  * with typed state cells, native TTL, and timers, backed by the
  * RocksDB state store.
  *
  * TTL-vs-watermark: `dropDuplicatesWithinWatermark` (CorpusStream T5)
  * bounds dedup state by EVENT-time progress, which stalls if the
  * source stalls; a TTL cell expires on PROCESSING time, so state is
  * bounded by wall-clock churn even on an idle or badly-skewed source.
  * A 100 TB ingest wants both: watermark dedup for correctness under
  * event-time replay, TTL dedup for landing-zone re-posts where "seen
  * in the last N minutes" IS the semantics.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass` =
  * RocksDBStateStoreProvider (transformWithState does not run on the
  * default HDFS-backed store).
  *
  * Operational note: in ProcessingTime mode the query schedules
  * housekeeping micro-batches CONTINUOUSLY to advance the TTL clock
  * even when no data arrives, so `processAllAvailable()` never
  * quiesces — drive tests (and ops runbooks) off the sink/progress,
  * not off quiescence.
  */
object TtlState {
  /** One RocksDB provider string, spelled once. */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** First-arrival-wins keyed dedup whose per-key state cell expires
    * after `ttl` of processing time. Emits the first row of a key's
    * first batch; suppresses everything else until the cell expires. */
  class FirstSeenProcessor[I](ttl: Duration)
      extends StatefulProcessor[String, I, I] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[I],
                                 timerValues: TimerValues): Iterator[I] =
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        if (rows.hasNext) Iterator.single(rows.next()) else Iterator.empty
      }
  }

  /** TTL-bounded keyed dedup of a stream: one output row per distinct
    * `key(...)` per TTL window, state evicted by RocksDB TTL — no
    * watermark required. */
  def dedupByKeyTtl[I: Encoder](ds: Dataset[I], key: I => String,
                                ttl: Duration): Dataset[I] =
    ds.groupByKey(key)(Encoders.STRING)
      .transformWithState(new FirstSeenProcessor[I](ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
}
