package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.Schemas.Bar

/** Custom keyed state over a stream (SURVEY §2 T6 — the reference has
  * none beyond window-agg state; a real market pipeline wants running
  * per-symbol statistics that survive across micro-batches).
  *
  * `flatMapGroupsWithState` keeps one small fixed-size state record per
  * key: running trade count, cumulative volume, cumulative VWAP
  * numerator, and last close — O(keys) state, independent of stream
  * length, watermark-safe. At cluster scale state is hash-partitioned
  * by key in the state store; a hot symbol costs one partition, not a
  * shuffle storm.
  */
object StatefulMetrics {
  case class SymbolState(nBars: Long, cumVolume: Double,
                         cumPV: Double, lastClose: Double)
  case class SymbolStats(symbol: String, n_bars: Long, cum_volume: Double,
                         cum_vwap: Double, last_close: Double)

  def update(symbol: String, bars: Iterator[Bar],
             state: GroupState[SymbolState]): Iterator[SymbolStats] = {
    var s = state.getOption.getOrElse(SymbolState(0L, 0.0, 0.0, 0.0))
    // fold this batch's bars in event-time order for a deterministic
    // lastClose (iterator order within a group is not guaranteed)
    val sorted = bars.toSeq.sortBy(_.timestamp.getTime)
    sorted.foreach { b =>
      s = SymbolState(s.nBars + 1, s.cumVolume + b.volume,
        s.cumPV + b.close * b.volume, b.close)
    }
    if (sorted.isEmpty) Iterator.empty
    else {
      state.update(s)
      Iterator(SymbolStats(symbol, s.nBars, s.cumVolume,
        if (s.cumVolume > 0) s.cumPV / s.cumVolume else 0.0, s.lastClose))
    }
  }

  /** Streaming: one updated stats row per symbol per micro-batch. */
  def runningStats(bars: Dataset[Bar]): Dataset[SymbolStats] = {
    import bars.sparkSession.implicits._
    bars.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  // ------------------------------------------------------------------
  // Idle-session finalization: the timeout-and-evict stateful pattern.

  case class SessionState(nBars: Long, volume: Double,
                          firstMs: Long, lastMs: Long)
  case class ClosedSession(symbol: String, n_bars: Long, volume: Double,
                           first_ms: Long, last_ms: Long)

  /** Per-key sessions that EMIT only when the key goes idle — the
    * state-eviction half of stateful processing [[runningStats]] never
    * exercises. EventTimeTimeout against the stream's watermark: each
    * batch folds the key's bars and re-arms the timeout at
    * last-seen + gap; when the watermark passes that point Spark calls
    * the function once more with `hasTimedOut`, the closed session is
    * emitted, and `state.remove()` frees the slot. State is therefore
    * bounded by ACTIVE keys only — on a 100 TB stream with churning
    * keys this eviction is the difference between O(active) and
    * O(ever-seen) state-store size. */
  def sessionUpdate(gapMs: Long)(symbol: String, bars: Iterator[Bar],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(ClosedSession(symbol, s.nBars, s.volume, s.firstMs, s.lastMs))
    } else {
      var s = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MaxValue, 0L))
      bars.foreach { b =>
        val t = b.timestamp.getTime
        s = SessionState(s.nBars + 1, s.volume + b.volume,
          math.min(s.firstMs, t), math.max(s.lastMs, t))
      }
      state.update(s)
      state.setTimeoutTimestamp(s.lastMs + gapMs)
      Iterator.empty
    }
  }

  /** Streaming idle-session stream: requires an upstream watermark on
    * `timestamp` (the timeout clock). One closed-session row per
    * (key, idle period). */
  def idleSessions(bars: Dataset[Bar], gapMs: Long,
                   watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    import bars.sparkSession.implicits._
    bars.withWatermark("timestamp", watermarkDelay)
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(sessionUpdate(gapMs))
  }
}
