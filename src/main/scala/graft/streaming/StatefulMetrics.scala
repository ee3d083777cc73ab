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
}
