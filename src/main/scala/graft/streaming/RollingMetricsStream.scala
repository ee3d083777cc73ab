package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.Schemas.Bar
import graft.operators.Metrics

/** TRUE streaming rolling metrics: the 5-bar VWAP/volatility frame is
  * kept in keyed state, so it spans micro-batches. The per-micro-batch
  * window in [[MinuteStream.metricsOnBars]] only sees bars that arrived
  * in the same batch — the reference worked around exactly this by
  * re-reading its last 10 bars from the sink every minute
  * (/root/reference/spark/jobs/stock_stream.py:39-58, SURVEY §7 risk
  * 3). Keeping the bounded frame in state is the streaming-native fix:
  * no sink round-trip, O(lookback) state per key, same math as
  * [[graft.operators.Metrics.rolling]] (exact-decimal frame sums, 6dp
  * vol rounding). The retained buffer is kept in EVENT-TIME order (a
  * late bar is inserted at its timestamp position, not appended), so a
  * late bar's frame is the bars at-or-before it — the same frame the
  * batch window computes — as long as those bars are still within the
  * Lookback-sized buffer. Remaining divergences vs batch, both
  * inherent to bounded-state append-mode streaming: (1) an all-zero-
  * volume frame yields NaN vwap here vs NULL in batch (both suppress
  * the flag); (2) rows already emitted are not retro-emitted when a
  * late bar would have entered their frame.
  */
object RollingMetricsStream {
  val Lookback = 5 // frame size, matching rowsBetween(-4, 0)

  case class RollState(bars: List[(Long, Double, Double)]) // (epochMs, close, volume)
  case class MetricRow(symbol: String, timestamp: java.sql.Timestamp,
                       close: Double, vwap_5: Double, vol_5: Option[Double],
                       is_anomaly: Boolean)

  private[streaming] def metricsFor(frame: List[(Long, Double, Double)],
                                    threshold: Double): MetricRow = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    // Mirror Metrics.rolling's exact-decimal frame sums (cast to
    // DECIMAL(18,4) before summing) and its 6dp vol rounding, so the
    // streaming path and the per-batch window path agree on borderline
    // anomaly flags instead of diverging in the last ulps.
    def d4(x: Double) = JBD.valueOf(x).setScale(4, RoundingMode.HALF_UP)
    val closes = frame.map(_._2)
    val num = frame.map(b => d4(b._2 * b._3)).reduce(_ add _)
    val den = frame.map(b => d4(b._3)).reduce(_ add _)
    val vwap =
      if (den.signum == 0) Double.NaN else num.doubleValue / den.doubleValue
    val vol = if (frame.size > 1) {
      val m = closes.sum / closes.size
      val sd = math.sqrt(closes.map(c => (c - m) * (c - m)).sum / (closes.size - 1))
      Some(JBD.valueOf(sd).setScale(6, RoundingMode.HALF_UP).doubleValue)
    } else None
    val cur = frame.last
    MetricRow("", new java.sql.Timestamp(cur._1), cur._2, vwap, vol,
      vol.exists(v => math.abs(cur._2 - vwap) > threshold * v))
  }

  def update(threshold: Double)(symbol: String, in: Iterator[Bar],
             state: GroupState[RollState]): Iterator[MetricRow] = {
    var buf = state.getOption.map(_.bars).getOrElse(Nil)
    val out = in.toSeq.sortBy(_.timestamp.getTime).map { b =>
      val bar = (b.timestamp.getTime, b.close, b.volume)
      // frame = bars at-or-before this bar (event time), this bar last —
      // matches the batch window's ROWS BETWEEN 4 PRECEDING AND CURRENT
      // even when `b` is late relative to already-buffered bars
      val frame = buf.filter(_._1 < bar._1).takeRight(Lookback - 1) :+ bar
      buf = (buf :+ bar).sortBy(_._1).takeRight(Lookback)
      metricsFor(frame, threshold).copy(symbol = symbol)
    }
    if (out.nonEmpty) state.update(RollState(buf))
    out.iterator
  }

  /** Streaming: one metric row per bar, frames spanning micro-batches. */
  def metrics(bars: Dataset[Bar],
              threshold: Double = Metrics.AnomalyThreshold): Dataset[MetricRow] = {
    import bars.sparkSession.implicits._
    bars.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        update(threshold))
  }
}
