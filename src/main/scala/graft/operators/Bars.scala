package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exact

/** OHLCV bar aggregation — the reference's core streaming computation
  * (A1/A2, /root/reference/spark/jobs/stock_stream.py:146-166) rebuilt
  * deterministically.
  *
  * The reference uses `first(price)/last(price)` for open/close, which in
  * Spark are arrival-order-dependent (SURVEY.md §7 risk 1). We pin
  * deterministic semantics: open/close = price at the min/max
  * (event time, price) tuple — the price tiebreak makes two trades in
  * the same instant resolve identically on every engine and run, and
  * matches the streaming path (MinuteStream.minuteBars) exactly.
  *
  * Scale: a single hash aggregation on (key, window) with map-side partial
  * aggregation; no sort, no extra shuffle. The same expression tree runs
  * over a stream (`groupBy(window(...))` + watermark — see
  * graft.streaming.MinuteStream).
  */
object Bars {
  /** Tumbling-window OHLCV bars keyed by `key`. Output columns:
    * key, bucket_start, open, high, low, close, volume, n_trades. */
  def ohlcv(df: DataFrame, key: Column, ts: Column, price: Column,
            volume: Column, bucket: String = "1 minute"): DataFrame = {
    df.groupBy(key.as("key"), window(ts, bucket).as("w"))
      .agg(
        min_by(price, struct(ts, price)).as("open"),
        max(price).as("high"),
        min(price).as("low"),
        max_by(price, struct(ts, price)).as("close"),
        Exact.dsum(volume).as("volume"),
        count(lit(1)).as("n_trades"))
      .withColumn("bucket_start", col("w.start"))
      .drop("w")
  }
}
