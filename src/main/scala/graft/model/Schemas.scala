package graft.model

import org.apache.spark.sql.types._

/** Wire/table schemas from the reference's data model (SURVEY.md §1) —
  * declared explicitly at the edge, exactly as the reference does with
  * hand-written StructTypes (/root/reference/spark/jobs/stock_batch.py:16-24,
  * stock_stream.py:22-27,132-134). Nothing is schema-inferred.
  */
object Schemas {
  /** Raw Finnhub-style trade: price, symbol, epoch-ms time, volume
    * (stock_stream.py:22-27). */
  val trade: StructType = StructType(Seq(
    StructField("p", DoubleType, nullable = false),
    StructField("s", StringType, nullable = false),
    StructField("t", DoubleType, nullable = false), // epoch millis
    StructField("v", DoubleType, nullable = false)))

  /** Stream envelope: `{"data": [trade, ...]}` (stock_stream.py:132-134). */
  val tradeEnvelope: StructType =
    StructType(Seq(StructField("data", ArrayType(trade), nullable = true)))

  /** OHLCV bar (stock_batch.py:16-24). */
  val bar: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("open", DoubleType), StructField("high", DoubleType),
    StructField("low", DoubleType), StructField("close", DoubleType),
    StructField("volume", DoubleType),
    StructField("timestamp", TimestampType, nullable = false)))

  /** Company dimension (stock_batch.py:27-32). */
  val company: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("name", StringType), StructField("sector", StringType),
    StructField("industry", StringType)))

  /** Consolidated metric row — ONE schema, fixing the reference's
    * DDL/job mismatch (SURVEY §1 "bugs not to replicate" (a)). */
  val metric: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("close", DoubleType),
    StructField("vwap_5", DoubleType), StructField("vol_5", DoubleType),
    StructField("is_anomaly", BooleanType)))

  /** Corpus document row (mirrors the testdata `documents` table; the
    * interchange shape of the dedup/ingest modes). All fields nullable:
    * from_json forces its output nullable regardless of declarations,
    * and PERMISSIVE corrupt lines DO produce null doc_id/text — callers
    * must gate on non-null themselves (EdgeRunner's dedup mode does). */
  val document: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  case class Trade(symbol: String, price: Double, volume: Double,
                   timestamp: java.sql.Timestamp)
  case class Bar(symbol: String, open: Double, high: Double, low: Double,
                 close: Double, volume: Double,
                 timestamp: java.sql.Timestamp)
}
