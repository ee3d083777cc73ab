package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream equi-join with watermarks and a time-bound condition —
  * the state-bounded two-stream pattern (trades enriched with the
  * quote emitted within the preceding minute). Neither stream's state
  * grows unboundedly: the watermark + time bound lets Spark evict. */
class StreamStreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  case class Trade(symbol: String, t: Timestamp, price: Double)
  case class Quote(symbol: String, qt: Timestamp, bid: Double)

  test("watermarked stream-stream join matches trades to in-window quotes") {
    implicit val sqlCtx = spark.sqlContext
    val trades = MemoryStream[Trade]
    val quotes = MemoryStream[Quote]
    val t = trades.toDF().withColumnRenamed("symbol", "t_sym")
      .withWatermark("t", "1 minute")
    val q = quotes.toDF().withColumnRenamed("symbol", "q_sym")
      .withWatermark("qt", "1 minute")
    val joined = t.join(q,
      expr("t_sym = q_sym AND qt BETWEEN t - INTERVAL 1 MINUTE AND t"), "inner")
    val query = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_test").start()
    val m0 = 1735732800000L
    quotes.addData(Quote("A", new Timestamp(m0), 99.0))          // in window
    quotes.addData(Quote("A", new Timestamp(m0 - 120000), 98.0)) // too old
    quotes.addData(Quote("B", new Timestamp(m0), 50.0))          // other symbol
    trades.addData(Trade("A", new Timestamp(m0 + 30000), 100.0))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("ssj_test")
      .select("t_sym", "price", "bid").as[(String, Double, Double)].collect()
    assert(rows.toSeq == Seq(("A", 100.0, 99.0)))
  }

  test("left-outer stream-stream join emits the null row only after watermark expiry") {
    implicit val sqlCtx = spark.sqlContext
    val trades = MemoryStream[Trade]
    val quotes = MemoryStream[Quote]
    val t = trades.toDF().withColumnRenamed("symbol", "t_sym")
      .withWatermark("t", "10 seconds")
    val q = quotes.toDF().withColumnRenamed("symbol", "q_sym")
      .withWatermark("qt", "10 seconds")
    val joined = t.join(q,
      expr("t_sym = q_sym AND qt BETWEEN t - INTERVAL 1 MINUTE AND t"),
      "left_outer")
    val query = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer_test").start()
    val m0 = 1735732800000L
    quotes.addData(Quote("A", new Timestamp(m0), 99.0))
    trades.addData(Trade("A", new Timestamp(m0 + 30000), 100.0)) // matches
    trades.addData(Trade("C", new Timestamp(m0 + 30000), 70.0))  // never matches
    query.processAllAvailable()
    // C's null row may NOT appear yet: its join window is still open
    val early = spark.table("ssj_outer_test")
      .select("t_sym").as[String].collect().toSet
    assert(!early.contains("C") || early == Set("A", "C"))
    // advance BOTH watermarks far past C's window end
    quotes.addData(Quote("Z", new Timestamp(m0 + 600000), 1.0))
    trades.addData(Trade("Z2", new Timestamp(m0 + 600000), 1.0))
    query.processAllAvailable()
    // one more cycle so the no-data batch after the watermark bump
    // flushes expired outer state
    trades.addData(Trade("Z3", new Timestamp(m0 + 660000), 1.0))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("ssj_outer_test")
      .select("t_sym", "price", "bid").as[(String, Double, Option[Double])]
      .collect().filter(r => r._1 == "A" || r._1 == "C").sortBy(_._1)
    // matched row carries the quote; unmatched C surfaced exactly once
    // with a NULL quote side after its window expired
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq(("A", 100.0, Some(99.0)), ("C", 70.0, None)), s"got ${rows.toSeq}")
  }

  test("streaming latest-per-key join emits ONE row per trade and evicts state") {
    // The reference's J1 (latest quote per trade) as a STREAM-STREAM
    // shape: interval join for candidates, then a second stateful
    // operator — max_by over the joined rows, grouped on the
    // watermarked trade event time so append mode can finalize each
    // trade's group and evict its state once the watermark passes.
    implicit val sqlCtx = spark.sqlContext
    val trades = MemoryStream[Trade]
    val quotes = MemoryStream[Quote]
    val t = trades.toDF().withColumnRenamed("symbol", "t_sym")
      .withWatermark("t", "1 minute")
    val q = quotes.toDF().withColumnRenamed("symbol", "q_sym")
      .withWatermark("qt", "1 minute")
    val joined = t.join(q,
      expr("t_sym = q_sym AND qt BETWEEN t - INTERVAL 1 MINUTE AND t"), "inner")
    val latest = joined.groupBy(col("t_sym"), col("t"), col("price"))
      .agg(max_by(col("bid"), col("qt")).as("bid"))
    val query = latest.writeStream.outputMode("append")
      .format("memory").queryName("ssj_asof").start()
    val m0 = 1735732800000L
    quotes.addData(
      Quote("A", new Timestamp(m0), 99.0),           // in window
      Quote("A", new Timestamp(m0 + 10000), 99.5),   // in window, LATEST
      Quote("A", new Timestamp(m0 - 120000), 98.0),  // too old
      Quote("B", new Timestamp(m0), 50.0))           // other symbol
    trades.addData(Trade("A", new Timestamp(m0 + 30000), 100.0))
    query.processAllAvailable()
    // advance both watermarks past the first horizon (finalizes A's
    // group), then far again so state REMOVAL is observable in metrics
    quotes.addData(Quote("C", new Timestamp(m0 + 600000), 1.0))
    trades.addData(Trade("C", new Timestamp(m0 + 600000), 1.0))
    query.processAllAvailable()
    quotes.addData(Quote("C", new Timestamp(m0 + 1800000), 2.0))
    trades.addData(Trade("C", new Timestamp(m0 + 1800000), 2.0))
    query.processAllAvailable()
    val rows = spark.table("ssj_asof")
      .select("t_sym", "price", "bid").as[(String, Double, Double)].collect()
    // exactly one output row for the A trade, carrying the LATEST
    // in-window quote — not 99.0, not the stale 98.0, never two rows
    assert(rows.count(_._1 == "A") == 1, s"got: ${rows.toSeq}")
    assert(rows.find(_._1 == "A").contains(("A", 100.0, 99.5)))
    // no unbounded state growth: the watermark evicted join/agg rows
    val ops = query.recentProgress.flatMap(_.stateOperators)
    assert(ops.map(_.numRowsRemoved).sum > 0,
      "watermark advance must remove stream-stream join / agg state")
    val finalTotal = query.recentProgress.last.stateOperators
      .map(_.numRowsTotal).sum
    assert(finalTotal <= 6,
      s"state must stay bounded by the watermark horizon, got $finalTotal")
    query.stop()
  }
}
