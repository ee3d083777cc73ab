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
}
