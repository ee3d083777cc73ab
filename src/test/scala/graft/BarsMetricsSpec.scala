package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bars, Metrics}

class BarsMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ohlcv: deterministic open/close from event time, exact high/low/volume") {
    val trades = Seq(
      ("A", ts("2025-01-01 10:00:05"), 10.0, 1.0),
      ("A", ts("2025-01-01 10:00:30"), 12.0, 2.0),
      ("A", ts("2025-01-01 10:00:59"), 11.0, 3.0),
      ("A", ts("2025-01-01 10:01:10"), 99.0, 1.0), // next minute
      ("B", ts("2025-01-01 10:00:10"), 5.0, 10.0)
    ).toDF("symbol", "t", "price", "vol")
    val bars = Bars.ohlcv(trades, col("symbol"), col("t"), col("price"), col("vol"))
      .orderBy("key", "bucket_start")
      .select("key", "open", "high", "low", "close", "volume", "n_trades")
      .as[(String, Double, Double, Double, Double, Double, Long)].collect()
    assert(bars(0) == ("A", 10.0, 12.0, 10.0, 11.0, 6.0, 3L))
    assert(bars(1) == ("A", 99.0, 99.0, 99.0, 99.0, 1.0, 1L))
    assert(bars(2) == ("B", 5.0, 5.0, 5.0, 5.0, 10.0, 1L))
  }

  test("ohlcv: same-timestamp ties break on (ts, price), matching the streaming path") {
    val trades = Seq(
      ("A", ts("2025-01-01 10:00:05"), 12.0, 1.0),
      ("A", ts("2025-01-01 10:00:05"), 10.0, 1.0), // same instant as above
      ("A", ts("2025-01-01 10:00:40"), 11.0, 1.0),
      ("A", ts("2025-01-01 10:00:40"), 13.0, 1.0)  // same instant as above
    ).toDF("symbol", "t", "price", "vol")
    val b = Bars.ohlcv(trades, col("symbol"), col("t"), col("price"), col("vol"))
      .select("open", "close").as[(Double, Double)].head()
    // open = price at min (ts, price); close = price at max (ts, price)
    assert(b == ((10.0, 13.0)))
  }

  test("ohlcv property: low <= open,close <= high; volume conserved (seeded random)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val rows = List.fill(50)((
        if (rnd.nextBoolean()) "X" else "Y",
        new Timestamp(1735732800000L + rnd.nextInt(300) * 1000L),
        math.rint(rnd.nextDouble() * 49900 + 100) / 100,
        math.rint(rnd.nextDouble() * 99 + 1)))
      val df = rows.toDF("symbol", "t", "price", "vol")
      val bars = Bars.ohlcv(df, col("symbol"), col("t"), col("price"), col("vol"))
      val bad = bars.filter(col("low") > col("open") || col("low") > col("close") ||
        col("high") < col("open") || col("high") < col("close") || col("volume") < 0)
      assert(bad.count() == 0)
      // total volume conserved across bars
      val total = bars.agg(sum("volume")).as[Double].head()
      assert(math.abs(total - rows.map(_._4).sum) < 1e-6)
    }
  }

  test("rolling vwap over a 5-row frame matches hand computation") {
    val df = Seq(
      ("A", 1L, 10.0, 1L), ("A", 2L, 20.0, 1L), ("A", 3L, 30.0, 2L)
    ).toDF("sym", "seq", "price", "vol")
    val m = Metrics.rolling(col("sym"), Seq(col("seq")), col("price"), col("vol"))
    val got = df.select(col("seq"), m.vwap.as("vwap")).as[(Long, Double)]
      .collect().sortBy(_._1).map(_._2)
    // frames: [10], [10,20], [10,20,30*2]
    assert(got(0) == 10.0)
    assert(got(1) == 15.0)
    assert(math.abs(got(2) - (10 + 20 + 60) / 4.0) < 1e-12)
  }

  test("rolling vol is NULL on 1-row frames, sample stddev after") {
    val df = Seq(("A", 1L, 10.0, 1L), ("A", 2L, 14.0, 1L)).toDF("sym", "seq", "price", "vol")
    val m = Metrics.rolling(col("sym"), Seq(col("seq")), col("price"), col("vol"))
    val got = df.select(col("seq"), m.vol.as("v")).collect().sortBy(_.getLong(0))
    assert(got(0).isNullAt(1))
    assert(math.abs(got(1).getDouble(1) - math.sqrt(8.0)) < 1e-6)
  }

  test("anomaly: 3.0σ can never fire on inclusive 5-row frames (max z = √5)") {
    // current row in its own frame bounds |p−vwap|/σ at √5 ≈ 2.236
    val df = Seq(
      ("A", 1L, 100.0, 1000L), ("A", 2L, 100.0, 1000L), ("A", 3L, 100.0, 1000L),
      ("A", 4L, 100.0, 1000L), ("A", 5L, 500.0, 1L)
    ).toDF("sym", "seq", "price", "vol")
    val m = Metrics.rolling(col("sym"), Seq(col("seq")), col("price"), col("vol"))
    assert(df.select(m.isAnomaly(col("price")).as("a")).filter(col("a")).count() == 0)
  }

  test("anomaly at 2.0σ fires on a volume-skewed spike, never on NULL vol") {
    val df = Seq(
      ("A", 1L, 100.0, 1000L), ("A", 2L, 100.0, 1000L), ("A", 3L, 100.0, 1000L),
      ("A", 4L, 100.0, 1000L), ("A", 5L, 500.0, 1L)
    ).toDF("sym", "seq", "price", "vol")
    val m = Metrics.rolling(col("sym"), Seq(col("seq")), col("price"), col("vol"))
    val flagged = df.select(col("seq"), m.isAnomaly(col("price"), 2.0).as("a"))
      .filter(col("a")).as[(Long, Boolean)].collect().map(_._1)
    // vwap ≈ 100.1 (volume-dominated), dev ≈ 400, σ ≈ 178.9 → z ≈ 2.24
    assert(flagged.toSeq == Seq(5L))
  }
}
