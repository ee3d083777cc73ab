package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Schemas.Bar
import graft.operators.Metrics
import graft.streaming.RollingMetricsStream

class RollingStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bar(sym: String, min: Int, close: Double, vol: Double) =
    Bar(sym, close, close, close, close, vol, new Timestamp(min * 60000L))

  test("stateful rolling metrics span micro-batches and match batch windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Bar]
    val q = RollingMetricsStream.metrics(input.toDS(), threshold = 2.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("rolling_test").start()
    // batch 1: three bars; batch 2: two more — frames must carry over
    input.addData(bar("A", 0, 100.0, 1000.0), bar("A", 1, 100.0, 1000.0),
      bar("A", 2, 100.0, 1000.0))
    q.processAllAvailable()
    input.addData(bar("A", 3, 100.0, 1000.0), bar("A", 4, 500.0, 1.0))
    q.processAllAvailable()
    q.stop()
    val streaming = spark.table("rolling_test")
      .select("timestamp", "vwap_5", "vol_5", "is_anomaly")
      .as[(Timestamp, Double, Option[Double], Boolean)]
      .collect().sortBy(_._1.getTime)
    assert(streaming.length == 5)
    // batch equivalent over the SAME five bars
    val allBars = Seq(
      bar("A", 0, 100.0, 1000.0), bar("A", 1, 100.0, 1000.0),
      bar("A", 2, 100.0, 1000.0), bar("A", 3, 100.0, 1000.0),
      bar("A", 4, 500.0, 1.0)).toDS()
    val m = Metrics.rolling(col("symbol"), Seq(col("timestamp")),
      col("close"), col("volume"))
    val batch = allBars.select(col("timestamp"), m.vwap.as("vwap_5"), m.vol.as("vol_5"))
      .as[(Timestamp, Double, Option[Double])].collect().sortBy(_._1.getTime)
    streaming.zip(batch).foreach { case ((ts, sv, svol, _), (bts, bv, bvol)) =>
      assert(ts == bts)
      assert(math.abs(sv - bv) < 1e-6, s"vwap at $ts: $sv vs $bv")
      (svol, bvol) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-6)
        case (a, b) => assert(a.isEmpty == b.isEmpty)
      }
    }
    // the spike bar (frame spans both batches) must flag at 2.0σ
    assert(streaming.last._4, "expected anomaly on the cross-batch spike")
    assert(streaming.count(_._4) == 1)
  }

  test("late bar is framed at its event-time position, not arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Bar]
    val q = RollingMetricsStream.metrics(input.toDS(), threshold = 2.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("rolling_late_test").start()
    // minutes 0,1,3,4 arrive first; minute 2 arrives late in batch 2
    input.addData(bar("A", 0, 10.0, 1.0), bar("A", 1, 20.0, 1.0),
      bar("A", 3, 40.0, 1.0), bar("A", 4, 50.0, 1.0))
    q.processAllAvailable()
    input.addData(bar("A", 2, 30.0, 1.0))
    q.processAllAvailable()
    q.stop()
    val late = spark.table("rolling_late_test")
      .filter(col("timestamp") === new Timestamp(2 * 60000L))
      .select("vwap_5", "vol_5")
      .as[(Double, Option[Double])].head()
    // its frame is the bars at-or-before minute 2: closes 10, 20, 30 —
    // NOT (10,20,40,50,30) in arrival order
    assert(math.abs(late._1 - 20.0) < 1e-9, s"vwap ${late._1}")
    assert(math.abs(late._2.get - 10.0) < 1e-9, s"vol ${late._2}")
  }
}
