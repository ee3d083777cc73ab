package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.{FunnelEvent, StageAdvance}

/** Streaming funnel semantics under live micro-batches: strict
  * event-time stage ordering, cross-batch state carry, same-batch
  * multi-stage advance, and the monotone late-event rule. */
class StreamFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private val stages = Seq(
    "signup" -> "signup", "purchase" -> "purchase", "error" -> "error")

  test("funnel advances per stage across batches, strictly event-ordered") {
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.streaming.TtlState.RocksDbProvider)
    try {
      val input = MemoryStream[FunnelEvent]
      val got = scala.collection.mutable.ArrayBuffer.empty[StageAdvance]
      val q = FunnelStream.advances(input.toDS(), stages)
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StageAdvance], _: Long) =>
          val rows = df.collect()
          if (rows.nonEmpty) got.synchronized { got ++= rows }
          ()
        }
        .start()
      // batch 1: u1 signs up; u2's purchase precedes any signup -> nothing
      input.addData(
        FunnelEvent(1L, ts(10), "signup"),
        FunnelEvent(2L, ts(5), "purchase"))
      q.processAllAvailable()
      // batch 2: u1 purchases (advance); u2 signs up (advance);
      // u3 delivers signup+purchase TOGETHER, purchase arriving first in
      // the batch -> event-time sort must still advance both stages
      input.addData(
        FunnelEvent(1L, ts(20), "purchase"),
        FunnelEvent(2L, ts(6), "signup"),
        FunnelEvent(3L, ts(31), "purchase"),
        FunnelEvent(3L, ts(30), "signup"))
      q.processAllAvailable()
      // batch 3: u1 errors (advance, funnel complete); u2's purchase at
      // ts 4 is BEFORE its signup time -> ignored; at ts 8 -> advance;
      // u1's repeated signup after completion -> ignored
      input.addData(
        FunnelEvent(1L, ts(25), "error"),
        FunnelEvent(2L, ts(4), "purchase"),
        FunnelEvent(2L, ts(8), "purchase"),
        FunnelEvent(1L, ts(40), "signup"))
      q.processAllAvailable()
      q.stop()

      val byUser = got.groupBy(_.user_id)
        .view.mapValues(_.sortBy(_.stage_idx)
          .map(a => (a.stage, a.stage_idx, a.ts)).toSeq).toMap
      assert(byUser(1L) == Seq(("signup", 0, ts(10)),
        ("purchase", 1, ts(20)), ("error", 2, ts(25))))
      assert(byUser(2L) == Seq(("signup", 0, ts(6)),
        ("purchase", 1, ts(8))))
      assert(byUser(3L) == Seq(("signup", 0, ts(30)),
        ("purchase", 1, ts(31))))
      assert(got.size == 7)
    } finally {
      saved match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
