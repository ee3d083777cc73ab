package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2 T3 gaps: the reference only uses tumbling windows; the
  * engine supports sliding and session windows with the same
  * groupBy(window) surface (batch here; identical semantics streaming
  * with a watermark). */
class WindowVariantsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val m0 = 1735732800000L
  private def ts(off: Long) = new Timestamp(m0 + off)

  test("sliding windows: each event lands in windowDuration/slide windows") {
    val df = Seq(("A", ts(30000), 1.0), ("A", ts(90000), 2.0))
      .toDF("sym", "t", "v")
    val agg = df.groupBy(window(col("t"), "2 minutes", "1 minute"), col("sym"))
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("s"), col("n"))
      .as[(Timestamp, Double, Long)].collect().sortBy(_._1.getTime)
    // event@30s → windows [-1,1) and [0,2); event@90s → [0,2) and [1,3)
    assert(agg.length == 3)
    assert(agg(0) == (new Timestamp(m0 - 60000), 1.0, 1L))
    assert(agg(1) == (new Timestamp(m0), 3.0, 2L))
    assert(agg(2) == (new Timestamp(m0 + 60000), 2.0, 1L))
  }

  test("session windows: gap longer than timeout splits sessions") {
    val df = Seq(
      ("u1", ts(0), 1.0), ("u1", ts(20000), 2.0),   // one session (gap 20s)
      ("u1", ts(120000), 3.0),                      // gap 100s > 30s → new session
      ("u2", ts(0), 4.0)
    ).toDF("user", "t", "v")
    val agg = df.groupBy(session_window(col("t"), "30 seconds"), col("user"))
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .select(col("user"), col("s"), col("n"))
      .as[(String, Double, Long)].collect().sortBy(r => (r._1, r._2))
    assert(agg.toSeq == Seq(("u1", 3.0, 2L), ("u1", 3.0, 1L), ("u2", 4.0, 1L))
      || agg.toSeq == Seq(("u1", 3.0, 1L), ("u1", 3.0, 2L), ("u2", 4.0, 1L)))
    assert(agg.count(_._1 == "u1") == 2, "expected two u1 sessions")
  }
}
