package graft

import java.nio.file.{Files, Path, StandardOpenOption}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Connectors, LineLogOffset}

/** End-to-end drive of the `graftlog` DataSource V2 source — the
  * broker-free runtime twin of the Kafka edge: batch read, micro-batch
  * offset advancement, checkpoint restart without reprocessing, and
  * the earliest/latest startingOffsets contract. */
class LineLogSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def append(dir: Path, name: String, lines: String*): Unit =
    Files.write(dir.resolve(name),
      lines.map(_ + "\n").mkString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  test("batch read returns (log, offset, value) for every line of every file") {
    val dir = Files.createTempDirectory("graftlog_batch")
    append(dir, "a.log", "a0", "a1", "a2")
    append(dir, "b.log", "b0")
    val got = Connectors.logBatch(spark, dir.toString)
      .as[(String, Long, String)].collect().sorted.toSeq
    assert(got == Seq(("a.log", 0L, "a0"), ("a.log", 1L, "a1"),
      ("a.log", 2L, "a2"), ("b.log", 0L, "b0")))
  }

  test("offset json round-trips, including names containing colons") {
    val o = LineLogOffset(Map("a:b.log" -> 3L, "c.log" -> 7L))
    assert(LineLogOffset.parse(o.json()) == o)
    assert(LineLogOffset.parse("") == LineLogOffset(Map.empty))
  }

  test("offset json round-trips names containing separators (comma, percent, newline)") {
    val o = LineLogOffset(Map("weird,name.log" -> 2L, "per%cent.log" -> 1L,
      "nl\nname.log" -> 4L, "plain.log" -> 9L))
    assert(LineLogOffset.parse(o.json()) == o)
    assert(!o.json().contains("\n"))
  }

  test("legacy pre-escaping checkpoints with literal '%' parse without decoding or throwing") {
    // entries written before esc() existed: '%' appears raw. A generic
    // hex decode threw NumberFormatException on '100%.log' ('%.l' is
    // not hex) and silently rewrote unknown-but-hex pairs; only the
    // five known escape codes may decode.
    assert(LineLogOffset.parse("100%.log:5") ==
      LineLogOffset(Map("100%.log" -> 5L)))
    assert(LineLogOffset.parse("pct%7Ename.log:2") ==
      LineLogOffset(Map("pct%7Ename.log" -> 2L))) // hex but not a known code
    assert(LineLogOffset.parse("tail%:1") ==
      LineLogOffset(Map("tail%" -> 1L))) // '%' at end, no two chars after
  }

  test("an unterminated trailing line is invisible until its newline lands") {
    val dir = Files.createTempDirectory("graftlog_partial")
    append(dir, "a.log", "a0", "a1")
    // a writer mid-append: bytes present, no terminator yet
    Files.write(dir.resolve("a.log"), "parti".getBytes("UTF-8"),
      StandardOpenOption.APPEND)
    assert(graft.sources.LineLogSource.latestCounts(dir.toString) ==
      Seq("a.log" -> 2L))
    val got = Connectors.logBatch(spark, dir.toString)
      .as[(String, Long, String)].collect().sorted.toSeq
    assert(got == Seq(("a.log", 0L, "a0"), ("a.log", 1L, "a1")))
    // the writer finishes the line: it now counts, with identical
    // content for the already-read range (the replay contract)
    Files.write(dir.resolve("a.log"), "al\n".getBytes("UTF-8"),
      StandardOpenOption.APPEND)
    assert(graft.sources.LineLogSource.latestCounts(dir.toString) ==
      Seq("a.log" -> 3L))
    val again = Connectors.logBatch(spark, dir.toString)
      .as[(String, Long, String)].collect().sorted.toSeq
    assert(again == Seq(("a.log", 0L, "a0"), ("a.log", 1L, "a1"),
      ("a.log", 2L, "partial")))
  }

  test("early close releases the reader without exhausting the range") {
    val dir = Files.createTempDirectory("graftlog_close")
    append(dir, "a.log", "a0", "a1", "a2")
    val it = graft.sources.LineLogSource.readRange(dir.toString, "a.log", 0L, 3L)
    assert(it.hasNext && it.next() == (0L, "a0"))
    it.close()
    it.close() // idempotent
    assert(!it.hasNext)
  }

  test("micro-batches advance per-file offsets and pick up new files") {
    val dir = Files.createTempDirectory("graftlog_stream")
    val ckpt = Files.createTempDirectory("graftlog_ckpt").toString
    append(dir, "a.log", "x0", "x1")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String)]
    def start() = Connectors.logStream(spark, dir.toString)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.synchronized { seen ++= df.as[(String, Long, String)].collect() }
        ()
      }.start()
    val q = start()
    q.processAllAvailable()
    assert(seen.synchronized(seen.sorted.toSeq) ==
      Seq(("a.log", 0L, "x0"), ("a.log", 1L, "x1")))
    // append to an existing log + land a whole new log: the next batch
    // must contain ONLY the delta beyond the committed offsets
    seen.synchronized(seen.clear())
    append(dir, "a.log", "x2")
    append(dir, "b.log", "y0")
    q.processAllAvailable()
    assert(seen.synchronized(seen.sorted.toSeq) ==
      Seq(("a.log", 2L, "x2"), ("b.log", 0L, "y0")))
    q.stop()
    // restart from the checkpoint: nothing is reprocessed, and lines
    // appended while the query was DOWN are picked up exactly once
    seen.synchronized(seen.clear())
    append(dir, "a.log", "x3")
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.synchronized(seen.sorted.toSeq) == Seq(("a.log", 3L, "x3")))
  }

  test("maxLinesPerTrigger bounds each micro-batch like Kafka's maxOffsetsPerTrigger") {
    val dir = Files.createTempDirectory("graftlog_limit")
    val ckpt = Files.createTempDirectory("graftlog_limit_ckpt").toString
    append(dir, "a.log", (0 until 5).map(i => s"a$i"): _*)
    append(dir, "b.log", "b0", "b1")
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val q = spark.readStream.format("graftlog")
      .option("path", dir.toString).option("maxLinesPerTrigger", "3")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val vals = df.select("value").as[String].collect().toSeq
        batches.synchronized { if (vals.nonEmpty) batches += vals }
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    val got = batches.synchronized(batches.toList)
    // 7 lines at <=3 per trigger: at least 3 batches, none above the cap,
    // and the union is every line exactly once
    assert(got.forall(_.size <= 3), s"batch over cap: $got")
    assert(got.size >= 3, s"expected bounded batches, got $got")
    assert(got.flatten.sorted ==
      ((0 until 5).map(i => s"a$i") ++ Seq("b0", "b1")).sorted)
  }

  test("Trigger.AvailableNow drains the start snapshot in bounded batches, then stops") {
    val dir = Files.createTempDirectory("graftlog_avnow")
    val ckpt = Files.createTempDirectory("graftlog_avnow_ckpt").toString
    append(dir, "a.log", (0 until 6).map(i => s"a$i"): _*)
    append(dir, "b.log", "b0", "b1", "b2")
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val q = spark.readStream.format("graftlog")
      .option("path", dir.toString).option("maxLinesPerTrigger", "4")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val vals = df.select("value").as[String].collect().toSeq
        batches.synchronized { if (vals.nonEmpty) batches += vals }
        ()
      }.start()
    assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
    val got = batches.synchronized(batches.toList)
    // 9 lines at <=4 per trigger: >=3 bounded batches covering every
    // line exactly once — NOT the single-batch fallback
    assert(got.size >= 3, s"expected bounded multi-batch drain, got $got")
    assert(got.forall(_.size <= 4), s"batch over cap: $got")
    assert(got.flatten.sorted ==
      ((0 until 6).map(i => s"a$i") ++ Seq("b0", "b1", "b2")).sorted)
  }

  test("AvailableNow + latest: initialOffset is capped, end offset never below start") {
    import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
    val dir = Files.createTempDirectory("graftlog_avnow_latest")
    append(dir, "a.log", "a0", "a1")
    val stream = new graft.sources.LineLogScan(dir.toString, "latest", Some(1L))
      .toMicroBatchStream(Files.createTempDirectory("graftlog_avnow_ck").toString)
    // cap snapshot at 2 lines, then a writer races ahead of it — the
    // regression had initialOffset() read the UNCAPPED live count (4),
    // putting start above every capped end and driving hi - lo negative
    stream.asInstanceOf[SupportsTriggerAvailableNow].prepareForTriggerAvailableNow()
    append(dir, "a.log", "a2", "a3")
    val start = stream.initialOffset().asInstanceOf[LineLogOffset]
    assert(start.counts("a.log") == 2L,
      s"initialOffset must respect the AvailableNow cap: $start")
    val end = stream.asInstanceOf[SupportsAdmissionControl]
      .latestOffset(start, ReadLimit.maxRows(10L)).asInstanceOf[LineLogOffset]
    end.counts.foreach { case (log, hi) =>
      assert(hi >= start.counts.getOrElse(log, 0L),
        s"end offset below start for $log: start=$start end=$end") }
    assert(end.counts("a.log") == 2L, s"cap must hold at latestOffset: $end")
  }

  test("startingOffsets=latest skips existing lines like the Kafka source") {
    val dir = Files.createTempDirectory("graftlog_latest")
    val ckpt = Files.createTempDirectory("graftlog_latest_ckpt").toString
    append(dir, "a.log", "old0", "old1")
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = Connectors.logStream(spark, dir.toString, startingOffsets = "latest")
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.synchronized { seen ++= df.select("value").as[String].collect() }
        ()
      }.start()
    q.processAllAvailable()
    assert(seen.synchronized(seen.isEmpty))
    append(dir, "a.log", "new0")
    q.processAllAvailable()
    q.stop()
    assert(seen.synchronized(seen.toSeq) == Seq("new0"))
  }
}
