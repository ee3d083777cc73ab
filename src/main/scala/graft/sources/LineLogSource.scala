package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graftlog` — a file-backed REPLAYABLE DataSource V2 source with
  * Kafka-shaped semantics, standing in for the reference's Kafka edge
  * (`/root/reference/spark/jobs/stock_batch.py:36-44`,
  * `stock_stream.py:122-129`) in environments without a broker: a
  * directory of append-only newline-delimited log files, one stream
  * "partition" per file, exposed as rows `(log, offset, value)` —
  * the (partition, offset, value) triple of a Kafka record.
  *
  * Offset semantics are the real thing, not a file re-scan: the
  * streaming offset is the per-file line count, serialized into the
  * checkpoint; each micro-batch plans only the `(start, end]` line
  * ranges, a restarted query resumes from the committed offset, and
  * re-planning an old range re-reads identical rows (append-only
  * files ARE the replay log). `initialOffset` honors
  * `startingOffsets=earliest|latest` like the Kafka source, and
  * `Trigger.AvailableNow` drains exactly the start-time snapshot in
  * `maxLinesPerTrigger`-bounded batches then stops
  * (SupportsTriggerAvailableNow, same contract as Kafka's).
  *
  * Scale shape: one input partition per (file, range) — parallelism =
  * file count, like Kafka's partition count; readers stream lines and
  * never buffer a file. Batch reads plan the full current range.
  *
  * Usage: `spark.read.format("graftlog").option("path", dir)` and
  * `spark.readStream.format("graftlog").option("path", dir)`.
  */
class LineLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LineLogSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new LineLogTable(properties.get("path"),
      Option(properties.get("startingOffsets")).getOrElse("earliest"),
      Option(properties.get("maxLinesPerTrigger")).map(_.toLong))
}

object LineLogSource {
  /** (log, offset, value) — the Kafka record triple, minus broker
    * metadata. `log` is the file name, `offset` the 0-based line. */
  val Schema: StructType = new StructType()
    .add("log", StringType).add("offset", LongType).add("value", StringType)

  /** Current per-log line counts — the "latest offsets" of the dir.
    * Sorted by name so offset JSON is deterministic. Only COMPLETE
    * ('\n'-terminated) lines count: a writer appending mid-line never
    * advances the offset past its partial tail, so replaying an old
    * (start, end] range always re-reads identical rows. */
  def latestCounts(dir: String): Seq[(String, Long)] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
    // evict watermarks of files deleted from this dir, so a long-lived
    // stream over a rotating log directory doesn't grow the cache
    // unboundedly (entries are small, but "runs for months" is the bar)
    val live = files.map(_.getCanonicalPath).toSet
    val dirPrefix = d.getCanonicalPath + java.io.File.separator
    countCache.keySet.removeIf(k =>
      k.startsWith(dirPrefix) && !k.substring(dirPrefix.length).contains(
        java.io.File.separator) && !live.contains(k))
    files.toSeq.map(f => f.getName -> completeLines(f))
  }

  /** Driver-side watermark cache: file canonical path -> (byte position
    * just past the last '\n' seen, complete-line count at that point).
    * Append-only files resume counting from the watermark, so a
    * long-running stream does O(appended bytes) per trigger instead of
    * re-scanning every file — the O(n^2)-lifetime-I/O tail Kafka avoids
    * with broker offsets. A shrunken file (append-only contract broken)
    * is recounted from zero. */
  private val countCache = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  private def completeLines(f: java.io.File): Long = {
    val key = f.getCanonicalPath
    val (cachedPos, cachedLines) = Option(countCache.get(key)).getOrElse((0L, 0L))
    val len = f.length()
    val (startPos, startLines) = if (len >= cachedPos) (cachedPos, cachedLines) else (0L, 0L)
    if (len == startPos) return startLines
    val in = new java.io.FileInputStream(f)
    try {
      var skipped = 0L
      while (skipped < startPos) {
        val s = in.skip(startPos - skipped)
        if (s <= 0) throw new java.io.IOException(s"short skip in $key")
        skipped += s
      }
      // count '\n' bytes — safe for UTF-8 (0x0A never occurs inside a
      // multi-byte sequence); the watermark lands just past the last one
      val buf = new Array[Byte](64 * 1024)
      var pos = startPos
      var lines = startLines
      var lastNl = startPos
      var n = in.read(buf)
      while (n > 0) {
        var i = 0
        while (i < n) {
          if (buf(i) == '\n') { lines += 1; lastNl = pos + i + 1 }
          i += 1
        }
        pos += n
        n = in.read(buf)
      }
      countCache.put(key, (lastNl, lines))
      lines
    } finally in.close()
  }

  /** Iterator over lines [start, end) of one log — the replay
    * primitive. Yields only '\n'-terminated lines (an optional trailing
    * '\r' is stripped), matching [[latestCounts]]'s line definition.
    * `close()` is idempotent and safe mid-iteration — a task that stops
    * early (limit, failure, cancellation) must call it to release the
    * file handle; exhaustion self-closes as a fast path. Skipping to
    * `start` re-reads the file prefix — O(end) per planned range, like
    * a log seek without an index; fine because each range is planned
    * and read once per micro-batch. */
  final class LineRangeIterator(dir: String, log: String, start: Long, end: Long)
      extends Iterator[(Long, String)] with AutoCloseable {
    private val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(
        new java.io.FileInputStream(new java.io.File(dir, log)),
        java.nio.charset.StandardCharsets.UTF_8))
    private var i = 0L
    private var closed = false
    private var nextLine: String = null
    locally {
      while (i < start && readTerminated() != null) i += 1
      advance()
    }
    /** Next '\n'-terminated line, or null at EOF — including the case
      * of a final line a writer is still appending. */
    private def readTerminated(): String = {
      val sb = new java.lang.StringBuilder
      var c = in.read()
      while (c != -1 && c != '\n') { sb.append(c.toChar); c = in.read() }
      if (c == -1) null
      else {
        val n = sb.length()
        if (n > 0 && sb.charAt(n - 1) == '\r') sb.setLength(n - 1)
        sb.toString
      }
    }
    private def advance(): Unit = {
      nextLine = if (!closed && i < end) readTerminated() else null
      if (nextLine == null) close()
    }
    override def hasNext: Boolean = nextLine != null
    override def next(): (Long, String) = {
      val out = (i, nextLine)
      i += 1
      advance()
      out
    }
    override def close(): Unit =
      if (!closed) { closed = true; nextLine = null; in.close() }
  }

  def readRange(dir: String, log: String, start: Long, end: Long): LineRangeIterator =
    new LineRangeIterator(dir, log, start, end)
}

/** Per-log line counts as a streaming Offset. The JSON is a sorted
  * `name:count` list — both ends of the serialization live here, so no
  * JSON library dependency. Separator characters in file names are
  * percent-escaped so any name round-trips through the checkpoint. */
case class LineLogOffset(counts: Map[String, Long]) extends Offset {
  override def json(): String =
    counts.toSeq.sorted.map { case (k, v) => s"${LineLogOffset.esc(k)}:$v" }.mkString(",")
}

object LineLogOffset {
  /** Escape '%' plus the offset-format separators (',', ':') and line
    * breaks, so a hostile filename can't corrupt the checkpoint. */
  private[sources] def esc(s: String): String = s.flatMap {
    case '%'  => "%25"
    case ','  => "%2C"
    case ':'  => "%3A"
    case '\n' => "%0A"
    case '\r' => "%0D"
    case c    => c.toString
  }

  private[sources] def unesc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // Decode ONLY the codes esc() emits. Checkpoints written before
      // escaping existed can carry a literal '%' in a name: a generic
      // hex decode would mis-read 'a%25.log' or throw
      // NumberFormatException on '100%.log' and fail the stream on
      // restart. Unknown/short sequences pass through unchanged, so
      // unesc never throws and legacy checkpoints stay parseable.
      val decoded: Option[Char] =
        if (c == '%' && i + 2 < s.length) s.substring(i + 1, i + 3) match {
          case "25" => Some('%')
          case "2C" => Some(',')
          case "3A" => Some(':')
          case "0A" => Some('\n')
          case "0D" => Some('\r')
          case _    => None
        } else None
      decoded match {
        case Some(d) => sb.append(d); i += 3
        case None    => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  def parse(s: String): LineLogOffset =
    if (s.isEmpty) LineLogOffset(Map.empty)
    else LineLogOffset(s.split(',').map { kv =>
      // lastIndexOf keeps pre-escaping checkpoints (unescaped ':' in
      // names) parseable; the count digits never contain ':'
      val i = kv.lastIndexOf(':')
      require(i > 0, s"corrupt graftlog offset entry '$kv' in '$s' " +
        "(expected <name>:<count>) — checkpoint damaged?")
      unesc(kv.substring(0, i)) -> kv.substring(i + 1).toLong
    }.toMap)
}

class LineLogTable(path: String, startingOffsets: String,
                   maxLinesPerTrigger: Option[Long])
    extends Table with SupportsRead {
  require(path != null, "graftlog requires a 'path' option")
  override def name(): String = s"graftlog:$path"
  override def schema(): StructType = LineLogSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new LineLogScan(path, startingOffsets, maxLinesPerTrigger)
}

/** One (file, line-range) slice — the unit of parallelism. */
case class LineLogInputPartition(dir: String, log: String,
                                 start: Long, end: Long) extends InputPartition

class LineLogScan(path: String, startingOffsets: String,
                  maxLinesPerTrigger: Option[Long]) extends Scan {
  override def readSchema(): StructType = LineLogSource.Schema

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      LineLogSource.latestCounts(path).map { case (log, n) =>
        LineLogInputPartition(path, log, 0L, n): InputPartition
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      LineLogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream with SupportsAdmissionControl
      with SupportsTriggerAvailableNow {
      // Trigger.AvailableNow contract (same as the Kafka source): the
      // wrapper calls prepareForTriggerAvailableNow() once at query
      // start; every subsequent latestOffset sees AT MOST this
      // snapshot, so the query drains exactly the data present at
      // start — in maxLinesPerTrigger-bounded batches — then stops,
      // even while writers keep appending.
      @volatile private var availableNowCap: Option[Map[String, Long]] = None
      override def prepareForTriggerAvailableNow(): Unit =
        availableNowCap = Some(LineLogSource.latestCounts(path).toMap)
      private def currentCounts(): Seq[(String, Long)] = {
        val live = LineLogSource.latestCounts(path)
        availableNowCap match {
          case Some(cap) => live.flatMap { case (log, n) =>
            // files created after the snapshot don't participate at all
            cap.get(log).map(c => log -> math.min(n, c))
          }
          case None => live
        }
      }
      // Routed through currentCounts() (not raw latestCounts): under
      // Trigger.AvailableNow the cap snapshot is taken BEFORE this
      // call, so an uncapped snapshot here could exceed the cap when
      // writers append between the two — latestOffset would then
      // compute hi - lo < 0 and emit an end offset below start.
      override def initialOffset(): Offset =
        if (startingOffsets == "latest")
          LineLogOffset(currentCounts().toMap)
        else LineLogOffset(Map.empty)
      // Kafka's maxOffsetsPerTrigger analogue: with maxLinesPerTrigger
      // set, each micro-batch admits at most that many NEW lines total,
      // budgeted across logs in name order — backfill over a large
      // directory proceeds in bounded batches instead of one giant one.
      override def getDefaultReadLimit: ReadLimit =
        maxLinesPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())
      override def latestOffset(): Offset =
        throw new UnsupportedOperationException(
          "latestOffset(start, limit) is used (SupportsAdmissionControl)")
      override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
        val cur = currentCounts()
        limit match {
          case r: ReadMaxRows =>
            val s = start.asInstanceOf[LineLogOffset].counts
            var budget = r.maxRows()
            LineLogOffset(cur.map { case (log, hi) =>
              val lo = s.getOrElse(log, 0L)
              // hi - lo clamped to >= 0: a checkpointed start can sit
              // above a later AvailableNow cap (restart after the
              // original drain); never move an offset backwards.
              val take = math.min(math.max(hi - lo, 0L), math.max(budget, 0L))
              budget -= take
              log -> (lo + take)
            }.toMap)
          case _ =>
            val s = start.asInstanceOf[LineLogOffset].counts
            LineLogOffset(cur.map { case (log, hi) =>
              log -> math.max(hi, s.getOrElse(log, 0L))
            }.toMap)
        }
      }
      override def reportLatestOffset(): Offset =
        LineLogOffset(currentCounts().toMap)
      override def deserializeOffset(json: String): Offset =
        LineLogOffset.parse(json)
      // append-only files are their own replay log: nothing to prune
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val s = start.asInstanceOf[LineLogOffset].counts
        val e = end.asInstanceOf[LineLogOffset].counts
        e.toSeq.sorted.flatMap { case (log, hi) =>
          val lo = s.getOrElse(log, 0L)
          if (hi > lo) Some(LineLogInputPartition(path, log, lo, hi): InputPartition)
          else None
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        LineLogReaderFactory
    }
}

object LineLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LineLogInputPartition]
    val it = LineLogSource.readRange(p.dir, p.log, p.start, p.end)
    val logName = UTF8String.fromString(p.log)
    new PartitionReader[InternalRow] {
      private var cur: (Long, String) = _
      override def next(): Boolean = {
        if (it.hasNext) { cur = it.next(); true } else false
      }
      override def get(): InternalRow =
        InternalRow(logName, cur._1, UTF8String.fromString(cur._2))
      // release the file handle even when the task stops early
      // (limit, failure, cancellation); exhaustion already self-closed
      override def close(): Unit = it.close()
    }
  }
}
