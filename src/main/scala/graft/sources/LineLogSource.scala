package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
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
  * `startingOffsets=earliest|latest` like the Kafka source.
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
    * Sorted by name so offset JSON is deterministic. */
  def latestCounts(dir: String): Seq[(String, Long)] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
    files.toSeq.map { f =>
      val in = new java.io.BufferedReader(new java.io.FileReader(f))
      try {
        var n = 0L
        while (in.readLine() != null) n += 1
        f.getName -> n
      } finally in.close()
    }
  }

  /** Read lines [start, end) of one log — the replay primitive. */
  def readRange(dir: String, log: String, start: Long, end: Long): Iterator[(Long, String)] = {
    val in = new java.io.BufferedReader(
      new java.io.FileReader(new java.io.File(dir, log)))
    var i = 0L
    while (i < start && in.readLine() != null) i += 1
    new Iterator[(Long, String)] {
      private var nextLine: String = if (start < end) in.readLine() else null
      override def hasNext: Boolean = {
        val h = nextLine != null && i < end
        if (!h) in.close()
        h
      }
      override def next(): (Long, String) = {
        val out = (i, nextLine)
        i += 1
        nextLine = if (i < end) in.readLine() else null
        out
      }
    }
  }
}

/** Per-log line counts as a streaming Offset. The JSON is a sorted
  * `name:count` list — both ends of the serialization live here, so no
  * JSON library dependency. */
case class LineLogOffset(counts: Map[String, Long]) extends Offset {
  override def json(): String =
    counts.toSeq.sorted.map { case (k, v) => s"$k:$v" }.mkString(",")
}

object LineLogOffset {
  def parse(s: String): LineLogOffset =
    if (s.isEmpty) LineLogOffset(Map.empty)
    else LineLogOffset(s.split(',').map { kv =>
      val i = kv.lastIndexOf(':')
      kv.substring(0, i) -> kv.substring(i + 1).toLong
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
    new MicroBatchStream with SupportsAdmissionControl {
      override def initialOffset(): Offset =
        if (startingOffsets == "latest")
          LineLogOffset(LineLogSource.latestCounts(path).toMap)
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
        val cur = LineLogSource.latestCounts(path)
        limit match {
          case r: ReadMaxRows =>
            val s = start.asInstanceOf[LineLogOffset].counts
            var budget = r.maxRows()
            LineLogOffset(cur.map { case (log, hi) =>
              val lo = s.getOrElse(log, 0L)
              val take = math.min(hi - lo, math.max(budget, 0L))
              budget -= take
              log -> (lo + take)
            }.toMap)
          case _ => LineLogOffset(cur.toMap)
        }
      }
      override def reportLatestOffset(): Offset =
        LineLogOffset(LineLogSource.latestCounts(path).toMap)
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
      override def close(): Unit = ()
    }
  }
}
