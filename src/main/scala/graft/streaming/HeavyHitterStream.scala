package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming heavy hitters via the SpaceSaving summary (Metwally et
  * al. 2005) on the Spark 4 arbitrary-state API — the unbounded-stream
  * twin of the batch q63 (freqItems candidates + exact recount):
  * a batch job can afford a second pass to make counts exact; a stream
  * cannot, so it maintains a FIXED-CAPACITY summary whose error is
  * bounded by construction instead.
  *
  * Per group (e.g. per event type), a `MapState` holds at most
  * `capacity` (item → (count, err)) entries in the RocksDB store:
  *  - a tracked item increments its count;
  *  - an untracked item with free capacity enters at (1, 0);
  *  - otherwise it REPLACES the current minimum-count item, inheriting
  *    its count as the over-estimate bound: (min+1, min).
  * Invariants (spec-asserted): estimate ≥ true count ≥ estimate − err,
  * any item with true frequency > N/capacity is guaranteed tracked,
  * and state never exceeds `capacity` entries per group — the property
  * that makes the operator safe at unbounded stream length.
  *
  * After each batch the processor emits the group's full summary
  * (group, item, count, err) — a monitoring-style sink overwrite; the
  * caller filters `count > θ·N` for the classic heavy-hitter read.
  *
  * 100 TB/unbounded posture: state is O(groups × capacity) regardless
  * of stream length or item cardinality; no shuffle beyond the keyed
  * grouping; eviction scans the ≤ capacity-entry map, so per-row cost
  * is O(capacity) worst-case and O(1) for tracked items.
  */
object HeavyHitterStream {
  /** (count, err) cell — a named product so the state encoder is a
    * stable schema rather than a tuple's synthetic field names. */
  case class Cell(count: Long, err: Long)
  /** Output row: the group's summary entry after the current batch. */
  case class Hitter(group: String, item: String, count: Long, err: Long)

  class SpaceSavingProcessor(capacity: Int)
      extends StatefulProcessor[String, (String, String), Hitter] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    @transient private var summary: MapState[String, Cell] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      summary = getHandle.getMapState[String, Cell]("summary",
        Encoders.STRING, Encoders.product[Cell], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, String)],
                                 timerValues: TimerValues): Iterator[Hitter] = {
      // drain into a local map: RocksDB point-reads per row would pay
      // (de)serialization per item; the summary is ≤ capacity entries
      val local = scala.collection.mutable.Map.empty[String, Cell]
      summary.iterator().foreach { case (i, c) => local(i) = c }
      rows.foreach { case (_, item) =>
        local.get(item) match {
          case Some(c) => local(item) = c.copy(count = c.count + 1)
          case None if local.size < capacity => local(item) = Cell(1L, 0L)
          case None =>
            // evict the minimum-count entry (ties by item for
            // determinism); the newcomer inherits min as its error bound
            val (mItem, mCell) = local.minBy { case (i, c) => (c.count, i) }
            local.remove(mItem)
            local(item) = Cell(mCell.count + 1L, mCell.count)
        }
      }
      // evicted keys must leave the store too, not just the local view
      summary.keys().toList.filterNot(local.contains)
        .foreach(summary.removeKey)
      local.foreach { case (i, c) => summary.updateValue(i, c) }
      local.toSeq.sortBy { case (i, c) => (-c.count, i) }
        .map { case (i, c) => Hitter(key, i, c.count, c.err) }.iterator
    }
  }

  /** Maintain a per-group SpaceSaving summary over a stream of
    * (group, item) rows; each batch emits every group-summary row
    * current as of that batch. Requires the RocksDB state store
    * (TtlState.RocksDbProvider). */
  def topItems(ds: Dataset[(String, String)], capacity: Int)
      : Dataset[Hitter] = {
    implicit val enc = Encoders.product[Hitter]
    ds.groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new SpaceSavingProcessor(capacity),
        TimeMode.None(), OutputMode.Append())
  }
}
