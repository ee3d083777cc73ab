package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Testdata-drift guard for `Tables.events`.
  *
  * The driver regenerated `/root/testdata` between rounds 5 and 6 and the
  * `events.ts` parquet layout silently changed from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) — which broke 19 queries at
  * analysis time because the reader assumed the nanos layout. This spec
  * pins BOTH layouts via committed micro-fixtures holding the same four
  * rows, and asserts:
  *
  *  1. each layout reads through `Tables.events` to an identical
  *     `timestamp`-typed schema, and
  *  2. the decoded rows are bit-identical across layouts (the ns→µs
  *     integral division and the NTZ→UTC cast agree), and
  *  3. the LIVE testdata dir (when present) also resolves `ts` to
  *     `TimestampType` — so a future driver regeneration to a third
  *     layout flips this one test loudly instead of 19 queries.
  */
class TablesDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Stage a fixture as `<tmp>/events.parquet` so Tables.events can read
    * it with its production path convention. */
  private def stage(fixture: String): String = {
    val url = getClass.getResource(s"/fixtures/$fixture")
    assert(url != null, s"missing committed fixture $fixture")
    val dir = Files.createTempDirectory("graft_drift")
    Files.copy(Paths.get(url.toURI), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def readRows(dir: String): (Seq[String], Seq[Row]) = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      s"events.ts must normalize to TIMESTAMP, got ${df.schema("ts").dataType}")
    // every non-ts column must pass through untouched as well
    assert(df.schema("event_id").dataType === LongType)
    (df.columns.toSeq, df.orderBy("event_id").collect().toSeq)
  }

  test("nanos and micros fixture layouts decode to identical rows") {
    val (nanosCols, nanosRows) = readRows(stage("events_ts_nanos.parquet"))
    val (microsCols, microsRows) = readRows(stage("events_ts_micros.parquet"))
    assert(nanosCols === microsCols)
    assert(nanosRows.nonEmpty)
    assert(nanosRows === microsRows,
      "ns->us division and NTZ->UTC cast must agree row-for-row")
    // anchor absolute values so a timezone-shifted cast can't pass by
    // shifting both layouts identically
    val ts0 = nanosRows.head.getTimestamp(nanosCols.indexOf("ts"))
    assert(ts0.toInstant.toEpochMilli === 1700000000000L)
  }

  test("live testdata events.parquet reads through Tables.events") {
    val live = "/root/testdata/sf0.001"
    assume(Files.exists(Paths.get(s"$live/events.parquet")),
      "live testdata not present")
    val df = Tables.events(spark, live)
    assert(df.schema("ts").dataType === TimestampType,
      s"DRIVER TESTDATA DRIFT: events.ts resolved to " +
        s"${df.schema("ts").dataType}; teach Tables.events the new layout")
    assert(df.limit(1).count() === 1)
  }
}
