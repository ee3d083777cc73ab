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

  test("live testdata schemas match the pinned engine surface, all 10 tables") {
    // The full-surface twin of the events guard: the r6 regeneration also
    // flipped orders/lineitem date columns to TIMESTAMP_NTZ, silently.
    // Queries tolerate today's exact layout (104/104 vs DuckDB); any
    // future type change must announce itself here, not in a query diff.
    val live = "/root/testdata/sf0.001"
    assume(Files.exists(Paths.get(s"$live/region.parquet")),
      "live testdata not present")
    val pinned = Map(
      "region" -> "r_regionkey:int, r_name:string",
      "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
      "customer" -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
        "c_acctbal:double, c_mktsegment:string"),
      "supplier" -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
      "part" -> ("p_partkey:bigint, p_name:string, p_brand:string, " +
        "p_type:string, p_size:int, p_retailprice:double"),
      "orders" -> ("o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, " +
        "o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string"),
      "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, " +
        "l_linenumber:int, l_quantity:double, l_extendedprice:double, " +
        "l_discount:double, l_tax:double, l_returnflag:string, " +
        "l_linestatus:string, l_shipdate:timestamp_ntz"),
      // events via Tables.events: ts normalized to TIMESTAMP regardless of
      // the on-disk layout generation
      "events" -> ("event_id:bigint, ts:timestamp, user_id:bigint, " +
        "event_type:string, value:double, props:string"),
      "documents" -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
      "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")
    Tables.all.foreach { t =>
      val df = if (t == "events") Tables.events(spark, live)
               else Tables(spark, live, t)
      val got = df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      assert(got === pinned(t),
        s"DRIVER TESTDATA DRIFT on `$t`: schema changed — re-audit every " +
          s"query reading it, then re-pin here")
    }
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
    // value-range guard: a future plain-int64 layout in a different unit
    // would flow through the LongType branch type-correct but land
    // decades off (epoch-micros DIV 1000 → 1970). Schema checks can't
    // catch that; the decoded values must be in-era.
    val range = df.agg(
      org.apache.spark.sql.functions.min("ts"),
      org.apache.spark.sql.functions.max("ts")).head()
    val (lo, hi) = (range.getTimestamp(0).toInstant, range.getTimestamp(1).toInstant)
    val era = java.time.Instant.parse("2000-01-01T00:00:00Z")
    val cap = java.time.Instant.parse("2100-01-01T00:00:00Z")
    assert(!lo.isBefore(era) && hi.isBefore(cap),
      s"DRIVER TESTDATA DRIFT: decoded events.ts range [$lo, $hi] is " +
        "out of era — the on-disk unit changed; fix Tables.events")
  }
}
