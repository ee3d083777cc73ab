package graft

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Exact, TextOps, VectorOps}
import graft.operators._
import graft.sources.Tables

/** The engine's query surface: one named query per operator in
  * SURVEY.md §2 plus the LLM-data-pipeline extensions, each with an
  * equivalent ANSI-SQL oracle for the driver's DuckDB differential check.
  *
  * Cross-engine determinism rules used throughout (see
  * graft.functions.Exact): shuffled double sums go through exact decimal;
  * window frames order on a unique tiebreak; float outputs that feed
  * comparisons/ranking are rounded to 6dp first; integer-ish derived
  * outputs are cast to BIGINT on both sides.
  */
object Queries {
  import Exact.{dsum, davg, dsumSql, dsumM, dsumMSql, dsumL, dsumLSql}

  case class Q(name: String, fn: (SparkSession, String) => DataFrame,
               oracle: Option[String])

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  // ---------------------------------------------------------------- core

  /** TPC-H Q1 shape: scan → filter → hash agg (SURVEY §2.2/§2.4).
    * Pushed filter on l_shipdate; map-side partial aggregation; 6 output
    * groups → trivially broadcastable result. Sums use the long-scaled
    * exact form (Exact.dsumL): same bit-exact cross-engine result as
    * the DECIMAL(18,4) casts, but the hot loop is a codegen'd 64-bit
    * add — ~2.5× faster on this aggregate (Scratch `_dsuml_exp`). */
  val q01 = q("q01_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       | ${dsumLSql("l_quantity")} AS sum_qty,
       | ${dsumLSql("l_extendedprice")} AS sum_base_price,
       | ${dsumLSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       | ${dsumLSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
       | ${dsumLSql("l_quantity")} / COUNT(*) AS avg_qty,
       | ${dsumLSql("l_extendedprice")} / COUNT(*) AS avg_price,
       | ${dsumLSql("l_discount")} / COUNT(*) AS avg_disc,
       | COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitemFanned(s, dir)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsumL(col("l_quantity")).as("sum_qty"),
        dsumL(col("l_extendedprice")).as("sum_base_price"),
        dsumL(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        // charge is a 6-decimal product: scale 6 rounds nothing, so the
        // scaled long is exactly the product's decimal value
        dsumL(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")),
          6).as("sum_charge"),
        (dsumL(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsumL(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsumL(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q6 shape: tight scan-filter-agg; every predicate reaches the
    * parquet scan (PushedFilters), single-row result. */
  val q02 = q("q02_revenue_filter",
    s"""SELECT COUNT(*) AS n_rows,
       | ${dsumMSql("l_extendedprice * l_discount")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_rows"),
        dsumM(col("l_extendedprice") * col("l_discount")).as("revenue"))
  }

  /** 3-way join + agg (TPC-H Q3 shape). Join order: lineitem⋈orders on
    * the big keys (sort-merge/shuffled-hash under AQE), then the small
    * customer dim; Catalyst broadcast-joins customer automatically at
    * test SF; at 100 TB customer shuffles too — the plan stays valid. */
  val q03 = q("q03_segment_revenue",
    s"""SELECT c.c_mktsegment,
       | ${dsumLSql("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue,
       | COUNT(DISTINCT l.l_orderkey) AS n_orders,
       | COUNT(DISTINCT c.c_custkey) AS n_customers
       |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |GROUP BY c.c_mktsegment""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    // Pre-aggregate revenue per order BEFORE the joins: the raw form's
    // two DISTINCT aggregates expanded the full 4x-larger joined
    // lineitem frame 3 ways; here the order-grain rows make n_orders a
    // plain count, leaving ONE distinct column over the smaller frame
    // (~4x faster at sf0.1). Long-scaled sums (Exact.dsumL's form)
    // re-aggregate exactly — integer addition is associative, so the
    // two-level sum equals the oracle's single-level sum, and the one
    // final division matches dsumLSql's.
    val perOrder = l.select(col("l_orderkey"),
        round((col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * 10000.0)
          .cast("long").as("rl"))
      .groupBy("l_orderkey").agg(sum(col("rl")).as("rl"))
    perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg((sum(col("rl")) / 10000.0).as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
  }

  /** Star-schema dim enrichment (reference J2, the join it never wrote —
    * SURVEY §2.3). nation/region are bounded dims → explicit broadcast:
    * zero shuffle of the fact side for the joins. */
  val q04 = q("q04_region_customer_stats",
    s"""SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
       | ${dsumMSql("c.c_acctbal")} / COUNT(c.c_acctbal) AS avg_acctbal,
       | ${dsumMSql("c.c_acctbal")} AS total_acctbal
       |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |GROUP BY r.r_name, n.n_name""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        (dsumM(col("c_acctbal")) / count(col("c_acctbal"))).as("avg_acctbal"),
        dsumM(col("c_acctbal")).as("total_acctbal"))
  }

  /** Reference W1: top-k per group, computed natively (no JDBC pushdown
    * needed — SURVEY §4). One shuffle on the partition key. */
  val q05 = q("q05_topk_per_group",
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
      | SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey
      |   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn
      | FROM lineitem) WHERE rn <= 3""".stripMargin) { (s, dir) =>
    Relational.topKPerGroup(
        Tables.lineitem(s, dir)
          .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"),
        Seq(col("l_suppkey")),
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), 3)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
  }

  private def eventVol: Column =
    get_json_object(col("props"), "$.k").cast("long") + 1
  private val eventVolSql = "(CAST(json_extract(props, '$.k') AS BIGINT) + 1)"

  /** Reference W2+W3: 5-row sliding VWAP per key (stock_stream.py:69-73),
    * over events with the JSON `k` field as volume. */
  val q06 = q("q06_rolling_vwap",
    s"""SELECT event_id, user_id,
       | CAST(SUM(CAST(value * $eventVolSql AS DECIMAL(18,4))) OVER w AS DOUBLE)
       |   / CAST(SUM(CAST($eventVolSql AS DECIMAL(18,4))) OVER w AS DOUBLE) AS vwap_5
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       | ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
    // project the JSON volume once: a multiply-referenced non-cheap
    // expression stays a separate projection (no CollapseProject), so
    // the parse runs once per row instead of once per window term
    val m = Metrics.rolling(col("user_id"),
      Seq(col("ts"), col("event_id")), col("value"), col("vol"))
    Tables.events(s, dir).withColumn("vol", eventVol)
      .select(col("event_id"), col("user_id"), m.vwap.as("vwap_5"))
  }

  /** Reference W4: rolling sample stddev (vol_5), NULL on 1-row frames. */
  val q07 = q("q07_rolling_volatility",
    """SELECT event_id, user_id,
      | CASE WHEN COUNT(value) OVER w > 1
      |  THEN round(stddev_samp(value) OVER w, 6) END AS vol_5
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      | ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
    val m = Metrics.rolling(col("user_id"),
      Seq(col("ts"), col("event_id")), col("value"), col("vol"))
    Tables.events(s, dir).withColumn("vol", eventVol)
      .select(col("event_id"), col("user_id"), m.vol.as("vol_5"))
  }

  /** Reference P6+P7: 3-sigma anomaly filter on the rolling metrics
    * (stock_stream.py:78-81,105). Comparison runs on rounded values so
    * both engines flag identical rows. */
  val q08 = q("q08_anomaly_flags",
    s"""SELECT event_id, user_id, value, vwap_5, vol_5 FROM (
       | SELECT event_id, user_id, value,
       |  CAST(SUM(CAST(value * $eventVolSql AS DECIMAL(18,4))) OVER w AS DOUBLE)
       |    / CAST(SUM(CAST($eventVolSql AS DECIMAL(18,4))) OVER w AS DOUBLE) AS vwap_5,
       |  CASE WHEN COUNT(value) OVER w > 1
       |   THEN round(stddev_samp(value) OVER w, 6) END AS vol_5
       | FROM events
       | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
       |WHERE abs(value - vwap_5) > 2.0 * vol_5""".stripMargin) { (s, dir) =>
    // Threshold 2.0σ (not the reference's 3.0) so the flag fires on the
    // uniform synthetic data — non-empty output is a stronger check.
    val m = Metrics.rolling(col("user_id"),
      Seq(col("ts"), col("event_id")), col("value"), col("vol"))
    Tables.events(s, dir).withColumn("vol", eventVol)
      .select(col("event_id"), col("user_id"), col("value"),
        m.vwap.as("vwap_5"), m.vol.as("vol_5"))
      .filter(abs(col("value") - col("vwap_5")) > lit(2.0) * col("vol_5"))
  }

  /** Reference A1+A2: tumbling 1-minute OHLCV bars with deterministic
    * open/close (min_by/max_by on the (event time, price) tuple —
    * SURVEY §7 risk 1 — so same-timestamp ties break identically on
    * both engines and match the streaming path).
    *
    * Oracle spells the tuple min/max as a join-back — open = min value
    * at the bar's earliest ts, close = max value at its latest
    * (identical lexicographic-(t,v) semantics; equivalence checked
    * both directions in DuckDB at sf0.01/sf0.1) — because DuckDB's
    * min(struct_pack(..)) aggregate degenerates superlinearly in group
    * count (~30 s at 100k groups, >17 min at 1M in the sfx1 sweep)
    * while the join form stays hash-agg-shaped at any scale. */
  val q09 = q("q09_ohlcv_bars",
    s"""WITH e AS (SELECT user_id, date_trunc('minute', ts) AS minute, ts, value
       |  FROM events),
       |b AS (SELECT user_id, minute, min(ts) AS tmin, max(ts) AS tmax,
       |  max(value) AS high, min(value) AS low,
       |  ${dsumSql("value")} AS volume, COUNT(*) AS n_trades
       | FROM e GROUP BY user_id, minute)
       |SELECT b.user_id, b.minute,
       | min(CASE WHEN e.ts = b.tmin THEN e.value END) AS open,
       | b.high, b.low,
       | max(CASE WHEN e.ts = b.tmax THEN e.value END) AS close,
       | b.volume, b.n_trades
       |FROM b JOIN e USING (user_id, minute)
       |GROUP BY b.user_id, b.minute, b.high, b.low, b.volume, b.n_trades""".stripMargin) { (s, dir) =>
    Bars.ohlcv(Tables.events(s, dir), col("user_id"), col("ts"),
        col("value"), col("value"))
      .select(col("key").as("user_id"), col("bucket_start").as("minute"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("n_trades"))
  }

  /** Reference A3+J1: latest row per key via agg + join-back
    * (stock_stream.py:85-97). */
  val q10 = q("q10_latest_per_key",
    """SELECT e.event_id, e.user_id, e.ts, e.event_type, e.value
      |FROM events e JOIN (SELECT user_id, max(ts) AS mt FROM events GROUP BY user_id) m
      | ON e.user_id = m.user_id AND e.ts = m.mt""".stripMargin) { (s, dir) =>
    Relational.latestPerKey(Tables.events(s, dir), Seq("user_id"), "ts")
      .select("event_id", "user_id", "ts", "event_type", "value")
  }

  /** Global sort + limit (SURVEY §2.6 gap): Spark plans TakeOrderedAndProject
    * — a per-partition top-N + single merge, never a full global sort. */
  val q11 = q("q11_sort_limit",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  /** Set op: UNION ALL (+ re-agg to a canonical multiset). */
  val q12 = q("q12_union_agg",
    """SELECT o_custkey, COUNT(*) AS n FROM (
      | SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      | UNION ALL
      | SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
      |GROUP BY o_custkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      .union(o.filter(col("o_totalprice") > 400000.0).select("o_custkey"))
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
  }

  /** Set op: INTERSECT (distinct semantics on both engines). */
  val q13 = q("q13_intersect_keys",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
  }

  /** Set op: EXCEPT (distinct semantics on both engines). */
  val q14 = q("q14_except_keys",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .except(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
  }

  /** Left-semi join (EXISTS). */
  val q15 = q("q15_semi_join",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      | WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
  }

  /** Left-anti join (NOT EXISTS) — filtered build side so the result is
    * non-empty on the synthetic data (every customer has some order). */
  val q16 = q("q16_anti_join",
    """SELECT c_custkey, c_name, c_acctbal FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      | WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0)""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 450000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
  }

  /** DISTINCT (hash aggregation, map-side combined). */
  val q17 = q("q17_distinct_pairs",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") { (s, dir) =>
    Tables.lineitem(s, dir).select("l_returnflag", "l_linestatus").distinct()
  }

  /** ROLLUP grouping sets (SURVEY §2.4 gap). */
  val q18 = q("q18_rollup_orders",
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       | ${dsumMSql("o_totalprice")} AS total_price
       |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsumM(col("o_totalprice")).as("total_price"))
  }

  /** CUBE grouping sets. */
  val q19 = q("q19_cube_lineitem",
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       | ${dsumLSql("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsumL(col("l_quantity")).as("sum_qty"))
  }

  /** String scalar functions (SURVEY §2.2 gap fillers). */
  val q20 = q("q20_string_funcs",
    """SELECT p_partkey, upper(p_brand) AS brand_u,
      | substr(p_name, 1, 8) AS name_pfx,
      | CAST(length(p_name) AS BIGINT) AS name_len,
      | concat_ws('|', p_brand, p_type) AS brand_type,
      | replace(p_name, ' ', '_') AS name_us,
      | regexp_extract(p_name, '^([a-z]+)', 1) AS first_word
      |FROM part""".stripMargin) { (s, dir) =>
    Tables.part(s, dir).select(col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      substring(col("p_name"), 1, 8).as("name_pfx"),
      length(col("p_name")).cast("long").as("name_len"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      regexp_replace(col("p_name"), " ", "_").as("name_us"),
      regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"))
  }

  /** Date functions + agg (SURVEY §2.2 gap fillers). */
  val q21 = q("q21_date_agg",
    s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       | CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,
       | COUNT(*) AS n, ${dsumMSql("o_totalprice")} AS revenue
       |FROM orders GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(count(lit(1)).as("n"), dsumM(col("o_totalprice")).as("revenue"))
  }

  /** JSON extraction (reference P2 family) + agg. */
  val q22 = q("q22_json_extract",
    s"""SELECT event_type, COUNT(*) AS n,
       | ${dsumMSql("CAST(json_extract(props, '$.k') AS BIGINT)")} / COUNT(*) AS avg_k,
       | max(CAST(json_extract(props, '$$.k') AS BIGINT)) AS max_k,
       | min(CAST(json_extract(props, '$$.k') AS BIGINT)) AS min_k
       |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (dsumM(k) / count(lit(1))).as("avg_k"),
        max(k).as("max_k"), min(k).as("min_k"))
  }

  /** Generator: explode/split word counts (reference G1 family). */
  val q23 = q("q23_explode_words",
    """SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
  }

  /** CASE WHEN bucketing + agg. */
  val q24 = q("q24_case_buckets",
    s"""SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
       |  WHEN o_totalprice < 200000.0 THEN 'mid' ELSE 'large' END AS bucket,
       | COUNT(*) AS n, ${dsumMSql("o_totalprice")} AS total_price
       |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(when(col("o_totalprice") < 50000.0, "small")
        .when(col("o_totalprice") < 200000.0, "mid")
        .otherwise("large").as("bucket"))
      .agg(count(lit(1)).as("n"), dsumM(col("o_totalprice")).as("total_price"))
  }

  /** Exact COUNT(DISTINCT) (SURVEY §2.4 gap; approx variant in tests). */
  val q25 = q("q25_count_distinct",
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      | COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
  }

  // shared by q30 (composed), q36 (native exec), and q57 (broadcast) —
  // three physical strategies, one oracle. (key, ts) is unique on the
  // quote side here, so the forms' tie-break differences cannot show.
  private val asofSql =
    """SELECT t.event_id, t.user_id,
      | q.event_id AS quote_event_id, q.value AS quote_value
      |FROM (SELECT * FROM events WHERE event_id % 2 = 1) t
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_id % 2 = 0) q
      | ON t.user_id = q.user_id AND q.ts <= t.ts""".stripMargin
  private def asofInputs(s: SparkSession, dir: String) = {
    val ev = Tables.events(s, dir)
    (ev.filter(col("event_id") % 2 === 1).select("event_id", "user_id", "ts"),
      ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id").as("q_event_id"), col("user_id"), col("ts"), col("value")))
  }

  /** Same as-of semantics through the NATIVE whole-operator path
    * (graft.plans.AsOfJoinExec — custom LogicalPlan + Strategy +
    * SparkPlan), checked against the identical oracle as q30. */
  val q36 = q("q36_asof_native", asofSql) { (s, dir) =>
    val (trades, quotes) = asofInputs(s, dir)
    AsOfJoin.asOfNative(trades, quotes, Seq("user_id"), "ts", "ts",
        Map("q_event_id" -> "quote_event_id", "value" -> "quote_value"))
      .select("event_id", "user_id", "quote_event_id", "quote_value")
  }

  /** Explicit GROUPING SETS (beyond rollup/cube). */
  private val q32Sql =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       | ${dsumLSql("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin
  val q32 = q("q32_grouping_sets", q32Sql) { (s, dir) =>
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(q32Sql)
  }

  /** Sorted group concatenation (collect_set → sort → join = the
    * deterministic string_agg). */
  val q33 = q("q33_group_concat",
    """SELECT l_returnflag,
      | string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
      | COUNT(DISTINCT l_linestatus) AS n_statuses
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
      .agg(array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
        countDistinct(col("l_linestatus")).as("n_statuses"))
  }

  /** Exact interpolated percentiles (both engines: linear interpolation
    * over the sorted values; rounded 6dp to absorb last-ulp interp
    * differences). */
  val q34 = q("q34_percentiles",
    """SELECT l_returnflag,
      | round(quantile_cont(l_quantity, 0.25), 6) AS p25,
      | round(quantile_cont(l_quantity, 0.5), 6) AS p50,
      | round(quantile_cont(l_quantity, 0.75), 6) AS p75
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
      .agg(round(percentile(col("l_quantity"), lit(0.25)), 6).as("p25"),
        round(percentile(col("l_quantity"), lit(0.5)), 6).as("p50"),
        round(percentile(col("l_quantity"), lit(0.75)), 6).as("p75"))
  }

  /** TPC-H Q21 shape (sole-blame suppliers): EXISTS + NOT EXISTS
    * against the same fact table, adapted to this schema — suppliers
    * with a returned line in a finished MULTI-supplier order where no
    * OTHER supplier had a return. Exercises the semi-join + anti-join
    * combo with an extra non-equi conjunct (l2.suppkey <> l1.suppkey):
    * both rewrite to equi-joins on the order key with the inequality
    * as a post-join residual — one shuffle each, no cartesian. Counts
    * only: no float determinism surface. */
  val q60 = q("q60_sole_blame",
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |AND EXISTS (SELECT 1 FROM lineitem l2
      | WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |AND NOT EXISTS (SELECT 1 FROM lineitem l3
      | WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |  AND l3.l_returnflag = 'R')
      |GROUP BY s_name""".stripMargin) { (s, dir) =>
    val l = Tables.lineitem(s, dir)
    val l1 = l.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
    val l2 = l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val l3 = l.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    val finished = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select("o_orderkey")
    l1.join(finished, l1("l_orderkey") === finished("o_orderkey"))
      .join(l2, l1("l_orderkey") === l2("o2") && l1("l_suppkey") =!= l2("s2"),
        "left_semi")
      .join(l3, l1("l_orderkey") === l3("o3") && l1("l_suppkey") =!= l3("s3"),
        "left_anti")
      .join(Tables.supplier(s, dir), l1("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** Approximate percentiles (GK sketch), oracle-checked the q29 way:
    * the dumped row carries the EXACT quantiles (oracle-computable,
    * q34's shape) plus booleans asserting each sketch estimate lies
    * inside the exact quantile band at p±0.001 — 10x the sketch's
    * guaranteed 1e-4 rank error at accuracy 10000, so a drifting
    * sketch hash-mismatches while a healthy one never flakes. */
  val q59 = q("q59_approx_percentile",
    """SELECT l_returnflag,
      | round(quantile_cont(l_quantity, 0.25), 6) AS p25,
      | round(quantile_cont(l_quantity, 0.5), 6) AS p50,
      | round(quantile_cont(l_quantity, 0.75), 6) AS p75,
      | TRUE AS ap25_ok, TRUE AS ap50_ok, TRUE AS ap75_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_quantity"), lit(0.25)), 6).as("p25"),
        round(percentile(col("l_quantity"), lit(0.5)), 6).as("p50"),
        round(percentile(col("l_quantity"), lit(0.75)), 6).as("p75"),
        percentile_approx(col("l_quantity"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("ap"),
        percentile(col("l_quantity"),
          array(lit(0.249), lit(0.499), lit(0.749))).as("lo"),
        percentile(col("l_quantity"),
          array(lit(0.251), lit(0.501), lit(0.751))).as("hi"))
      .select(col("l_returnflag"), col("p25"), col("p50"), col("p75"),
        (col("ap")(0) >= col("lo")(0) && col("ap")(0) <= col("hi")(0)).as("ap25_ok"),
        (col("ap")(1) >= col("lo")(1) && col("ap")(1) <= col("hi")(1)).as("ap50_ok"),
        (col("ap")(2) >= col("lo")(2) && col("ap")(2) <= col("hi")(2)).as("ap75_ok"))
  }

  /** Pivot (wide aggregation) with a fixed value set. */
  val q35 = q("q35_pivot",
    """SELECT l_returnflag,
      | CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
      | CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    // an absent (returnflag, linestatus) cell pivots to NULL while the
    // oracle's SUM(CASE ...) yields 0 — coalesce to the oracle's
    // 0-for-empty semantics so the match isn't data-dependent
    Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .select(col("l_returnflag"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"))
  }

  /** Bucketized range join: events matched to synthetic 5-minute
    * per-user intervals (every 10th event opens one). The oracle is the
    * plain BETWEEN theta join; the engine runs the equi-join-on-bucket
    * plan (see Relational.rangeJoin). */
  // shared by q38 (bucketed plan) and q54 (native exec) — both paths
  // must hash-match the same BETWEEN theta-join oracle
  private val rangeJoinSql =
    """SELECT e.event_id, e.user_id, i.event_id AS interval_id
      |FROM events e JOIN
      | (SELECT event_id, user_id, ts AS start_ts,
      |   ts + INTERVAL 5 MINUTE AS end_ts
      |  FROM events WHERE event_id % 10 = 0) i
      | ON e.user_id = i.user_id
      |  AND e.ts >= i.start_ts AND e.ts < i.end_ts""".stripMargin
  private def rangeJoinInputs(s: SparkSession, dir: String) = {
    val ev = Tables.events(s, dir)
    val intervals = ev.filter(col("event_id") % 10 === 0)
      .select(col("event_id").as("interval_id"), col("user_id"),
        col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 5 MINUTE")).as("end_ts"))
    (ev.select("event_id", "user_id", "ts"), intervals)
  }
  val q38 = q("q38_range_join", rangeJoinSql) { (s, dir) =>
    val (ev, intervals) = rangeJoinInputs(s, dir)
    Relational.rangeJoin(ev, intervals,
        Seq("user_id"), "ts", "start_ts", "end_ts")
      .select("event_id", "user_id", "interval_id")
  }

  /** Same range join through the native IntervalJoinExec (streamed
    * active-interval merge, no bucket explode) — hash-matched to the
    * identical oracle as q38, the q30/q36 pattern. */
  val q54 = q("q54_range_join_native", rangeJoinSql) { (s, dir) =>
    val (ev, intervals) = rangeJoinInputs(s, dir)
    Relational.rangeJoinNative(ev, intervals,
        Seq("user_id"), "ts", "start_ts", "end_ts",
        Map("interval_id" -> "interval_id"))
      .select("event_id", "user_id", "interval_id")
  }

  /** Unpivot / melt (wide → long reshape): three lineitem measures to
    * (metric, val) rows — Spark's `unpivot` operator; the oracle is
    * the equivalent UNION ALL (the semantic definition, engine-neutral).
    * Values are raw parquet doubles on both sides, no arithmetic. */
  val q55 = q("q55_unpivot",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      | 'qty' AS metric, l_quantity AS val
      |FROM lineitem WHERE l_orderkey % 50 = 0
      |UNION ALL
      |SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
      | 'price', l_extendedprice FROM lineitem WHERE l_orderkey % 50 = 0
      |UNION ALL
      |SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
      | 'discount', l_discount FROM lineitem WHERE l_orderkey % 50 = 0""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity").as("qty"), col("l_extendedprice").as("price"),
        col("l_discount").as("discount"))
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("qty"), col("price"), col("discount")), "metric", "val")
  }

  /** Batch sessionization: per-user sessions split on >10-minute gaps,
    * reduced to per-session stats. lag() marks session starts, a
    * running sum numbers them — one shuffle on the key (see
    * Relational.sessionize); the aggregation reuses the same hash
    * partitioning. Ordering tiebreak (ts, event_id) is unique, so the
    * session assignment is deterministic in both engines. */
  val q56 = q("q56_sessionize",
    """WITH marked AS (
      | SELECT user_id, ts, event_id,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 600
      |  THEN 1 ELSE 0 END AS new_s
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      | SELECT user_id, ts,
      |  CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
      | FROM marked
      |)
      |SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      | CAST(max(floor(epoch(ts))) - min(floor(epoch(ts))) AS BIGINT) AS duration_s
      |FROM sessions GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
    val sess = Relational.sessionize(
      Tables.events(s, dir).select("user_id", "ts", "event_id"),
      Seq("user_id"), "ts", Seq(col("event_id")), 600L)
    sess.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max(unix_timestamp(col("ts"))) - min(unix_timestamp(col("ts"))))
          .as("duration_s"))
  }

  /** RANGE frame (time-based sliding aggregate: trailing 5 minutes per
    * key, by value range on epoch seconds — not a row count). */
  val q39 = q("q39_range_frame",
    """SELECT event_id, user_id,
      | CAST(COUNT(*) OVER w AS BIGINT) AS n_5min,
      | CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_5min
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      | RANGE BETWEEN 300 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(unix_timestamp(col("ts")))
      .rangeBetween(-300, 0)
    Tables.events(s, dir).select(col("event_id"), col("user_id"),
      count(lit(1)).over(w).cast("long").as("n_5min"),
      sum(col("value").cast(Exact.M)).over(w).cast("double").as("sum_5min"))
  }

  /** Positional window values: first/last/nth over an ordered frame. */
  val q40 = q("q40_window_positional",
    """SELECT event_id, user_id,
      | first_value(value) OVER w AS first_v,
      | nth_value(value, 2) OVER w AS second_v
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir).select(col("event_id"), col("user_id"),
      first(col("value")).over(w).as("first_v"),
      nth_value(col("value"), 2).over(w).as("second_v"))
  }

  /** Array scalar functions over tokenized text. */
  val q41 = q("q41_array_funcs",
    """SELECT doc_id,
      | list_contains(string_split(text, ' '), 'the') AS has_the,
      | array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      | array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS sorted_vocab
      |FROM documents""".stripMargin) { (s, dir) =>
    val toks = split(col("text"), " ")
    Tables.documents(s, dir).select(col("doc_id"),
      array_contains(toks, "the").as("has_the"),
      concat_ws(" ", slice(toks, 1, 3)).as("first3"),
      size(toks).cast("long").as("n"),
      concat_ws(",", array_sort(array_distinct(toks))).as("sorted_vocab"))
  }

  /** Multiset set-ops: EXCEPT ALL / INTERSECT ALL keep duplicates. */
  val q42 = q("q42_multiset_ops",
    """SELECT o_custkey, COUNT(*) AS n FROM (
      | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      | EXCEPT ALL
      | SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |GROUP BY o_custkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .exceptAll(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
  }

  /** NULL-handling scalars over an outer join (coalesce / nullif /
    * null predicates). */
  val q43 = q("q43_null_funcs",
    """SELECT c.c_custkey,
      | coalesce(m.mx, 0.0) AS max_or_zero,
      | (m.mx IS NULL) AS no_big_order,
      | nullif(c.c_mktsegment, 'BUILDING') AS seg_nb
      |FROM customer c LEFT JOIN
      | (SELECT o_custkey, max(o_totalprice) AS mx FROM orders
      |  WHERE o_totalprice > 450000.0 GROUP BY o_custkey) m
      | ON c.c_custkey = m.o_custkey""".stripMargin) { (s, dir) =>
    val m = Tables.orders(s, dir).filter(col("o_totalprice") > 450000.0)
      .groupBy(col("o_custkey")).agg(max(col("o_totalprice")).as("mx"))
    Tables.customer(s, dir)
      .join(m, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("mx"), lit(0.0)).as("max_or_zero"),
        col("mx").isNull.as("no_big_order"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"))
  }

  /** Correlated scalar subquery (Catalyst decorrelates it into a left
    * outer aggregate-join — no per-row re-execution). */
  private val q37Sql =
    """SELECT c_custkey, c_name,
      | (SELECT max(o_totalprice) FROM orders o
      |  WHERE o.o_custkey = c.c_custkey) AS max_order
      |FROM customer c""".stripMargin
  val q37 = q("q37_correlated_subquery", q37Sql) { (s, dir) =>
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(q37Sql)
  }

  /** TPC-H Q7 shape: bilateral trade volume between nation pairs via a
    * 6-table join (two nation roles). Both nation sides broadcast. */
  val q44 = q("q44_nation_trade",
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       | ${dsumLSql("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue,
       | COUNT(*) AS n
       |FROM lineitem l
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
       |WHERE n1.n_name <> n2.n_name
       |GROUP BY n1.n_name, n2.n_name""".stripMargin) { (s, dir) =>
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"))
      .agg(dsumL(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q10 shape: top returned-revenue customers (join + agg +
    * global top-N — TakeOrderedAndProject, no full sort). */
  val q45 = q("q45_returned_topn",
    s"""SELECT * FROM (
       | SELECT c.c_custkey, c.c_name,
       |  ${dsumMSql("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue
       | FROM customer c
       | JOIN orders o ON c.c_custkey = o.o_custkey
       | JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       | WHERE l.l_returnflag = 'R'
       | GROUP BY c.c_custkey, c.c_name)
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(dsumM(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share).
    * Ratio of two exact decimal sums → deterministic double. */
  val q46 = q("q46_promo_share",
    s"""SELECT
       | ${dsumLSql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
       |  / ${dsumLSql("l_extendedprice * (1.0 - l_discount)")} AS promo_share,
       | COUNT(*) AS n
       |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .agg((dsumL(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(0.0)) /
        dsumL(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("promo_share"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q18 shape: large orders via HAVING + join back. */
  val q47 = q("q47_large_orders",
    s"""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, big.sum_qty
       |FROM orders o JOIN (
       | SELECT l_orderkey, ${dsumMSql("l_quantity")} AS sum_qty
       | FROM lineitem GROUP BY l_orderkey
       | HAVING ${dsumMSql("l_quantity")} > 150.0) big
       | ON o.o_orderkey = big.l_orderkey""".stripMargin) { (s, dir) =>
    val big = Tables.lineitemFanned(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(dsumM(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 150.0)
    Tables.fanned(s, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice", "sum_qty")
  }

  /** TPC-H Q2 shape: cheapest observed supplier per part (min-per-group
    * via rank on the rounded unit price, deterministic tiebreak). */
  val q48 = q("q48_cheapest_supplier",
    """SELECT p_partkey, l_suppkey, unit_price FROM (
      | SELECT l_partkey AS p_partkey, l_suppkey,
      |  l_extendedprice / l_quantity AS unit_price,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY l_partkey
      |   ORDER BY l_extendedprice / l_quantity, l_suppkey) AS BIGINT) AS rn
      | FROM lineitem) WHERE rn = 1""".stripMargin) { (s, dir) =>
    // RAW quotient, deliberately unrounded: the same IEEE division of
    // the same parquet doubles is bit-identical on both engines, while
    // round() is NOT — 2dp prices over power-of-two quantities produce
    // exact decimal halves (4279.73/32 = 133.7415625) where Spark
    // rounds half-up and DuckDB half-to-even (hit at sf0.1)
    Relational.topKPerGroup(
        Tables.lineitem(s, dir).select(
          col("l_partkey").as("p_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit_price")),
        Seq(col("p_partkey")), Seq(col("unit_price"), col("l_suppkey")), 1)
      .select("p_partkey", "l_suppkey", "unit_price")
  }

  /** TPC-H Q22 shape: scalar-subquery comparison (above-average account
    * balance) + NOT EXISTS, with the average computed decimal-exact so
    * the comparison boundary is identical on both engines. */
  val q49 = q("q49_above_avg_idle",
    """SELECT c_custkey, c_acctbal FROM customer c
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
      |  / COUNT(*) FROM customer)
      | AND NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)""".stripMargin) { (s, dir) =>
    // the scalar average stays IN the plan (crossJoin of a broadcast
    // 1-row aggregate) — no eager .head() action at plan-build time,
    // and the customer scan isn't run twice
    val c = Tables.customer(s, dir)
    val avgBal = c.agg((dsumM(col("c_acctbal")) / count(lit(1))).as("__avg_bal"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("__avg_bal"))
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_acctbal")
  }

  /** TPC-H Q9 shape: profit by supplier nation × order year. */
  val q50 = q("q50_nation_year_profit",
    s"""SELECT n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       | ${dsumLSql("l.l_extendedprice * (1.0 - l.l_discount)")} AS profit
       |FROM lineitem l
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsumL(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("profit"))
  }

  /** Distribution window functions: percent_rank / cume_dist. */
  val q51 = q("q51_percent_rank",
    """SELECT o_orderkey, o_custkey,
      | percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
      percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
  }

  /** Date/interval arithmetic: month/day offsets with month-end
    * clamping, last_day, quarter truncation. */
  val q52 = q("q52_date_arith",
    """SELECT o_orderkey,
      | CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
      | CAST(o_orderdate + INTERVAL 10 DAY AS DATE) AS plus10d,
      | last_day(CAST(o_orderdate AS DATE)) AS month_end,
      | CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).select(col("o_orderkey"),
      add_months(col("o_orderdate"), 3).as("plus3m"),
      date_add(col("o_orderdate").cast("date"), 10).as("plus10d"),
      last_day(col("o_orderdate").cast("date")).as("month_end"),
      date_trunc("quarter", col("o_orderdate")).cast("date").as("quarter_start"))
  }

  /** String padding/slicing scalars. */
  val q53 = q("q53_string_pad",
    """SELECT p_partkey,
      | lpad(p_brand, 12, '*') AS brand_l, rpad(p_brand, 12, '-') AS brand_r,
      | reverse(p_name) AS name_rev,
      | left(p_name, 4) AS name_l4, right(p_name, 4) AS name_r4
      |FROM part""".stripMargin) { (s, dir) =>
    Tables.part(s, dir).select(col("p_partkey"),
      lpad(col("p_brand"), 12, "*").as("brand_l"),
      rpad(col("p_brand"), 12, "-").as("brand_r"),
      reverse(col("p_name")).as("name_rev"),
      substring(col("p_name"), 1, 4).as("name_l4"),
      expr("right(p_name, 4)").as("name_r4"))
  }

  // ------------------------------------------------- dedup (LLM pipeline)

  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** Exact-dup statistics: raw and normalized content hashes. */
  val d01 = q("d01_dedup_exact_stats",
    s"""SELECT COUNT(*) AS n_docs,
       | COUNT(DISTINCT md5(text)) AS n_unique_hash,
       | COUNT(DISTINCT md5($normSql)) AS n_unique_norm
       |FROM documents""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_unique_hash"),
      countDistinct(md5(TextOps.normText(col("text")))).as("n_unique_norm"))
  }

  /** Exact dedup survivors: min doc_id per normalized-content hash —
    * the scalable keep-one-per-cluster rule (hash shuffle, no sort). */
  val d02 = q("d02_dedup_exact_keep",
    s"""SELECT min(doc_id) AS keep_id, COUNT(*) AS dup_count
       |FROM documents GROUP BY md5($normSql)""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy(md5(TextOps.normText(col("text"))))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .select("keep_id", "dup_count")
  }

  /** MinHash+LSH near-dup candidate pairs, fully oracle-checked: the
    * registered plan uses the engine-PORTABLE md5 signatures
    * (Dedup.portableSignatures — string-min over fixed-width hex), so
    * DuckDB reproduces the exact signature/band/candidate/estimate
    * pipeline bit-for-bit. The production path — same banding, native
    * xxhash64 signature expression, ~10× faster — is what d05/d07/d08
    * route through and what DedupSpec covers against exact Jaccard. */
  // The portable-MinHash candidate-pair oracle prelude shared by d03
  // and d13: md5-derived hash family, 32-slot signatures, 16-band
  // equi-join, ending in `cand` = the distinct (doc_a < doc_b)
  // band-collision pairs. ONE definition — the "same candidates"
  // guarantee between the queries would drift with two copies.
  private val minhashCandOracleCtes =
    """WITH d AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |ab AS (SELECT doc_id, list_transform(sh, s ->
      |   [CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 1000000007,
      |    CAST(concat('0x', substr(md5(s), 17, 15)) AS BIGINT) % 1000000007]) AS ab
      | FROM d),
      |sigs AS (SELECT doc_id,
      |  list_transform(range(32), i ->
      |    list_min(list_transform(ab, p -> (p[1] + i * p[2]) % 1000000007))) AS sig
      | FROM ab),
      |bands AS (SELECT doc_id, bb, sig[bb*2+1] AS h1, sig[bb*2+2] AS h2
      | FROM sigs, unnest(range(16)) AS t(bb)),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      | FROM bands a JOIN bands b
      |  ON a.bb = b.bb AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id)""".stripMargin

  val d03 = q("d03_dedup_minhash_pairs",
    s"""$minhashCandOracleCtes
      |SELECT c.doc_a, c.doc_b,
      | round(CAST(len(list_filter(range(32), i -> sa.sig[i+1] = sb.sig[i+1])) AS DOUBLE) / 32, 6) AS est_jaccard
      |FROM cand c JOIN sigs sa ON sa.doc_id = c.doc_a
      | JOIN sigs sb ON sb.doc_id = c.doc_b""".stripMargin) { (s, dir) =>
    // The oracle generates candidates with the SAME band equi-join
    // shape the plan uses (not the O(n²) `ON a.doc_id < b.doc_id`
    // pairwise filter): "some band agrees" ⟺ the pair collides in a
    // band bucket, so the forms are equivalent — checked both
    // directions in DuckDB at sf0.001/sf0.01 — while staying
    // hash-join-shaped at sweep scale.
    Dedup.minhashCandidatePairsPortable(Tables.documents(s, dir), "doc_id", "text")
  }

  /** Incremental dedup: docs with doc_id % 5 = 0 are the incoming
    * batch, the rest the already-ingested corpus; a batch doc survives
    * iff it has no exact normalized duplicate and no portable-MinHash
    * band collision in the corpus — the daily-ingest path where
    * re-deduplicating the full corpus per batch is not an option. */
  val d10 = q("d10_dedup_incremental",
    s"""WITH d AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |ab AS (SELECT doc_id, list_transform(sh, s ->
      |   [CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 1000000007,
      |    CAST(concat('0x', substr(md5(s), 17, 15)) AS BIGINT) % 1000000007]) AS ab
      | FROM d),
      |sigs AS (SELECT doc_id,
      |  list_transform(range(32), i ->
      |    list_min(list_transform(ab, p -> (p[1] + i * p[2]) % 1000000007))) AS sig
      | FROM ab),
      |exact_ok AS (SELECT i.doc_id FROM documents i
      | WHERE i.doc_id % 5 = 0 AND NOT EXISTS (
      |  SELECT 1 FROM documents k WHERE k.doc_id % 5 <> 0
      |   AND md5(regexp_replace(lower(trim(k.text)), '\\s+', ' ', 'g'))
      |     = md5(regexp_replace(lower(trim(i.text)), '\\s+', ' ', 'g')))),
      |bands AS (SELECT doc_id, bb.range AS bb,
      |   sig[bb.range*2+1] AS k1, sig[bb.range*2+2] AS k2
      | FROM sigs, range(16) bb),
      |collided AS (SELECT DISTINCT a.doc_id
      | FROM bands a JOIN bands b
      |  ON a.bb = b.bb AND a.k1 = b.k1 AND a.k2 = b.k2
      | WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0)
      |SELECT doc_id FROM exact_ok
      |WHERE doc_id NOT IN (SELECT doc_id FROM collided)""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    Dedup.incrementalKeep(
        docs.filter(col("doc_id") % 5 === 0), docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", portable = true)
      .select("doc_id")
  }

  /** SimHash fingerprints, fully oracle-checked: the registered plan
    * uses the engine-portable 60-bit md5 variant, which the oracle
    * rebuilds with the same hex-derived token hashes and per-bit votes.
    * The xxhash64 [[Dedup.simhashes]] stays the production variant
    * (unit-tested for hamming behavior in DedupSpec). */
  // Oracle spelled as unnest + 60 vectorized bit-count aggregates rather
  // than nested list_transform lambdas: per-bit sign-sum > 0 ⟺
  // 2·(count of set bits) > token count, so the hash assembles from
  // plain SUM/COUNT columns. Same math, but DuckDB executes it as one
  // parallel hash aggregation over the unnested tokens instead of an
  // O(docs × 60 × tokens) scalar lambda loop — the nested form ran >70
  // minutes at 500k docs (sfx10) where this finishes in seconds-to-
  // minutes. Same oracle-scaling lesson as the round-5 d03/d05/d09
  // index-join rewrites (TESTDATA.md).
  private val d04BitSums = (0 until 60)
    .map(b => s"SUM(CAST((x >> $b) & 1 AS BIGINT)) AS c$b").mkString(",\n ")
  private val d04BitAssemble = (0 until 60)
    .map(b => s"CASE WHEN 2*c$b > n THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END")
    .mkString(" + ")
  val d04 = q("d04_dedup_simhash",
    s"""WITH t AS (SELECT doc_id,
       |  CAST(concat('0x', substr(md5(u.w), 1, 15)) AS BIGINT) AS x
       | FROM documents, UNNEST(string_split(lower(text), ' ')) AS u(w)),
       |s AS (SELECT doc_id, COUNT(*) AS n,
       | $d04BitSums
       | FROM t GROUP BY doc_id)
       |SELECT doc_id, CAST($d04BitAssemble AS BIGINT) AS simhash
       |FROM s""".stripMargin) { (s, dir) =>
    Dedup.simhashesPortable(Tables.documents(s, dir), "doc_id", "text")
  }

  /** Near-dup cluster assignment: exact-Jaccard edges (LSH-routed, the
    * d05 pair set) → connected components (min-label propagation).
    * Thresholding on the EXACT re-ranked jaccard — not the minhash
    * estimate — makes the edge set engine-independent, so components
    * are fully oracle-checkable: DuckDB rebuilds the same graph and
    * takes min-reachable-id per node via a recursive CTE. (r01 scored
    * this query no-oracle; the est_jaccard edge filter was the only
    * hash-specific part.) Pair generation uses d05's inverted-index
    * spelling (equivalence proven there); the reachability recursion
    * is the remaining super-linear piece but completes at ~sf1 in
    * ~11 min, so d07/d08 are in the sweep (both multiset-exact at
    * 500k docs: 50,000 assignments / 4,756 sketches). */
  val d07 = q("d07_dedup_clusters",
    """WITH RECURSIVE d AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
      |pairs AS (
      | SELECT doc_a, doc_b FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |   CAST(COUNT(*) AS DOUBLE) / (min(a.n) + min(b.n) - COUNT(*)) AS jaccard
      |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      | WHERE jaccard >= 0.5),
      |edges AS (
      | SELECT doc_a AS src, doc_b AS dst FROM pairs
      | UNION SELECT doc_b, doc_a FROM pairs),
      |reach(doc_id, r) AS (
      | SELECT src, src FROM edges
      | UNION
      | SELECT re.doc_id, e.dst FROM reach re JOIN edges e ON e.src = re.r)
      |SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.clusters(
      Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", threshold = 0.5)
        .select("doc_a", "doc_b"))
  }

  /** Cluster-level MinHash sketches, FULLY oracle-checked: one
    * unionized signature per near-dup cluster (custom Aggregator —
    * elementwise min is the signature of the member-set union), over
    * the engine-portable md5 signature family (d03's), so DuckDB
    * recomputes every member signature, rebuilds the same clusters
    * (d07's recursive CTE), and takes the same elementwise min. Member
    * invariants (n_members, min/max doc id) ride along. Cluster
    * assignments come from the PERSISTED artifact [[ensureClusters]]
    * (built once in prepare, the IVF precedent) — a real pipeline
    * lands cluster ids once and derives sketches from the artifact, so
    * the timed query is the signature aggregation, not a full LSH +
    * connected-components re-run. */
  val d08 = q("d08_cluster_signatures",
    """WITH RECURSIVE d AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
      |pairs AS (
      | SELECT doc_a, doc_b FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |   CAST(COUNT(*) AS DOUBLE) / (min(a.n) + min(b.n) - COUNT(*)) AS jaccard
      |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      | WHERE jaccard >= 0.5),
      |edges AS (
      | SELECT doc_a AS src, doc_b AS dst FROM pairs
      | UNION SELECT doc_b, doc_a FROM pairs),
      |reach(doc_id, r) AS (
      | SELECT src, src FROM edges
      | UNION
      | SELECT re.doc_id, e.dst FROM reach re JOIN edges e ON e.src = re.r),
      |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
      |ab AS (SELECT doc_id, list_transform(sh, s ->
      |   [CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 1000000007,
      |    CAST(concat('0x', substr(md5(s), 17, 15)) AS BIGINT) % 1000000007]) AS ab
      | FROM d),
      |sigs AS (SELECT doc_id,
      |  list_transform(range(32), i ->
      |    list_min(list_transform(ab, p -> (p[1] + i * p[2]) % 1000000007))) AS sig
      | FROM ab),
      |mins AS (SELECT cl.cluster_id, t.i AS i, min(s.sig[t.i + 1]) AS m
      | FROM sigs s JOIN cl ON s.doc_id = cl.doc_id CROSS JOIN range(32) t(i)
      | GROUP BY cl.cluster_id, t.i),
      |sigj AS (SELECT cluster_id,
      |  string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS cluster_sig
      | FROM mins GROUP BY cluster_id),
      |members AS (SELECT cluster_id, COUNT(*) AS n_members,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      | FROM cl GROUP BY cluster_id)
      |SELECT m.cluster_id, s.cluster_sig, m.n_members, m.min_doc, m.max_doc
      |FROM members m JOIN sigj s ON s.cluster_id = m.cluster_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    // the persisted d07 cluster artifact — same exact-Jaccard edge set,
    // so the two cluster views agree (and d08 times only the sketch agg)
    val cl = ensureClusters(s, dir)
    val sigs = Dedup.portableSignatures(docs, "doc_id", "text", numHashes = 32)
    sigs.join(cl, "doc_id")
      .groupBy("cluster_id")
      .agg(graft.functions.Aggregators.minhashUnion(32)(col("sig")).as("sig_arr"),
        count(lit(1)).as("n_members"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .select(col("cluster_id"),
        array_join(col("sig_arr").cast("array<string>"), ",").as("cluster_sig"),
        col("n_members"), col("min_doc"), col("max_doc"))
  }

  /** Exact 3-gram Jaccard near-dup pairs (j ≥ 0.5), LSH-routed: MinHash
    * band buckets generate candidates (hash shuffle on the band key —
    * no blocking-key self-join whose hot block is O(n²) at corpus
    * scale), then the exact integer-arithmetic Jaccard re-ranks and
    * thresholds. The oracle computes pairwise Jaccard with the same
    * threshold (inverted-index spelling, see below) — equality holds
    * because LSH recall at j ≥ 0.5 is ~1 (16 bands × 2 rows; the
    * corpus is bimodal, dups ≥ 0.75 vs noise ≤ 0.15; asserted against
    * the full join in DedupSpec and `Scratch _neardup_parity`). */
  val d05 = q("d05_ngram_jaccard_pairs",
    """WITH d AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d)
      |SELECT doc_a, doc_b, jaccard FROM (
      | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(COUNT(*) AS DOUBLE) / (min(a.n) + min(b.n) - COUNT(*)) AS jaccard
      | FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      | GROUP BY a.doc_id, b.doc_id)
      |WHERE jaccard >= 0.5""".stripMargin) { (s, dir) =>
    // Oracle is the inverted-index spelling of pairwise Jaccard: the
    // shingle lists are distinct, so the per-pair collision count is
    // the intersection size and |A∪B| = nA + nB − |A∩B|; a pair with
    // no shared shingle has jaccard 0 and can't clear the threshold.
    // Equivalence to the naive `ON a.doc_id < b.doc_id` cartesian
    // checked both directions in DuckDB at sf0.001/sf0.01; ~sf1 runs
    // in ~90 s where the cartesian is 125B list intersections.
    Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", threshold = 0.5)
  }

  /** Incremental near-dup delta (d15): near-dup pairs between a NEW
    * batch (doc_id % 10 = 0 stands in for today's ingest) and the
    * LANDED corpus — never old x old, the quadratic bulk a daily
    * re-pair must avoid. Same banding and exact-Jaccard verify as
    * d05, restricted to the cross-membership pairs; the oracle is
    * d05's inverted-index spelling with the membership predicates. */
  val d15 = q("d15_neardup_delta",
    """WITH d AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d)
      |SELECT doc_new, doc_old, jaccard FROM (
      | SELECT a.doc_id AS doc_new, b.doc_id AS doc_old,
      |  CAST(COUNT(*) AS DOUBLE) / (min(a.n) + min(b.n) - COUNT(*)) AS jaccard
      | FROM e a JOIN e b ON a.s = b.s
      |  AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
      | GROUP BY a.doc_id, b.doc_id)
      |WHERE jaccard >= 0.5""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    Dedup.jaccardPairsBetween(
      docs.filter(pmod(col("doc_id"), lit(10)) === 0),
      docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
      "doc_id", "text", threshold = 0.5)
  }

  /** Incremental cluster maintenance (d16): fold the new batch
    * (doc_id % 10 = 0) into the PERSISTED old-corpus clusters without
    * re-clustering the corpus — star edges from the artifact ∪
    * within-batch pairs ∪ batch×corpus pairs (both from d15's
    * machinery; the corpus side is the persisted key tables, never
    * text). The oracle is d07's from-scratch full-corpus recursive
    * CTE, so the gate IS the claim: incremental ≡ rebuild, including
    * batch docs that bridge two old clusters. Per-ingest cost:
    * O(batch LSH + cluster table + delta edges); the old corpus is
    * never re-scanned or re-banded. */
  val d16 = q("d16_incremental_clusters",
    """WITH RECURSIVE d AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
      |pairs AS (
      | SELECT doc_a, doc_b FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |   CAST(COUNT(*) AS DOUBLE) / (min(a.n) + min(b.n) - COUNT(*)) AS jaccard
      |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      | WHERE jaccard >= 0.5),
      |edges AS (
      | SELECT doc_a AS src, doc_b AS dst FROM pairs
      | UNION SELECT doc_b, doc_a FROM pairs),
      |reach(doc_id, r) AS (
      | SELECT src, src FROM edges
      | UNION
      | SELECT re.doc_id, e.dst FROM reach re JOIN edges e ON e.src = re.r)
      |SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val keys = ensureIngestKeys(s, dir)
    val newB = Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
    Dedup.incrementalClusters(
      ensureCorpusClusters(s, dir),
      Dedup.incrementalDeltaPairs(s, newB, keys, "doc_id", "text",
        threshold = 0.5))
  }

  /** Per-source duplication report — the corpus-health scoreboard a
    * data-mix owner reads before weighting sources: for every source,
    * how many docs it contributed, how many of those sit in a near-dup
    * cluster (≥2 members by construction — the cluster table only
    * holds docs with at least one ≥0.5-Jaccard edge), how many
    * distinct clusters its docs touch, and the duplicate rate. Reads
    * the PERSISTED d07 cluster artifact (the d08/d14/p04 discipline) —
    * one narrow join + one aggregation; no LSH, no text. The oracle
    * re-derives clusters from scratch, so the row is end-to-end
    * oracle-exact. 100 TB shape: equi-join on doc_id + a 4-group agg;
    * nothing quadratic, no broadcast risk (both sides partition on
    * doc_id). */
  val d17 = q("d17_dup_rate_by_source",
    """WITH RECURSIVE d AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
      |pairs AS (
      | SELECT doc_a, doc_b FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |   CAST(COUNT(*) AS DOUBLE) / (min(a.n) + min(b.n) - COUNT(*)) AS jaccard
      |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      | WHERE jaccard >= 0.5),
      |edges AS (
      | SELECT doc_a AS src, doc_b AS dst FROM pairs
      | UNION SELECT doc_b, doc_a FROM pairs),
      |reach(doc_id, r) AS (
      | SELECT src, src FROM edges
      | UNION
      | SELECT re.doc_id, e.dst FROM reach re JOIN edges e ON e.src = re.r),
      |assign AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)
      |SELECT doc.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      | CAST(COUNT(a.cluster_id) AS BIGINT) AS n_dup_docs,
      | CAST(COUNT(DISTINCT a.cluster_id) AS BIGINT) AS n_clusters,
      | round(CAST(COUNT(a.cluster_id) AS DOUBLE) / COUNT(*), 6) AS dup_rate
      |FROM documents doc LEFT JOIN assign a ON a.doc_id = doc.doc_id
      |GROUP BY doc.source""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir).select("doc_id", "source")
      .join(ensureClusters(s, dir), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("cluster_id")).as("n_dup_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"))
      .withColumn("dup_rate",
        round(col("n_dup_docs").cast("double") / col("n_docs"), 6))
  }

  // ------------------------------------------- text analysis (LLM pipeline)

  private def markerSql(ws: Seq[String]): String =
    s"CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN (${ws.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)"

  /** Marker-token language ID with deterministic argmax. */
  val t01 = q("t01_langid", {
    val scores = TextAnalysis.markers
      .map { case (l, ws) => s" ${markerSql(ws)} AS s_$l" }.mkString(",\n|")
    val langs = TextAnalysis.markers.map(_._1)
    val caseExpr = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(o => s"s_$o")
      val g = if (rest.size == 1) rest.head else s"greatest(${rest.mkString(", ")})"
      s"WHEN s_$l >= $g THEN '$l'"
    }.mkString(" ")
    s"""SELECT doc_id, ${langs.map(l => s"s_$l").mkString(", ")},
       | CASE $caseExpr ELSE '${langs.last}' END AS predicted
       |FROM (SELECT doc_id,
       |$scores
       |FROM documents)""".stripMargin
  }) { (s, dir) =>
    TextAnalysis.langId(Tables.documents(s, dir), "doc_id", "text")
  }

  /** Quality metrics + boolean gate per document. */
  val t02 = q("t02_quality_score",
    """SELECT doc_id,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
      | CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |   / len(string_split(text, ' ')) AS uniq_ratio,
      | CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |   / len(string_split(text, ' ')) AS avg_tok_len,
      | (len(string_split(text, ' ')) BETWEEN 10 AND 1000)
      |  AND (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |   / len(string_split(text, ' ')) > 0.2) AS is_quality
      |FROM documents""".stripMargin) { (s, dir) =>
    TextAnalysis.quality(Tables.documents(s, dir), "doc_id", "text")
  }

  /** Corpus token statistics by language. */
  val t03 = q("t03_token_stats",
    """SELECT lang, COUNT(*) AS n_tokens_total,
      | COUNT(DISTINCT word) AS n_distinct_tokens,
      | COUNT(DISTINCT doc_id) AS n_docs
      |FROM (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY lang""".stripMargin) { (s, dir) =>
    TextAnalysis.tokenStats(Tables.documents(s, dir), "text", "lang", "doc_id")
  }

  /** Content fingerprint + band prefix per document. */
  val t04 = q("t04_fingerprint",
    s"""SELECT doc_id, substr(md5($normSql), 1, 16) AS fp,
       | substr(md5($normSql), 1, 4) AS band
       |FROM documents""".stripMargin) { (s, dir) =>
    TextAnalysis.fingerprints(Tables.documents(s, dir), "doc_id", "text")
  }

  /** Regex tokenization + rolling-hash fingerprint (integer-exact). */
  val t05 = q("t05_token_rolling",
    """SELECT doc_id,
      | CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_regex_tokens,
      | list_reduce(
      |   list_prepend(CAST(0 AS BIGINT),
      |     list_transform(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'),
      |       t -> CAST(ascii(t) + length(t) AS BIGINT))),
      |   (h, v) -> (h * 131 + v) % 1000000007) AS roll_hash
      |FROM documents""".stripMargin) { (s, dir) =>
    TextAnalysis.tokenRolling(Tables.documents(s, dir), "doc_id", "text")
  }

  /** Char-trigram language ID (the n-gram-profile heuristic). */
  val t06 = q("t06_langid_chargram", {
    val scores = TextAnalysis.charTrigrams.map { case (l, gs) =>
      val set = gs.map(g => s"'${g}'").mkString(", ")
      val n = gs.head.length // grams of each language's marker length
      s" CAST(len(list_filter(list_transform(range(1, greatest(length(lower(text)) - $n + 2, 2)), " +
        s"i -> substr(lower(text), CAST(i AS INT), $n)), g -> g IN ($set))) AS BIGINT) AS g_$l"
    }.mkString(",\n|")
    val langs = TextAnalysis.charTrigrams.map(_._1)
    val caseExpr = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(o => s"g_$o")
      val g = if (rest.size == 1) rest.head else s"greatest(${rest.mkString(", ")})"
      s"WHEN g_$l >= $g THEN '$l'"
    }.mkString(" ")
    s"""SELECT doc_id, ${langs.map(l => s"g_$l").mkString(", ")},
       | CASE $caseExpr ELSE '${langs.last}' END AS predicted
       |FROM (SELECT doc_id,
       |$scores
       |FROM documents)""".stripMargin
  }) { (s, dir) =>
    TextAnalysis.langIdCharNgram(Tables.documentsFanned(s, dir), "doc_id", "text")
  }

  /** Deterministic hash-based dataset splitting (train/val/test by
    * md5(doc_id) nibble) — reproducible across engines and runs. */
  val t07 = q("t07_hash_split",
    """SELECT split, COUNT(*) AS n, min(doc_id) AS min_id FROM (
      | SELECT doc_id,
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd' THEN 'train'
      |   WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'f' THEN 'val'
      |   ELSE 'test' END AS split
      | FROM documents)
      |GROUP BY split""".stripMargin) { (s, dir) =>
    TextAnalysis.hashSplit(Tables.documents(s, dir), "doc_id")
      .groupBy("split")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
  }

  /** Benchmark decontamination: shingle containment of every train doc
    * against a small eval split (doc_id % 50 = 0), eval side broadcast,
    * train corpus never shuffled. Flags the planted duplicate at
    * containment 1.0 plus high-overlap near-misses.
    *
    * Oracle is an inverted-index join (explode shingles, equi-join on
    * the shingle, group-count per pair — both lists are distinct so
    * the collision count IS the intersection size, and zero-overlap
    * pairs can't clear the threshold anyway), not the naive cartesian
    * `FROM tr, ev` + list_intersect: equivalence checked both
    * directions in DuckDB at sf0.001/sf0.01, and the index form runs
    * ~sf1 in seconds where the cartesian is ~4.9B list intersections. */
  val d09 = q("d09_contamination",
    """WITH sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
      |  THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |  ELSE [array_to_string(t, ' ')] END) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |ev AS (SELECT doc_id AS eval_id, len(sh) AS n_ev, unnest(sh) AS s
      | FROM sh WHERE doc_id % 50 = 0),
      |tr AS (SELECT doc_id AS train_id, unnest(sh) AS s
      | FROM sh WHERE doc_id % 50 <> 0)
      |SELECT train_id, eval_id, containment FROM (
      | SELECT train_id, eval_id, CAST(COUNT(*) AS DOUBLE) / min(n_ev) AS containment
      | FROM tr JOIN ev USING (s)
      | GROUP BY train_id, eval_id)
      |WHERE containment >= 0.05""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    Dedup.contamination(
      docs.filter(col("doc_id") % 50 =!= 0), docs.filter(col("doc_id") % 50 === 0),
      "doc_id", "text", shingleN = 3, minContainment = 0.05)
  }

  /** Exact duplicated-substring profile (Lee et al. 2021, substring-
    * level dedup) as an inverted-index pipeline: a position is
    * duplicated when its 8-token gram occurs >= 2 times corpus-wide;
    * overlapping windows merge into maximal spans (gap > k splits —
    * closer windows share covered tokens, so the interval sum is
    * overlap-free and `dup_tokens` is the exact covered-token count).
    * Oracle mirrors the same gram-key dup filter and gaps-and-islands
    * span merge (its keys are raw grams; the engine's are xxhash64
    * longs — equality-only, injective on the corpus, counts agree). */
  val d11 = q("d11_substring_dedup",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |base AS (
      | SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
      |  CAST(CASE WHEN len(t) >= 8 THEN len(t) - 7 ELSE 0 END AS BIGINT) AS n_pos
      | FROM toks),
      |g AS (
      | SELECT doc_id,
      |  CAST(unnest(range(len(t) - 7)) AS BIGINT) AS pos,
      |  unnest(list_transform(range(len(t) - 7),
      |   i -> substr(md5(array_to_string(t[i+1:i+8], ' ')), 1, 16))) AS gkey
      | FROM toks WHERE len(t) >= 8),
      |dupkeys AS (SELECT gkey FROM g GROUP BY gkey HAVING COUNT(*) >= 2),
      |dup AS (SELECT doc_id, pos FROM g WHERE gkey IN (SELECT gkey FROM dupkeys)),
      |flagged AS (
      | SELECT doc_id, pos,
      |  CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 8
      |   THEN 1 ELSE 0 END AS brk
      | FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |spans0 AS (
      | SELECT doc_id, pos,
      |  SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
      | FROM flagged),
      |spans AS (
      | SELECT doc_id, span_id, COUNT(*) AS n_in_span,
      |  MIN(pos) AS p0, MAX(pos) AS p1
      | FROM spans0 GROUP BY doc_id, span_id),
      |per_doc AS (
      | SELECT doc_id, CAST(SUM(n_in_span) AS BIGINT) AS n_dup_pos,
      |  COUNT(*) AS n_spans, CAST(SUM(p1 - p0 + 8) AS BIGINT) AS dup_tokens
      | FROM spans GROUP BY doc_id)
      |SELECT b.doc_id, n_tokens, n_pos,
      | COALESCE(n_dup_pos, CAST(0 AS BIGINT)) AS n_dup_pos,
      | COALESCE(n_spans, CAST(0 AS BIGINT)) AS n_spans,
      | COALESCE(dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
      | CAST(COALESCE(dup_tokens, 0) AS DOUBLE) / n_tokens AS dup_frac
      |FROM base b LEFT JOIN per_doc USING (doc_id)""".stripMargin) { (s, dir) =>
    Dedup.substringDupStats(Tables.documentsFanned(s, dir), "doc_id", "text", k = 8)
  }

  /** Inter-source shingle-overlap matrix (cross-source duplication
    * audit): distinct (source, 3-gram-key) universe, boilerplate cap at
    * 16 sources per key, key-equi self-join → per-pair shared count +
    * Jaccard. The join is on the shingle key with per-key fanout
    * bounded by the cap — linear in distinct shingles, never
    * source×source. */
  val d12 = q("d12_source_overlap",
    """WITH sh AS (SELECT source AS src, CASE WHEN len(t) >= 3
      |  THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |  ELSE [array_to_string(t, ' ')] END AS sh
      | FROM (SELECT source, string_split(text, ' ') AS t FROM documents)),
      |k AS (SELECT DISTINCT src, substr(md5(s), 1, 16) AS gkey
      | FROM (SELECT src, unnest(sh) AS s FROM sh)),
      |c AS (SELECT gkey FROM k GROUP BY gkey HAVING COUNT(*) <= 16),
      |u AS (SELECT src, gkey FROM k WHERE gkey IN (SELECT gkey FROM c)),
      |tot AS (SELECT src, COUNT(*) AS total FROM u GROUP BY src),
      |p AS (SELECT a.src AS src_a, b.src AS src_b, COUNT(*) AS n_shared
      | FROM u a JOIN u b USING (gkey) WHERE a.src < b.src GROUP BY 1, 2)
      |SELECT src_a, src_b, n_shared,
      | round(CAST(n_shared AS DOUBLE) / (ta.total + tb.total - n_shared), 6) AS jacc
      |FROM p JOIN tot ta ON ta.src = p.src_a JOIN tot tb ON tb.src = p.src_b""".stripMargin) {
    (s, dir) =>
      Dedup.sourceOverlap(Tables.documentsFanned(s, dir), "text", "source",
        shingleN = 3, maxSources = 16)
  }

  /** Edit-distance near-dup pairs (Dedup.editDistancePairs): the d03
    * MinHash band join generates candidates, exact Levenshtein over
    * 80-char prefixes verifies them (dist ≤ 20) — the two-phase
    * fuzzy-dedup shape for edits Jaccard can't see. Both engines run
    * classic unit-cost Levenshtein, so the verifier is hash-exact. */
  val d13 = q("d13_editdist_pairs",
    s"""$minhashCandOracleCtes
      |SELECT c.doc_a, c.doc_b,
      | CAST(levenshtein(substr(ta.text, 1, 80), substr(tb.text, 1, 80)) AS BIGINT) AS dist
      |FROM cand c JOIN documents ta ON ta.doc_id = c.doc_a
      | JOIN documents tb ON tb.doc_id = c.doc_b
      |WHERE levenshtein(substr(ta.text, 1, 80), substr(tb.text, 1, 80)) <= 20""".stripMargin) {
    (s, dir) =>
      Dedup.editDistancePairs(Tables.documents(s, dir), "doc_id", "text",
        prefixLen = 80, maxDist = 20)
  }

  /** Stratified corpus re-mixing: deterministic per-language sampling
    * rates (25% en, keep-all zh, 50% elsewhere) via the md5-threshold
    * trick — full row output so the oracle hash-checks exactly which
    * rows survived, not just counts. */
  val t08 = q("t08_stratified_sample",
    """SELECT doc_id, lang, source FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      | CASE lang WHEN 'en' THEN '40' WHEN 'zh' THEN 'zz' ELSE '80' END""".stripMargin) { (s, dir) =>
    TextAnalysis.stratifiedSample(Tables.documents(s, dir), "doc_id", "lang",
        Map("en" -> 0.25, "zh" -> 1.0), defaultRate = 0.5)
      .select("doc_id", "lang", "source")
  }

  /** Repetition profile (Gopher-style repetitive-text gate): per doc,
    * total 3-gram shingles, the most-repeated shingle's count, and the
    * ratio — integer-exact counts, raw (bit-identical) quotient. */
  val t10 = q("t10_repetition",
    """SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_shingles,
      | CAST(MAX(c) AS BIGINT) AS max_repeat,
      | CAST(MAX(c) AS DOUBLE) / SUM(c) AS repeat_ratio
      |FROM (
      | SELECT doc_id, sh, COUNT(*) AS c FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
      | GROUP BY doc_id, sh)
      |GROUP BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.repetition(Tables.documentsFanned(s, dir), "doc_id", "text")
  }

  /** PII-style scrubbing over text with REAL matches. The slimmed test
    * schema carries no phone column (and the documents corpus is
    * digit-free, which would make redaction vacuous), so a phone is
    * synthesized deterministically from c_custkey with integer printf —
    * identical in both engines — next to c_name's 9-digit run. Counts
    * are taken on the original text, masks applied in sequence; the
    * patterns live in the Java/RE2 dialect intersection so the engines
    * agree match-for-match. */
  val t11 = q("t11_redact",
    """SELECT c_custkey AS doc_id,
      | CAST(len(regexp_extract_all(s, '[0-9]{2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
      | CAST(len(regexp_extract_all(s, '[0-9]{3,}')) AS BIGINT) AS n_digits,
      | regexp_replace(regexp_replace(s, '[0-9]{2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
      |  '[0-9]{3,}', '<NUM>', 'g') AS redacted
      |FROM (SELECT c_custkey, c_name || ' ' || printf('%02d-%03d-%04d',
      |  c_custkey % 90 + 10, (c_custkey * 7) % 900 + 100,
      |  (c_custkey * 13) % 9000 + 1000) AS s
      | FROM customer)""".stripMargin) { (s, dir) =>
    val key = col("c_custkey")
    val src = Tables.customer(s, dir).select(key,
      concat_ws(" ", col("c_name"), format_string("%02d-%03d-%04d",
        key % 90 + 10, (key * 7) % 900 + 100, (key * 13) % 9000 + 1000)).as("s"))
    TextAnalysis.redact(src, "c_custkey", "s", Seq(
      ("phone", "[0-9]{2}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
      ("digits", "[0-9]{3,}", "<NUM>")))
  }

  /** Corpus n-gram frequency profile: top-5 trigrams per language
    * (vocabulary/boilerplate stats). Explode → two-level hash agg →
    * top-k window, rank ties broken by the n-gram string. */
  val t12 = q("t12_ngram_topk",
    """SELECT lang, ngram, CAST(n AS BIGINT) AS n, CAST(rn AS BIGINT) AS rn
      |FROM (
      | SELECT lang, ngram, n,
      |  row_number() OVER (PARTITION BY lang ORDER BY n DESC, ngram) AS rn
      | FROM (
      |  SELECT lang, sh AS ngram, COUNT(*) AS n FROM (
      |   SELECT lang, unnest(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |    ELSE [array_to_string(t, ' ')] END) AS sh
      |   FROM (SELECT lang, string_split(text, ' ') AS t FROM documents))
      |  GROUP BY lang, sh))
      |WHERE rn <= 5""".stripMargin) { (s, dir) =>
    TextAnalysis.ngramTopK(Tables.documents(s, dir), "text", "lang", 5)
  }

  /** Sliding-window chunking: 64-token windows every 48 tokens (16-token
    * overlap) — the sequence-prep step before packing. One explode per
    * document; chunk ids positional, so output is partition-invariant. */
  val t13 = q("t13_chunking",
    """SELECT doc_id, s // 48 AS chunk_idx,
      | array_to_string(t[s+1:s+64], ' ') AS chunk,
      | CAST(least(64, len(t) - s) AS BIGINT) AS n_tok
      |FROM (
      | SELECT doc_id, t, unnest(range(0, greatest(len(t), 1), 48)) AS s
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))""".stripMargin) {
    (s, dir) =>
      TextAnalysis.chunk(Tables.documents(s, dir), "doc_id", "text",
        chunkTokens = 64, stride = 48)
  }

  /** Weighted domain mixing: per-language epoch factors (de ×2.25,
    * en ×0.5, others ×1) with the deterministic md5-nibble rule for the
    * fractional copy — the corpus up/down-mixing step of a training
    * run. */
  val t14 = q("t14_weighted_mix",
    """WITH w AS (SELECT doc_id, lang,
      |  CASE lang WHEN 'de' THEN 2.25 WHEN 'en' THEN 0.5 ELSE 1.0 END AS wt
      | FROM documents),
      |c AS (SELECT doc_id, lang,
      |  CAST(floor(wt) AS BIGINT) +
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      |   printf('%02x', CAST(least(255, round((wt - floor(wt)) * 256)) AS INT))
      |  THEN 1 ELSE 0 END AS n FROM w)
      |SELECT doc_id, lang, CAST(unnest(range(n)) AS BIGINT) AS copy FROM c""".stripMargin) {
    (s, dir) =>
      TextAnalysis.weightedMix(Tables.documents(s, dir), "doc_id", "lang",
          Map("de" -> 2.25, "en" -> 0.5), defaultWeight = 1.0)
        .select("doc_id", "lang", "copy")
  }

  /** CCNet/RefinedWeb-style line-level boilerplate dedup: lines
    * recurring in more than 2 docs are dropped from every doc, docs
    * reassembled from the survivors. The corpus has no newlines, so
    * the line unit is position-aligned 8-token chunks
    * (TextAnalysis.tokenChunkLines); production corpora pass
    * newlineLines. */
  val t15 = q("t15_boilerplate_lines",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |lines AS (SELECT doc_id,
      |  unnest(range(CAST(ceil(len(t)/8.0) AS BIGINT))) AS pos,
      |  unnest(list_transform(range(CAST(ceil(len(t)/8.0) AS BIGINT)),
      |    i -> array_to_string(list_slice(t, CAST(i*8+1 AS BIGINT), CAST(i*8+8 AS BIGINT)), ' '))) AS line
      | FROM toks),
      |df AS (SELECT line, COUNT(DISTINCT doc_id) AS n FROM lines GROUP BY line),
      |fl AS (SELECT l.doc_id, l.pos, l.line, df.n FROM lines l JOIN df ON df.line = l.line)
      |SELECT doc_id,
      | CAST(SUM(CASE WHEN n <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      | CAST(SUM(CASE WHEN n > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      | coalesce(string_agg(CASE WHEN n <= 2 THEN line END, ' ' ORDER BY pos), '') AS clean_text
      |FROM fl GROUP BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.dropBoilerplateLines(Tables.documentsFanned(s, dir), "doc_id",
      TextAnalysis.tokenChunkLines(col("text"), 8), maxDocs = 2, joinSep = " ")
  }

  /** CCNet-style bigram-LM quality score: the corpus trains its own
    * bigram model (add-one smoothing), every doc scores its mean
    * bigram log-probability — low scorers are gibberish relative to
    * the corpus distribution. Per-term log-probs round 6dp before the
    * exact-decimal mean so both engines agree bit-for-bit. */
  val t16 = q("t16_lm_score",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
      |  THEN list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
      |  ELSE [array_to_string(t, ' ')] END) AS bigram FROM toks),
      |cu AS (SELECT w, COUNT(*) AS cu FROM
      |  (SELECT unnest(t) AS w FROM toks) GROUP BY w),
      |vocab AS (SELECT COUNT(*) AS v FROM cu),
      |cb AS (SELECT bigram, COUNT(*) AS cb FROM bg GROUP BY bigram),
      |scored AS (SELECT bg.doc_id,
      |  round(ln((cb.cb + 1.0) / (cu.cu + vocab.v)), 6) AS lp
      | FROM bg JOIN cb USING (bigram)
      | JOIN cu ON cu.w = string_split(bg.bigram, ' ')[1]
      | CROSS JOIN vocab)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      | CAST(SUM(CAST(lp AS DECIMAL(30,10))) AS DOUBLE) AS sum_logprob
      |FROM scored GROUP BY doc_id""".stripMargin) { (s, dir) =>
    // dump the exact sum + count; the (derived, unrounded) mean stays
    // an operator output for users but is not hashable cross-engine
    TextAnalysis.bigramLmScore(Tables.documents(s, dir), "doc_id", "text")
      .select("doc_id", "n_bigrams", "sum_logprob")
  }

  /** Tf-idf top-3 terms per doc (keyword extraction), deterministic
    * term tiebreak; idf = ln((N+1)/(df+1)). */
  val t17 = q("t17_tfidf_topk",
    """WITH tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM
      |  (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      | GROUP BY doc_id, term),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |sc AS (SELECT doc_id, term,
      |  round(tf * ln((n.n + 1.0) / (df.df + 1)), 6) AS tfidf
      | FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, term, tfidf,
      | CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
      |   ORDER BY tfidf DESC, term) AS BIGINT) AS rn
      |FROM sc QUALIFY rn <= 3""".stripMargin) { (s, dir) =>
    TextAnalysis.tfidfTopK(Tables.documentsFanned(s, dir), "doc_id", "text", k = 3)
  }

  /** Weighted sampling without replacement, 20 docs per language,
    * weight = token count (longer docs proportionally likelier) — the
    * A-ES reservoir rule with engine-portable md5 uniforms. */
  val t18 = q("t18_weighted_sample",
    """WITH w AS (SELECT doc_id, lang,
      |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS wt,
      |  (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1.0)
      |    / 4503599627370496.0 AS u
      | FROM documents)
      |SELECT doc_id, lang, samp_key, rn FROM (
      | SELECT doc_id, lang, round(-ln(u) / wt, 6) AS samp_key,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |    ORDER BY round(-ln(u) / wt, 6), doc_id) AS BIGINT) AS rn
      | FROM w) WHERE rn <= 20""".stripMargin) { (s, dir) =>
    TextAnalysis.weightedSample(Tables.documents(s, dir), "doc_id", "lang",
        size(TextOps.tokens(col("text"))).cast("double"), k = 20)
      .select("doc_id", "lang", "samp_key", "rn")
  }

  /** Deterministic global shuffle + shard assignment for training-data
    * export (md5-permutation, 8 shards, per-shard ordinal) — the
    * reproducible-training-order layout. One shuffle on the shard key;
    * `shards` is the 100 TB scale knob (see TextAnalysis.shardAssign). */
  val t19 = q("t19_shard_export",
    """SELECT doc_id, shard,
      | CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS seq
      |FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
      |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) % 8 AS shard
      | FROM documents)""".stripMargin) { (s, dir) =>
    TextAnalysis.shardAssign(Tables.documents(s, dir), "doc_id", shards = 8)
      .select("doc_id", "shard", "seq")
  }

  /** Sequence packing: docs → 512-token packs within 8 shards (prefix
    * sum over a bounded window partition), then per-pack occupancy —
    * exercises the full window + re-aggregation pipeline. */
  val t09 = q("t09_sequence_packing",
    """SELECT shard, pack_id, COUNT(*) AS n_docs,
      | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM (
      | SELECT doc_id, doc_id % 8 AS shard,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST((SUM(len(string_split(text, ' ')))
      |    OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
      |   - len(string_split(text, ' '))) // 512 AS BIGINT) AS pack_id
      | FROM documents)
      |GROUP BY shard, pack_id""".stripMargin) { (s, dir) =>
    TextAnalysis.packSequences(Tables.documents(s, dir), "doc_id", "text",
        capacity = 512, shards = 8)
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
  }

  /** The corpus-prep pipeline END TO END as ONE declarative plan:
    * quality gate → exact-dedup keep-one → stratified re-mix → sequence
    * packing → per-pack occupancy. Each stage is individually verified
    * (t02, d02, t08, t09); this query proves they COMPOSE — Catalyst
    * sees a single plan (quality filter pushed below both dedup
    * aggregations, one shuffle per stage key), which is exactly how a
    * production 100 TB prep job should be written: no intermediate
    * materialization, AQE re-plans stage by stage. */
  val p01 = q("p01_corpus_prep",
    s"""WITH quality AS (
       | SELECT doc_id, text, lang FROM documents
       | WHERE (len(string_split(text, ' ')) BETWEEN 10 AND 1000)
       |  AND (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |   / len(string_split(text, ' ')) > 0.2)),
       |keep AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5($normSql)),
       |sampled AS (
       | SELECT q.doc_id, q.text FROM quality q JOIN keep k ON q.doc_id = k.doc_id
       | WHERE substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 2) <
       |  CASE q.lang WHEN 'en' THEN '80' ELSE 'zz' END),
       |packed AS (
       | SELECT doc_id, doc_id % 4 AS shard,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST((SUM(len(string_split(text, ' ')))
       |    OVER (PARTITION BY doc_id % 4 ORDER BY doc_id)
       |   - len(string_split(text, ' '))) // 512 AS BIGINT) AS pack_id
       | FROM sampled)
       |SELECT shard, pack_id, COUNT(*) AS n_docs,
       | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |FROM packed GROUP BY shard, pack_id""".stripMargin) { (s, dir) =>
    // ONE corpus scan: inline quality predicate, then keep-one as a
    // window over the norm-hash (≡ min doc_id per group, without the
    // groupBy + join-back that would re-scan documents)
    val quality = Tables.documents(s, dir)
      .filter(TextAnalysis.qualityPredicate(col("text")))
    val kept = Dedup.keepOneByContent(quality, "doc_id",
      md5(TextOps.normText(col("text"))))
    val sampled = TextAnalysis.stratifiedSample(kept,
      "doc_id", "lang", Map("en" -> 0.5), defaultRate = 1.0)
    TextAnalysis.packSequences(sampled, "doc_id", "text", capacity = 512, shards = 4)
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
  }

  /** Composed MULTIMODAL shard-prep pipeline (the p01 contract for a
    * media corpus): metadata extraction (m01's columnar twin — bytes,
    * content sha, kind), a size gate dropping payload outliers, exact
    * content dedup on the sha (the d02 keep-one rule), deterministic
    * shard assignment (the t19 hash rule), and a per-(kind, shard)
    * manifest. ONE documents scan feeds the whole plan; every stage is
    * a component already oracle-proven on its own query. */
  val p02 = q("p02_media_shard_prep",
    """WITH meta AS (SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |   WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  sha256(text) AS sha
      | FROM documents),
      |sized AS (SELECT * FROM meta WHERE n_bytes BETWEEN 100 AND 500),
      |keep AS (SELECT min(doc_id) AS doc_id FROM sized GROUP BY sha),
      |sharded AS (SELECT s.doc_id, s.kind, s.n_bytes,
      |  CAST(concat('0x', substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 13)) AS BIGINT) % 4 AS shard
      | FROM sized s JOIN keep k ON s.doc_id = k.doc_id)
      |SELECT kind, shard, COUNT(*) AS n_files,
      | CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
      |FROM sharded GROUP BY kind, shard""".stripMargin) { (s, dir) =>
    val meta = Multimodal.metadata(Tables.documents(s, dir))
    val sized = meta.filter(col("n_bytes").between(100, 500))
    val kept = Dedup.keepOneByContent(sized, "doc_id", col("sha"))
    val kind = when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio").otherwise("video")
    // shardOf, not shardAssign: the manifest only buckets, so the
    // shard id stays a pure per-row expression — shardAssign's seq
    // ordinal would add a window shuffled into only `shards` partitions
    kept.groupBy(kind.as("kind"),
        TextAnalysis.shardOf(col("doc_id"), 4).as("shard"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_bytes")).as("total_bytes"))
  }

  // --------------------------------------------- similarity (LLM pipeline)

  /** Brute-force cosine top-5: queries = vec_id < 10 (broadcast side),
    * candidates = the rest. Rank on rounded similarity → deterministic. */
  val s01 = q("s01_cosine_topk",
    """SELECT query_id, neighbor_id, cos, rn FROM (
      | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |    CAST(c.embedding AS DOUBLE[])), 6) AS cos,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |   ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |     CAST(c.embedding AS DOUBLE[])), 6) DESC, c.vec_id) AS BIGINT) AS rn
      | FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id >= 10)
      |WHERE rn <= 5""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    Similarity.bruteForceTopK(
      emb.filter(col("id") < 10), emb.filter(col("id") >= 10), 5)
  }

  /** Per-label centroids (exact decimal mean per dimension). */
  val s02 = q("s02_label_centroids",
    """SELECT label, pos, round(CAST(SUM(CAST(e AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*), 6) AS c
      |FROM (SELECT label, unnest(range(len(embedding))) AS pos,
      |       unnest(CAST(embedding AS DOUBLE[])) AS e FROM embeddings)
      |GROUP BY label, pos""".stripMargin) { (s, dir) =>
    Similarity.labelCentroids(Tables.embeddings(s, dir))
  }

  /** Int8 scalar quantization of every embedding (floor, never round —
    * round() double-rounds cross-engine; straight-line IEEE arithmetic
    * in identical op order on both engines). */
  val s05 = q("s05_quantize_int8",
    """SELECT vec_id, CAST(pos AS BIGINT) AS pos,
      | CAST(CASE WHEN mx = mn THEN 0
      |  ELSE least(floor((x - mn) / (mx - mn) * 255.0), 255.0) END AS BIGINT) AS q,
      | mn, mx
      |FROM (SELECT vec_id, list_min(v) AS mn, list_max(v) AS mx,
      |       unnest(range(len(v))) AS pos, unnest(v) AS x
      |      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings))""".stripMargin) {
    (s, dir) => Similarity.quantizeInt8(Tables.embeddings(s, dir))
  }

  /** Two-stage SQ8 retrieval: int8-dequantized approximate dot keeps a
    * 40-candidate shortlist per query, exact cosine re-ranks to top-5 —
    * the memory-bandwidth pattern of a production vector store, with
    * every arithmetic step engine-identical (floor/least dequant, one
    * op order, rounded scores, id tiebreaks). */
  val s06 = q("s06_quantized_rerank",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
      |d AS (SELECT vec_id, v, CASE WHEN mx = mn THEN v ELSE
      |  list_transform(v, x -> mn + least(floor((x - mn)/(mx - mn)*255.0), 255.0)
      |    *(mx - mn)/255.0) END AS dv FROM m),
      |approx AS (
      | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  round(list_dot_product(q.dv, c.dv), 6) AS approx, q.v AS qv, c.v AS cv
      | FROM d q JOIN d c ON q.vec_id < 10 AND c.vec_id >= 10),
      |short AS (SELECT query_id, neighbor_id, qv, cv FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY approx DESC, neighbor_id) AS arn FROM approx) WHERE arn <= 40),
      |rr AS (SELECT query_id, neighbor_id,
      |  round(list_cosine_similarity(qv, cv), 6) AS cos FROM short)
      |SELECT query_id, neighbor_id, cos,
      | CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
      |FROM rr QUALIFY rn <= 5""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    Similarity.quantizedRerankTopK(
      emb.filter(col("id") < 10), emb.filter(col("id") >= 10),
      k = 5, shortlist = 40)
  }

  /** LSH-bucketed ANN, FULLY oracle-checked: the registered plan runs
    * over the engine-portable md5-derived hyperplane family
    * (Similarity.portablePlanes — the ANN twin of d03's portable
    * MinHash), so DuckDB rebuilds the identical plane matrix, bucket
    * signatures, candidate set, and exact-cosine re-rank bit-for-bit.
    * The production LCG-plane lshTopK stays the fast path (recall
    * asserted vs brute force in SimilaritySpec); only the plane
    * constants differ — the probe plan is shared. */
  val s03 = q("s03_ann_lsh",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |pl AS (SELECT p, list_transform(range(64), d ->
      |  CAST(concat('0x', substr(md5(concat(p, ':', d)), 1, 15)) AS BIGINT)
      |    / 1152921504606846976.0 * 2.0 - 1.0) AS plane
      | FROM range(32) t(p)),
      |bits AS (SELECT e.vec_id, pl.p // 8 AS tbl,
      |  CASE WHEN list_dot_product(e.v, pl.plane) >= 0
      |   THEN CAST(1 AS BIGINT) << CAST(pl.p % 8 AS INT) ELSE CAST(0 AS BIGINT) END AS bit
      | FROM e, pl),
      |sigs AS (SELECT vec_id, tbl, CAST(SUM(bit) AS BIGINT) AS sig
      | FROM bits GROUP BY vec_id, tbl),
      |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      | FROM sigs q JOIN sigs c ON q.tbl = c.tbl AND q.sig = c.sig
      | WHERE q.vec_id < 10 AND c.vec_id >= 10),
      |scored AS (SELECT cand.query_id, cand.neighbor_id,
      |  round(list_cosine_similarity(qe.v, ce.v), 6) AS cos
      | FROM cand JOIN e qe ON qe.vec_id = cand.query_id
      |  JOIN e ce ON ce.vec_id = cand.neighbor_id)
      |SELECT query_id, neighbor_id, cos,
      | CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
      |FROM scored QUALIFY rn <= 5""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    Similarity.lshTopKPortable(emb.filter(col("id") < 10),
      emb.filter(col("id") >= 10), 5, dim = 64)
  }

  // --------------------------------------------- multimodal (LLM pipeline)

  /** Binary-payload metadata path (decode stage itself is ScalaTest-
    * covered; see operators.Multimodal). */
  val m01 = q("m01_multimodal_meta",
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | sha256(text) AS sha,
      | CAST(octet_length(encode(text)) % 512 + 16 AS BIGINT) AS fake_width,
      | CAST(octet_length(encode(text)) % 384 + 16 AS BIGINT) AS fake_height
      |FROM documents""".stripMargin) { (s, dir) =>
    Multimodal.metadata(Tables.documents(s, dir))
  }

  /** The typed partition-wise DECODE path itself (mapPartitions over
    * Dataset[MediaFile]), hash-checked end-to-end: every FakeCodec
    * output except brightness is byte-arithmetic the oracle reproduces
    * in SQL. Proves the executor-side codec plumbing — not just the
    * column metadata twin — computes what it claims. */
  val m02 = q("m02_multimodal_decode",
    """SELECT doc_id AS media_id,
      | CASE WHEN doc_id % 3 = 0 THEN 'image'
      |      WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | sha256(text) AS sha,
      | CAST(octet_length(encode(text)) % 512 + 16 AS BIGINT) AS width,
      | CAST(octet_length(encode(text)) % 384 + 16 AS BIGINT) AS height,
      | CAST(CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) % 30 + 1
      |      ELSE 1 END AS BIGINT) AS n_frames
      |FROM documents""".stripMargin) { (s, dir) =>
    implicit val sp: SparkSession = s
    Multimodal.decodeFeatures(Multimodal.asMedia(Tables.documents(s, dir)))
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("sha"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"))
  }

  /** Frame sampling (flatMap over the payload, stride 2 of 16-byte
    * chunks): per-media sampled-frame count and last sampled index,
    * both reproducible from byte lengths in the oracle. */
  val m03 = q("m03_frame_sample",
    """SELECT doc_id AS media_id,
      | CAST((GREATEST(octet_length(encode(text)) // 16, 1) + 1) // 2 AS BIGINT) AS n_sampled,
      | CAST(2 * ((GREATEST(octet_length(encode(text)) // 16, 1) - 1) // 2) AS BIGINT) AS last_idx
      |FROM documents""".stripMargin) { (s, dir) =>
    implicit val sp: SparkSession = s
    Multimodal.sampleFrames(Multimodal.asMedia(Tables.documents(s, dir)))
      .toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_sampled"),
        max(col("frame_idx")).cast("long").as("last_idx"))
  }


  /** Cumulative (running) aggregation per key — unbounded-preceding
    * frame, exact decimal running sum. */
  val q26 = q("q26_running_total",
    """SELECT user_id, event_id,
      | CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_value,
      | CAST(COUNT(*) OVER w AS BIGINT) AS running_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      | ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.events(s, dir).select(col("user_id"), col("event_id"),
      sum(col("value").cast(Exact.M)).over(w).cast("double").as("running_value"),
      count(lit(1)).over(w).cast("long").as("running_n"))
  }

  /** Changelog compaction: drop rows whose value repeats the key's
    * previous row — an event stream reduced to its minimal change log
    * (CDC/feature-store upsert compaction). */
  val q58 = q("q58_compaction",
    """SELECT user_id, event_id, value FROM (
      | SELECT user_id, event_id, value,
      |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      | FROM events)
      |WHERE prev IS NULL OR prev <> value""".stripMargin) { (s, dir) =>
    Relational.compact(Tables.events(s, dir),
        Seq(col("user_id")), Seq(col("ts"), col("event_id")), col("value"))
      .select("user_id", "event_id", "value")
  }

  /** Offset window functions: lag/lead deltas per key. */
  val q27 = q("q27_lag_lead",
    """SELECT user_id, event_id,
      | lag(value) OVER w AS prev_value,
      | lead(value) OVER w AS next_value,
      | value - lag(value) OVER w AS delta
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir).select(col("user_id"), col("event_id"),
      lag(col("value"), 1).over(w).as("prev_value"),
      lead(col("value"), 1).over(w).as("next_value"),
      (col("value") - lag(col("value"), 1).over(w)).as("delta"))
  }

  /** Ranking family beyond row_number: dense_rank + ntile buckets. */
  val q28 = q("q28_rank_ntile",
    """SELECT o_custkey, o_orderkey,
      | CAST(dense_rank() OVER w AS BIGINT) AS drk,
      | CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey"),
      dense_rank().over(w).cast("long").as("drk"),
      ntile(4).over(w).cast("long").as("quartile"))
  }

  /** As-of join (trade→latest quote at or before the trade time),
    * via the single-shuffle union+carry-forward operator. Oracle uses
    * the SQL engine's native ASOF JOIN — same inclusive semantics. */
  val q30 = q("q30_asof_join", asofSql) { (s, dir) =>
    val (trades, quotes) = asofInputs(s, dir)
    AsOfJoin.asOf(trades, quotes, Seq("user_id"), "ts", "ts",
        Map("q_event_id" -> "quote_event_id", "value" -> "quote_value"))
      .select("event_id", "user_id", "quote_event_id", "quote_value")
  }

  /** Broadcast as-of join: the quote side packs into per-key sorted
    * arrays and broadcasts; trades are probed with a codegen'd binary
    * search — the facts never shuffle (the 100 TB plan when the
    * reference side is bounded). Same oracle as q30/q36. */
  val q57 = q("q57_asof_broadcast", asofSql) { (s, dir) =>
    val (trades, quotes) = asofInputs(s, dir)
    AsOfJoin.asOfBroadcast(trades, quotes, Seq("user_id"), "ts", "ts",
        Map("q_event_id" -> "quote_event_id", "value" -> "quote_value"))
      .select("event_id", "user_id", "quote_event_id", "quote_value")
  }

  /** SQL entry path (TPC-H Q5 shape): the engine's surface is also
    * plain `spark.sql` over registered views — same Catalyst plan as
    * the DataFrame API, verified against the identical oracle text. */
  // bound ONCE and passed to both the oracle and s.sql — two inline
  // copies would drift independently and silently break the "verified
  // against the identical oracle text" guarantee
  private val q31Sql =
    s"""SELECT n_name,
      | ${dsumLSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      | COUNT(*) AS n
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin
  val q31 = q("q31_sql_nation_revenue", q31Sql) { (s, dir) =>
    Tables.all.foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
    s.sql(q31Sql)
  }

  /** LATERAL correlated subquery (SQL:1999 lateral derived table) —
    * per-nation top-2 customers by balance, the "for each outer row run
    * this subquery" verb. Catalyst decorrelates it into a ranked join
    * (DecorrelateInnerQuery), so the executed plan is the same
    * window-topk shape as q05 — no nested-loop per-row execution. */
  private val q69Sql =
    """SELECT n_name, t.c_custkey, t.c_acctbal, t.rn
      |FROM nation, LATERAL (
      |  SELECT c_custkey, c_acctbal,
      |    CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
      |  FROM customer WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin
  val q69 = q("q69_lateral_topk", q69Sql) { (s, dir) =>
    Seq("nation", "customer").foreach(t =>
      Tables(s, dir, t).createOrReplaceTempView(t))
    s.sql(q69Sql)
  }

  /** Embedding-cosine near-duplicate pairs (threshold on the rounded
    * cosine so both engines make identical inclusion decisions). The
    * registered plan generates candidates from hyperplane-LSH buckets
    * (equi-join on the bucket key, no cartesian product) and re-ranks
    * with the exact cosine; the oracle is the full pairwise join.
    * Equality holds because the LSH parameters are sized for recall=1
    * at this threshold (asserted vs brute force in SimilaritySpec). */
  val d06 = q("d06_dedup_embedding",
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |   CAST(b.embedding AS DOUBLE[])), 6) AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |   CAST(b.embedding AS DOUBLE[])), 6) > 0.45""".stripMargin) { (s, dir) =>
    Similarity.embeddingNearDupPairsLsh(Tables.embeddingsFanned(s, dir), 0.45, dim = 64)
  }

  /** IVF-probed ANN, FULLY oracle-checked: the index is built with the
    * engine-portable md5 id-order init (Similarity.ivfIndex
    * portableInit) and exact-decimal centroid means, so DuckDB re-derives
    * the identical k-means (2 unrolled Lloyd rounds: assign by the same
    * |c|² − 2·v·c argmin, update by the same DECIMAL(30,10) mean,
    * empty lists keeping their previous centroid), the identical
    * posting-list assignment, and the identical nProbe=4 probe +
    * exact-cosine re-rank. The registered plan PROBES a persisted
    * index: `ensureIvfIndex` builds + saves it (assignments bucketed
    * by centroid id) only on first touch per session/SF — Bench's
    * prepare step does that before timing — so the measured path is
    * the production probe, not index construction. */
  // The portable-IVF oracle prelude shared by s04 and s07: 2 unrolled
  // Lloyd rounds from the md5 id-order init, ending in `af` = the
  // final (vec_id, v, cid) posting assignment. ONE definition — two
  // inline copies would drift and break the "same index" guarantee.
  private val ivfOracleCtes =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |corp AS (SELECT vec_id, v FROM e WHERE vec_id >= 10),
      |qs AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
      |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS BIGINT) AS cid, v
      | FROM (SELECT vec_id, v FROM corp ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16)),
      |a1 AS (SELECT vec_id, v, cid FROM (
      | SELECT corp.vec_id, corp.v, c.cid,
      |  ROW_NUMBER() OVER (PARTITION BY corp.vec_id
      |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(corp.v, c.v), c.cid) AS r
      | FROM corp, c0 c) WHERE r = 1),
      |u1 AS (SELECT cid, pos, CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / COUNT(x) AS cv
      | FROM (SELECT cid, unnest(range(len(v))) AS pos, unnest(v) AS x FROM a1)
      | GROUP BY cid, pos),
      |c0e AS (SELECT cid, unnest(range(len(v))) AS pos, unnest(v) AS x FROM c0),
      |c1 AS (SELECT c0e.cid, list(coalesce(u1.cv, c0e.x) ORDER BY c0e.pos) AS v
      | FROM c0e LEFT JOIN u1 ON u1.cid = c0e.cid AND u1.pos = c0e.pos
      | GROUP BY c0e.cid),
      |a2 AS (SELECT vec_id, v, cid FROM (
      | SELECT corp.vec_id, corp.v, c.cid,
      |  ROW_NUMBER() OVER (PARTITION BY corp.vec_id
      |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(corp.v, c.v), c.cid) AS r
      | FROM corp, c1 c) WHERE r = 1),
      |u2 AS (SELECT cid, pos, CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / COUNT(x) AS cv
      | FROM (SELECT cid, unnest(range(len(v))) AS pos, unnest(v) AS x FROM a2)
      | GROUP BY cid, pos),
      |c1e AS (SELECT cid, unnest(range(len(v))) AS pos, unnest(v) AS x FROM c1),
      |c2 AS (SELECT c1e.cid, list(coalesce(u2.cv, c1e.x) ORDER BY c1e.pos) AS v
      | FROM c1e LEFT JOIN u2 ON u2.cid = c1e.cid AND u2.pos = c1e.pos
      | GROUP BY c1e.cid),
      |af AS (SELECT vec_id, v, cid FROM (
      | SELECT corp.vec_id, corp.v, c.cid,
      |  ROW_NUMBER() OVER (PARTITION BY corp.vec_id
      |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(corp.v, c.v), c.cid) AS r
      | FROM corp, c2 c) WHERE r = 1)""".stripMargin

  val s04 = q("s04_ann_ivf",
    s"""$ivfOracleCtes,
      |probe AS (SELECT vec_id AS query_id, cid FROM (
      | SELECT qs.vec_id, c.cid,
      |  ROW_NUMBER() OVER (PARTITION BY qs.vec_id
      |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(qs.v, c.v), c.cid) AS r
      | FROM qs, c2 c) WHERE r <= 4),
      |scored AS (SELECT p.query_id, af.vec_id AS neighbor_id,
      |  round(list_cosine_similarity(qe.v, af.v), 6) AS cos
      | FROM probe p JOIN af ON af.cid = p.cid JOIN e qe ON qe.vec_id = p.query_id)
      |SELECT query_id, neighbor_id, cos,
      | CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
      |FROM scored QUALIFY rn <= 5""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val model = Similarity.ensureIvfIndex(s, ivfIndexName(dir),
      emb.filter(col("id") >= 10), nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)))
    Similarity.ivfTopK(emb.filter(col("id") < 10), model, k = 5, nProbe = 4)
  }

  /** Contrastive-pair mining (embedding-training prep): per query the
    * exact top-1 positive plus up to 4 hard negatives from the
    * [0.1, 0.35) cosine band — deterministic, fully oracle-checked. */
  val s08 = q("s08_contrastive_pairs",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  round(list_cosine_similarity(q.v, c.v), 6) AS cos
      | FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id >= 10),
      |pos AS (SELECT query_id, neighbor_id, cos, 'pos' AS role,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
      | FROM sc QUALIFY rn = 1),
      |neg AS (SELECT query_id, neighbor_id, cos, 'neg' AS role,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
      | FROM sc WHERE cos >= 0.1 AND cos < 0.35 QUALIFY rn <= 4)
      |SELECT * FROM pos UNION ALL SELECT * FROM neg""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    Similarity.contrastivePairs(emb.filter(col("id") < 10),
      emb.filter(col("id") >= 10), k = 4, negLo = 0.1, negHi = 0.35)
  }

  /** Recursive CTE (SQL:1999 WITH RECURSIVE, Spark 4's UnionLoop):
    * per-customer order chains walked in date order, accumulating a
    * running total — one recursive step per chain position, linear
    * rows (every row has exactly one successor), depth = max orders
    * per customer (25 at every shipped/replicated SF, far under
    * Spark's 100-level default). The accumulator is a scaled BIGINT
    * (the dsumL discipline) so the recursion's row type is fixed and
    * engine-exact. Scale note: recursion materializes one iteration
    * per level — for deep/cyclic graphs use the pointer-jumping d07
    * operator; this is the bounded-depth SQL verb. Cost structure,
    * measured (local[8]): ~90 ms/level FIXED driver overhead
    * (UnionLoop re-plans + re-codegens each step: 2.2 s at sf0.001's
    * 1,500 rows, same 25 levels) plus the data-bound probe (~2.5 s
    * more at sf0.1; the 4-CPU bench config lands ~6.5 s total) — so
    * wall-clock is depth-dominated at small SF and data-dominated at
    * scale, where the per-level join is a broadcast probe of the
    * materialized frontier. */
  private val q70Sql =
    """WITH RECURSIVE seqd AS (
      | SELECT o_custkey, o_orderkey,
      |  CAST(ROUND(o_totalprice * 10000.0) AS BIGINT) AS price_l,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
      | FROM orders),
      |chain(o_custkey, o_orderkey, rn, running_l) AS (
      | SELECT o_custkey, o_orderkey, rn, price_l FROM seqd WHERE rn = 1
      | UNION ALL
      | SELECT s.o_custkey, s.o_orderkey, s.rn, c.running_l + s.price_l
      | FROM chain c JOIN seqd s
      |  ON s.o_custkey = c.o_custkey AND s.rn = c.rn + 1)
      |SELECT o_custkey, o_orderkey, rn,
      | CAST(running_l AS DOUBLE) / 10000.0 AS running
      |FROM chain""".stripMargin
  /** q70's exact frontier count (number of rn=1 rows = customers),
    * memoized per (dir, source fingerprint) so repeated executions —
    * bench warm+timed runs, spec reruns — pay the gate's count() job
    * ONCE instead of per run. Only the COUNT is cached, never the
    * checkpointed DataFrame: the bench/verify harness unpersists all
    * checkpoint blocks between runs, so a cached frame would resolve
    * to CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on its second use. The
    * fingerprint makes in-place testdata regeneration recount instead
    * of serving a stale bound (the DerivedTables discipline, in-memory
    * flavor). Keyed by DIR with the fingerprint stored in the VALUE:
    * a regeneration REPLACES the stale entry instead of accumulating
    * one per fingerprint, and the Spark count job runs OUTSIDE the map
    * (plain get, then put), never inside a ConcurrentHashMap bin
    * lock. */
  private val q70FrontierCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]
  val q70 = q("q70_recursive_chains", q70Sql) { (s, dir) =>
    // every chain row passes through the recursion, so the ROW limit
    // must scale with the input (the LEVEL limit stays at its safe
    // default — depth is 25 at every SF); 1e9 covers ~sf100
    s.conf.set("spark.sql.cteRecursionRowLimit", "1000000000")
    // materialize the ranked chain table ONCE: left inside the
    // recursive query, the seqd CTE (a window over the full orders
    // scan) is re-evaluated at EVERY recursion level — 25 redundant
    // window passes, measured 11.4 s -> 3.4 s at sf0.1. The per-level
    // join probes it broadcast (one map pass per frontier). For plain
    // running totals the production shape is the q26 window sum — q70
    // exists to exercise WITH RECURSIVE (UnionLoop) itself.
    val fp = graft.sources.DerivedTables.sourceFingerprint(dir, "orders")
    val seqd = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      // r18: every recursion LEVEL maps once over this table probing
      // the broadcast frontier — with the window's shuffle.partitions
      // partitioning that was levels × partitions near-empty tasks
      // (25 × 32 at sf0.1; task overhead, not work). Coalesce the
      // checkpoint to a handful of level-pass partitions; the conf
      // (default cores/4) scales the per-level pass back up when the
      // per-partition slice of orders stops being trivial.
      // toIntOption + clamp: a malformed or non-positive conf value
      // falls back to the scale-adaptive default instead of blowing up
      // coalesce() at runtime
      val levelParts = s.conf
        .getOption("spark.graft.q70.seqdPartitions")
        .flatMap(_.toIntOption).filter(_ >= 1)
        .getOrElse(math.max(1, s.sparkContext.defaultParallelism / 4))
      // r19: cum_l (per-customer prefix sum, same window pass as rn —
      // integer adds, so it equals the recursion's accumulation
      // bit-for-bit) lets each recursion level emit a RANGE of
      // positions without chaining additions, which is what makes the
      // stride-K walk below possible.
      Tables(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice") * 10000.0).cast("long").as("price_l"),
          row_number().over(w).cast("long").as("rn"),
          sum(round(col("o_totalprice") * 10000.0).cast("long")).over(w)
            .as("cum_l"))
        .coalesce(levelParts)
        .localCheckpoint(false)
    }
    val frontierRows = q70FrontierCache.get(dir) match {
      case (`fp`, n) => n
      case _ =>
        val n = seqd.where(col("rn") === 1).count()
        q70FrontierCache.put(dir, (fp, n))
        n
    }
    seqd.createOrReplaceTempView("seqd")
    // The BROADCAST(c) hint is CONDITIONAL on the frontier actually
    // fitting a broadcast: the frontier is <= one row (~32 B) per
    // customer per level, and the rn=1 count over the already-
    // materialized checkpoint is an exact, cheap bound on it. Measured
    // safe through the 100x sweep (1.5M-row frontier); past the limit
    // (default 4M rows ~ a few hundred MB) the hint is dropped and
    // each level runs a shuffle join instead of an executor-OOM-risk
    // broadcast — the behavior a 100 TB plan needs. Both sides of the
    // gate are exercised by PlanShapeSpec (limit=1 forces the shuffle
    // path and the result must still match the broadcast path).
    val frontierLimit = s.conf.getOption("spark.graft.q70.broadcastFrontierLimit")
      .map(_.toLong).getOrElse(4000000L)
    val hint = if (frontierRows <= frontierLimit) "/*+ BROADCAST(c) */ " else ""
    // STRIDE-K recursion (r19, VERDICT #8): each level's join emits K
    // chain positions per customer (range probe of the frontier; the
    // running total reads the precomputed prefix sum, so no per-step
    // chaining is needed) and only the (c.rn + K)th row advances the
    // frontier (`adv`). Every recursion level is a FULL pass over
    // seqd, so stride K cuts the pass count — and the per-level
    // UnionLoop plan/schedule floor — from depth to ceil(depth/K):
    // measured 3.3 s → 0.67 s at sf0.1 (depth 25, K=5, 32c), rows
    // exactly identical (Scratch _q70_stride, 3-rep + collect
    // compare; integer prefix sums are associative, so cum_l ≡ the
    // chained accumulation bit-for-bit). K=5 keeps ≥ 5 genuine
    // UnionLoop iterations at every SF (depth is 25 everywhere);
    // K=1 reproduces the classic one-step walk.
    val stride = s.conf.getOption("spark.graft.q70.stride")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(5)
    s.sql(
      s"""WITH RECURSIVE chain(o_custkey, o_orderkey, rn, running_l, adv) AS (
        | SELECT o_custkey, o_orderkey, rn, cum_l, true FROM seqd WHERE rn = 1
        | UNION ALL
        | SELECT ${hint}s.o_custkey, s.o_orderkey, s.rn, s.cum_l,
        |  s.rn = c.rn + $stride
        | FROM chain c JOIN seqd s
        |  ON s.o_custkey = c.o_custkey AND c.adv
        |  AND s.rn BETWEEN c.rn + 1 AND c.rn + $stride)
        |SELECT o_custkey, o_orderkey, rn,
        | CAST(running_l AS DOUBLE) / 10000.0 AS running
        |FROM chain""".stripMargin)
  }

  /** Windowed DISTINCT count — the verb Spark's WindowExec doesn't
    * accept directly (`COUNT(DISTINCT) OVER` is unsupported), expressed
    * the idiomatic way: `size(collect_set(x)) OVER (PARTITION BY ...)`.
    * Each lineitem row carries the number of distinct suppliers on its
    * order. The oracle is the relational equivalent (per-order distinct
    * aggregate joined back), which also documents the rewrite a
    * cost-conscious 100 TB plan would prefer when ONLY the partition
    * total is needed; the window form exists for plans already paying
    * the partition sort that want the value per-row without a join. */
  val q74 = q("q74_window_distinct",
    """SELECT l.l_orderkey, l.l_linenumber, d.n_supp
      |FROM lineitem l JOIN (
      | SELECT l_orderkey, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
      | FROM lineitem GROUP BY 1) d ON d.l_orderkey = l.l_orderkey""".stripMargin) {
    (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
      Tables.lineitemFanned(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          size(collect_set(col("l_suppkey")).over(w)).cast("long").as("n_supp"))
  }

  /** Bloom-pruned large×large join (Relational.bloomPruneJoin):
    * lineitem joins a selectively-filtered orders slice whose key set
    * is sketched into a bloom filter; the fact side is pruned by a
    * native membership probe BEFORE its shuffle, and the exact join
    * removes the sketch's false positives — same technique as Spark's
    * conf-driven InjectRuntimeFilter, declared explicitly. The oracle
    * is the plain join: the bloom changes shuffle volume, never the
    * result. */
  val q71 = q("q71_bloom_join",
    s"""SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       | CAST(EXTRACT(MONTH FROM o.o_orderdate) AS BIGINT) AS o_month,
       | COUNT(*) AS n_items,
       | ${dsumMSql("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue
       |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
       |WHERE o.o_orderpriority = '1-URGENT'
       |  AND o.o_orderdate >= DATE '1997-01-01'
       |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    // the filtered dim slice is read THREE times (sizing count, sketch
    // aggregate, the join itself) — materialize it once; it's the
    // small side by construction
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-01-01").cast("date"))
      .select("o_orderkey", "o_orderdate")
      .localCheckpoint(false)
    // sketch sizing wants the true key count — a row count of the
    // already-materialized slice
    val nKeys = math.max(o.count(), 1L)
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    Relational.bloomPruneJoin(li, o, "l_orderkey", "o_orderkey", nKeys)
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(count(lit(1)).as("n_items"),
        dsumM(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
  }

  /** MapType + higher-order map functions (the one SURVEY §1 type gap
    * left): per-user event-type counts pivoted into a map column
    * (map_from_entries), totalled with a lambda fold over map_values
    * (`aggregate`), and exploded back to rows. The map is internal
    * plan state — the oracle sees only the exploded relational form,
    * so cross-engine map representation differences never matter.
    * Per-user maps are bounded by the event-type vocabulary (tiny), so
    * the collect_list is safe at any corpus size. */
  val q72 = q("q72_map_funcs",
    """SELECT user_id, event_type, cnt,
      | round(CAST(cnt AS DOUBLE) / total, 6) AS share
      |FROM (SELECT user_id, event_type, COUNT(*) AS cnt,
      |   SUM(COUNT(*)) OVER (PARTITION BY user_id) AS total
      |  FROM events GROUP BY 1, 2)""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(map_from_entries(
        collect_list(struct(col("event_type"), col("cnt")))).as("m"))
      .select(col("user_id"),
        aggregate(map_values(col("m")), lit(0L), (acc, x) => acc + x)
          .as("total"),
        explode(col("m")).as(Seq("event_type", "cnt")))
      .select(col("user_id"), col("event_type"), col("cnt"),
        round(col("cnt").cast("double") / col("total"), 6).as("share"))
  }

  /** Dynamic partition pruning over the date-partitioned events
    * layout (ensureEventsByDate): the day list to process arrives as a
    * JOINED relation — in production a control table of pending dates,
    * here a deterministic md5-sample of the distinct days so the
    * oracle re-derives it — and Spark prunes the fact scan to exactly
    * those partitions at RUNTIME via the broadcast-reused dim
    * (`PartitionFilters: dynamicpruningexpression(...)`, plan-locked).
    * The 100 TB point: a static date predicate can't express "the days
    * some other table names", but the partitioned layout + DPP gives
    * the same scan-only-what-matters behavior for join-driven day
    * selection. */
  val q73 = q("q73_dpp",
    s"""WITH busy AS (SELECT DISTINCT CAST(ts AS DATE) AS event_date
       | FROM events WHERE substr(md5(CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 1) < '8')
       |SELECT e.event_date, COUNT(*) AS n_events,
       | ${dsumMSql("e.value")} AS sum_value
       |FROM (SELECT CAST(ts AS DATE) AS event_date, value FROM events) e
       |JOIN busy USING (event_date)
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    val t = ensureEventsByDate(s, dir)
    val busy = t.select("event_date").distinct()
      .filter(substring(md5(col("event_date").cast("string").cast("binary")),
        1, 1) < "8")
    t.join(busy, "event_date")
      .groupBy("event_date")
      .agg(count(lit(1)).as("n_events"), dsumM(col("value")).as("sum_value"))
  }

  /** One product-quantization subspace's oracle CTE block: the s04
    * unrolled-Lloyd pattern applied to the slice v[lo:hi] — identical
    * seed rule (first k by md5(vec_id)), assignment tie-break, exact
    * decimal centroid means, and empty-cluster carry. */
  private def pqSubCtes(s: Int, k: Int, subDim: Int,
                        src: String = "e"): String = {
    val lo = s * subDim + 1; val hi = (s + 1) * subDim
    s"""sub$s AS (SELECT vec_id, v[$lo:$hi] AS v FROM $src),
       |c0_$s AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS BIGINT) AS cid, v
       | FROM (SELECT vec_id, v FROM sub$s ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $k)),
       |a1_$s AS (SELECT vec_id, v, cid FROM (
       | SELECT t.vec_id, t.v, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY t.vec_id
       |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(t.v, c.v), c.cid) AS r
       | FROM sub$s t, c0_$s c) WHERE r = 1),
       |u1_$s AS (SELECT cid, pos, CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / COUNT(x) AS cv
       | FROM (SELECT cid, unnest(range(len(v))) AS pos, unnest(v) AS x FROM a1_$s)
       | GROUP BY cid, pos),
       |c0e_$s AS (SELECT cid, unnest(range(len(v))) AS pos, unnest(v) AS x FROM c0_$s),
       |c1_$s AS (SELECT c0e_$s.cid, list(coalesce(u1_$s.cv, c0e_$s.x) ORDER BY c0e_$s.pos) AS v
       | FROM c0e_$s LEFT JOIN u1_$s ON u1_$s.cid = c0e_$s.cid AND u1_$s.pos = c0e_$s.pos
       | GROUP BY c0e_$s.cid),
       |a2_$s AS (SELECT vec_id, v, cid FROM (
       | SELECT t.vec_id, t.v, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY t.vec_id
       |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(t.v, c.v), c.cid) AS r
       | FROM sub$s t, c1_$s c) WHERE r = 1),
       |u2_$s AS (SELECT cid, pos, CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / COUNT(x) AS cv
       | FROM (SELECT cid, unnest(range(len(v))) AS pos, unnest(v) AS x FROM a2_$s)
       | GROUP BY cid, pos),
       |c1e_$s AS (SELECT cid, unnest(range(len(v))) AS pos, unnest(v) AS x FROM c1_$s),
       |c2_$s AS (SELECT c1e_$s.cid, list(coalesce(u2_$s.cv, c1e_$s.x) ORDER BY c1e_$s.pos) AS v
       | FROM c1e_$s LEFT JOIN u2_$s ON u2_$s.cid = c1e_$s.cid AND u2_$s.pos = c1e_$s.pos
       | GROUP BY c1e_$s.cid),
       |af_$s AS (SELECT vec_id, CAST($s AS BIGINT) AS subspace, cid AS code FROM (
       | SELECT t.vec_id, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY t.vec_id
       |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(t.v, c.v), c.cid) AS r
       | FROM sub$s t, c2_$s c) WHERE r = 1)""".stripMargin
  }

  /** Product quantization, fully oracle-checked: four independent
    * 16-d subspace codebooks (portable-init k-means, 2 Lloyd rounds)
    * re-derived bit-for-bit in DuckDB via the s04 unrolled-Lloyd
    * pattern per slice. */
  val s10 = q("s10_product_quantize", {
    val blocks = (0 until 4).map(s => pqSubCtes(s, k = 8, subDim = 16))
    val union = (0 until 4).map(s => s"SELECT * FROM af_$s").mkString(" UNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${blocks.mkString(",\n")}
       |$union""".stripMargin
  }) { (s, dir) =>
    Similarity.productQuantize(Tables.embeddings(s, dir), m = 4, k = 8,
      iters = 2, dim = 64)
  }

  /** PQ-ADC two-stage retrieval, fully oracle-checked: codebooks
    * trained on the corpus slice (s10 machinery over `corp`), corpus
    * scored through its codes against per-query lookup dots, 40-deep
    * shortlist on the rounded approx score, exact-cosine top-5 rerank
    * (the s06 contract with PQ codes instead of SQ8 bytes). */
  val s11 = q("s11_pq_rerank", {
    val blocks = (0 until 4).map(s => pqSubCtes(s, k = 8, subDim = 16, src = "corp"))
    val scs = (0 until 4).map { s =>
      val lo = s * 16 + 1; val hi = (s + 1) * 16
      s"""sc_$s AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         |  list_dot_product(q.v[$lo:$hi], c.v) AS d
         | FROM qs q, af_$s a JOIN c2_$s c ON c.cid = a.code)""".stripMargin
    }
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |corp AS (SELECT vec_id, v FROM e WHERE vec_id >= 10),
       |qs AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
       |${blocks.mkString(",\n")},
       |${scs.mkString(",\n")},
       |approx AS (SELECT sc_0.query_id, sc_0.neighbor_id,
       |  round(sc_0.d + sc_1.d + sc_2.d + sc_3.d, 6) AS approx
       | FROM sc_0 JOIN sc_1 USING (query_id, neighbor_id)
       |  JOIN sc_2 USING (query_id, neighbor_id)
       |  JOIN sc_3 USING (query_id, neighbor_id)),
       |short AS (SELECT query_id, neighbor_id FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY approx DESC, neighbor_id) AS arn FROM approx) WHERE arn <= 40),
       |rr AS (SELECT s.query_id, s.neighbor_id,
       |  round(list_cosine_similarity(qe.v, ce.v), 6) AS cos
       | FROM short s JOIN e qe ON qe.vec_id = s.query_id
       |  JOIN e ce ON ce.vec_id = s.neighbor_id)
       |SELECT query_id, neighbor_id, cos,
       | CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |   ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
       |FROM rr QUALIFY rn <= 5""".stripMargin
  }) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val model = Similarity.ensurePqModel(s, pqModelName(dir),
      emb.filter(col("id") >= 10)
        .select(col("id").as("vec_id"), col("vec").as("embedding")),
      m = 4, k = 8, iters = 2, dim = 64, fingerprint = Some(embFp(dir)))
    Similarity.pqRerankTopK(emb.filter(col("id") < 10),
      emb.filter(col("id") >= 10), k = 5, shortlist = 40,
      model = Some(model))
  }

  /** IVF-ADC (Jégou et al. 2011) — the billion-scale ANN composition
    * of the s04 coarse quantizer and the s10 product codes, fully
    * oracle-checked: queries probe 4 of 16 IVF cells, candidates
    * inside the probed cells score through per-query ADC lookup
    * tables (no corpus-side vector math), 40-deep shortlist on the
    * rounded approx score, exact-cosine top-5 rerank on the fetched
    * shortlist. The scoring pass reads only the bucketed
    * (cid, codes) posting table built once in `prepare`. */
  val s12 = q("s12_ivfadc", {
    val blocks = (0 until 4).map(s => pqSubCtes(s, k = 8, subDim = 16, src = "corp"))
    val scs = (0 until 4).map { s =>
      val lo = s * 16 + 1; val hi = (s + 1) * 16
      s"""sc_$s AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         |  list_dot_product(q.v[$lo:$hi], c.v) AS d
         | FROM qs q, af_$s a JOIN c2_$s c ON c.cid = a.code)""".stripMargin
    }
    s"""$ivfOracleCtes,
       |${blocks.mkString(",\n")},
       |${scs.mkString(",\n")},
       |probe AS (SELECT vec_id AS query_id, cid FROM (
       | SELECT qs.vec_id, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY qs.vec_id
       |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(qs.v, c.v), c.cid) AS r
       | FROM qs, c2 c) WHERE r <= 4),
       |cand AS (SELECT p.query_id, af.vec_id AS neighbor_id
       | FROM probe p JOIN af ON af.cid = p.cid),
       |approx AS (SELECT c.query_id, c.neighbor_id,
       |  round(sc_0.d + sc_1.d + sc_2.d + sc_3.d, 6) AS approx
       | FROM cand c JOIN sc_0 USING (query_id, neighbor_id)
       |  JOIN sc_1 USING (query_id, neighbor_id)
       |  JOIN sc_2 USING (query_id, neighbor_id)
       |  JOIN sc_3 USING (query_id, neighbor_id)),
       |short AS (SELECT query_id, neighbor_id FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY approx DESC, neighbor_id) AS arn FROM approx) WHERE arn <= 40),
       |rr AS (SELECT s.query_id, s.neighbor_id,
       |  round(list_cosine_similarity(qe.v, ce.v), 6) AS cos
       | FROM short s JOIN e qe ON qe.vec_id = s.query_id
       |  JOIN e ce ON ce.vec_id = s.neighbor_id)
       |SELECT query_id, neighbor_id, cos,
       | CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |   ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
       |FROM rr QUALIFY rn <= 5""".stripMargin
  }) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val corp = emb.filter(col("id") >= 10)
    val ivf = Similarity.ensureIvfIndex(s, ivfIndexName(dir), corp,
      nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)))
    val (codes, books) = Similarity.ensurePqModel(s, pqModelName(dir),
      corp.select(col("id").as("vec_id"), col("vec").as("embedding")),
      m = 4, k = 8, iters = 2, dim = 64, fingerprint = Some(embFp(dir)))
    val postings = Similarity.ensureAdcPostings(s, pqModelName(dir), ivf, codes, m = 4,
      fingerprint = Some(embFp(dir)))
    Similarity.ivfAdcTopK(emb.filter(col("id") < 10), ivf, postings, books,
      k = 5, nProbe = 4, shortlist = 40)
  }

  /** RESIDUAL IVF-ADC (s17) — the actual IVFADC of Jégou et al. 2011
    * §III, upgrading s12's raw-vector codes: the PQ codebooks are
    * trained on the coarse-quantizer residuals r = v − centroid(cid)
    * (what a cell must distinguish is displacement AROUND its
    * centroid), and the approx score decomposes as q·v̂ =
    * q·centroid(cid) + q·r̂ — one per-(query, probed-cell) centroid
    * dot plus the same m LUT lookups per candidate. Fully
    * oracle-checked: DuckDB re-derives the coarse index (unrolled
    * Lloyd), subtracts the identical centroids to get the residual
    * table, re-trains the four residual sub-codebooks with the same
    * CTE blocks, and scores through the same decomposition. Same cost
    * shape as s12 (the cell term is nProbe scalars per query, never
    * per candidate). */
  val s17 = q("s17_ivfadc_residual", {
    val blocks = (0 until 4).map(s => pqSubCtes(s, k = 8, subDim = 16, src = "res"))
    val scs = (0 until 4).map { s =>
      val lo = s * 16 + 1; val hi = (s + 1) * 16
      s"""sc_$s AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         |  list_dot_product(q.v[$lo:$hi], c.v) AS d
         | FROM qs q, af_$s a JOIN c2_$s c ON c.cid = a.code)""".stripMargin
    }
    s"""$ivfOracleCtes,
       |res AS MATERIALIZED (SELECT af.vec_id, af.cid,
       |  list_transform(range(len(af.v)), i -> af.v[i+1] - c.v[i+1]) AS v
       | FROM af JOIN c2 c USING (cid)),
       |${blocks.mkString(",\n")},
       |${scs.mkString(",\n")},
       |probe AS (SELECT vec_id AS query_id, cid FROM (
       | SELECT qs.vec_id, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY qs.vec_id
       |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(qs.v, c.v), c.cid) AS r
       | FROM qs, c2 c) WHERE r <= 4),
       |cd AS (SELECT q.vec_id AS query_id, c.cid,
       |  list_dot_product(q.v, c.v) AS cd
       | FROM qs q, c2 c),
       |cand AS (SELECT p.query_id, af.vec_id AS neighbor_id, af.cid
       | FROM probe p JOIN af ON af.cid = p.cid),
       |approx AS (SELECT c.query_id, c.neighbor_id,
       |  round(cd.cd + sc_0.d + sc_1.d + sc_2.d + sc_3.d, 6) AS approx
       | FROM cand c JOIN cd ON cd.query_id = c.query_id AND cd.cid = c.cid
       |  JOIN sc_0 ON sc_0.query_id = c.query_id AND sc_0.neighbor_id = c.neighbor_id
       |  JOIN sc_1 ON sc_1.query_id = c.query_id AND sc_1.neighbor_id = c.neighbor_id
       |  JOIN sc_2 ON sc_2.query_id = c.query_id AND sc_2.neighbor_id = c.neighbor_id
       |  JOIN sc_3 ON sc_3.query_id = c.query_id AND sc_3.neighbor_id = c.neighbor_id),
       |short AS (SELECT query_id, neighbor_id FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY approx DESC, neighbor_id) AS arn FROM approx) WHERE arn <= 40),
       |rr AS (SELECT s.query_id, s.neighbor_id,
       |  round(list_cosine_similarity(qe.v, ce.v), 6) AS cos
       | FROM short s JOIN e qe ON qe.vec_id = s.query_id
       |  JOIN e ce ON ce.vec_id = s.neighbor_id)
       |SELECT query_id, neighbor_id, cos,
       | CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |   ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
       |FROM rr QUALIFY rn <= 5""".stripMargin
  }) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val corp = emb.filter(col("id") >= 10)
    val ivf = Similarity.ensureIvfIndex(s, ivfIndexName(dir), corp,
      nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)))
    val (codes, books) = Similarity.ensureResidualPqModel(s, pqResModelName(dir),
      ivf, m = 4, k = 8, iters = 2, dim = 64, fingerprint = Some(embFp(dir)))
    val postings = Similarity.ensureAdcPostings(s, pqResModelName(dir), ivf,
      codes, m = 4, fingerprint = Some(embFp(dir)))
    Similarity.ivfAdcResidualTopK(emb.filter(col("id") < 10), ivf, postings,
      books, k = 5, nProbe = 4, shortlist = 40)
  }

  /** Johnson–Lindenstrauss random projection 64→16 dims over the
    * md5-portable plane family (salt "rp:") — fully oracle-checked:
    * DuckDB re-derives the identical plane matrix from md5 and folds
    * the dot in the same index order. The Spark side is ONE fused
    * native loop per row (plans.MatVecProject), no shuffle. */
  val s09 = q("s09_random_projection",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |pl AS (SELECT p, list_transform(range(64), d ->
      |  CAST(concat('0x', substr(md5(concat('rp:', p, ':', d)), 1, 15)) AS BIGINT)
      |    / 1152921504606846976.0 * 2.0 - 1.0) AS plane
      | FROM range(16) t(p))
      |SELECT vec_id, CAST(p AS BIGINT) AS pos,
      | round(list_dot_product(v, plane) * sqrt(3.0 / 16.0), 6) AS proj
      |FROM e, pl""".stripMargin) { (s, dir) =>
    Similarity.randomProjection(Tables.embeddings(s, dir), outDim = 16, dim = 64)
  }

  /** SemDeDup-style semantic dedup over the SAME persisted portable
    * IVF index s04 probes: within each centroid cluster the min-id
    * vector is the keeper, and members whose rounded cosine to it
    * exceeds 0.3 are marked redundant (non-vacuous on this corpus: the
    * random-vector tail crosses it). Fully oracle-checked — the
    * oracle re-derives the identical k-means (shared CTE prelude) and
    * applies the identical keeper/threshold rule. */
  val s07 = q("s07_semantic_dedup",
    s"""$ivfOracleCtes,
      |keep AS (SELECT cid, min(vec_id) AS keeper FROM af GROUP BY cid),
      |kv AS (SELECT k.cid, k.keeper, af.v AS kvec
      | FROM keep k JOIN af ON af.vec_id = k.keeper)
      |SELECT af.vec_id, af.cid,
      | round(list_cosine_similarity(af.v, kv.kvec), 6) AS cos_keeper,
      | (af.vec_id = kv.keeper OR
      |  round(list_cosine_similarity(af.v, kv.kvec), 6) <= 0.3) AS keep
      |FROM af JOIN kv ON kv.cid = af.cid""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val model = Similarity.ensureIvfIndex(s, ivfIndexName(dir),
      emb.filter(col("id") >= 10), nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)))
    Similarity.semanticDedup(model, threshold = 0.3)
      .select(col("vec_id"), col("cid").cast("long").as("cid"),
        col("cos_keeper"), col("keep"))
  }

  /** Catalog-safe index name, unique per SF directory. The `p` marks
    * the portable-init family — a name change invalidates any index
    * persisted by the pre-portable builds. */
  private def ivfIndexName(dir: String): String =
    "graft_ivfp_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** The label-carrying (filtered-search) IVF index — distinct name:
    * posting-metadata columns are part of the name contract. */
  private def ivfLblIndexName(dir: String): String =
    "graft_ivfl_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Source fingerprint of the embeddings table — staleness key for
    * every persisted ANN artifact derived from it. */
  private def embFp(dir: String): String =
    graft.sources.DerivedTables.sourceFingerprint(dir, "embeddings")

  /** Catalog-safe PQ-model name, unique per SF directory. */
  private def pqModelName(dir: String): String =
    "graft_pq_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Residual-PQ model name (codes under the raw and residual schemes
    * are mutually meaningless — distinct prefix, never shared). */
  private def pqResModelName(dir: String): String =
    "graft_pqr_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Persisted logistic-model family name, unique per SF directory. */
  private def lrModelName(dir: String): String =
    "graft_lrm_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** The PERSISTED t45-family model for `dir`: trained once on the
    * trusted %5≠0 split under the t45 hyper-params, staleness-guarded
    * on the documents fingerprint — p16's production path (and the
    * Bench prepare hook, so the timed p16 is pure scoring). */
  def ensureCorpusModel(s: SparkSession, dir: String): TextAnalysis.LogisticModel =
    TextAnalysis.ensureLogisticModel(s, lrModelName(dir),
      Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(5)) =!= 0),
      "doc_id", "text",
      graft.plans.TextHash.classifierScore(TextOps.tokens(col("text"))) > 0L,
      nBuckets = LrBuckets, rounds = LrRounds,
      fingerprint = Some(
        graft.sources.DerivedTables.sourceFingerprint(dir, "documents")))

  /** One-time artifact builds that should not land in any timed query:
    * the s04 IVF index and the d07/d08 near-dup cluster table.
    * Idempotent; Bench calls it during warmup, and a cold Verify run
    * simply builds on first use. */
  def prepare(s: SparkSession, dir: String): Unit = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val ivf = Similarity.ensureIvfIndex(s, ivfIndexName(dir),
      emb.filter(col("id") >= 10), nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)))
    Similarity.ensureIvfIndex(s, ivfLblIndexName(dir),
      Tables.embeddings(s, dir).select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"), col("label"))
        .filter(col("id") >= 10),
      nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)), extraCols = Seq("label"))
    val (codes, _) = Similarity.ensurePqModel(s, pqModelName(dir),
      emb.filter(col("id") >= 10)
        .select(col("id").as("vec_id"), col("vec").as("embedding")),
      m = 4, k = 8, iters = 2, dim = 64, fingerprint = Some(embFp(dir)))
    Similarity.ensureAdcPostings(s, pqModelName(dir), ivf, codes, m = 4,
      fingerprint = Some(embFp(dir)))
    val (resCodes, _) = Similarity.ensureResidualPqModel(s, pqResModelName(dir),
      ivf, m = 4, k = 8, iters = 2, dim = 64, fingerprint = Some(embFp(dir)))
    Similarity.ensureAdcPostings(s, pqResModelName(dir), ivf, resCodes, m = 4,
      fingerprint = Some(embFp(dir)))
    ensureClusters(s, dir)
    ensureEventsByDate(s, dir)
    ensureBucketed(s, dir)
    ensureIngestKeys(s, dir)
    ensureCorpusClusters(s, dir)
    ensureLexicalIndex(s, dir)
    ensureCorpusModel(s, dir)
    ()
  }

  /** Catalog-safe ingest-key table prefix, unique per SF directory. */
  private def ingestKeysName(dir: String): String =
    "graft_ingest_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Build-once / maintained-per-ingest corpus KEY tables for the p06
    * incremental pipeline — the artifact that makes each daily batch
    * cost O(batch), never O(corpus): the corpus's DISTINCT normalized
    * content fingerprints (exact-dedup anti-join side, bucketed on the
    * fingerprint) plus the near-dup band-signature and shingle tables
    * ([[Dedup.saveNearDupKeys]]). Fingerprint-guarded like every
    * derived artifact; a production deployment appends the surviving
    * batch's keys per ingest instead of rebuilding. Corpus membership
    * = the d15/p06 convention (doc_id % 10 <> 0 is "landed"). */
  def ensureIngestKeys(s: SparkSession, dir: String): String = synchronized {
    import graft.sources.{Bucketing, DerivedTables}
    val name = ingestKeysName(dir)
    val tables = Seq(s"${name}_norm", s"${name}_ndband", s"${name}_ndsh")
    DerivedTables.ensure(s, tables,
        DerivedTables.sourceFingerprint(dir, "documents")) {
      val corpus = Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(10)) =!= 0)
      Bucketing.writeBucketed(
        corpus.select(graft.functions.TextOps.fingerprint(col("text"))
          .as("__norm_key")).distinct(),
        s"${name}_norm", "__norm_key", 8)
      Dedup.saveNearDupKeys(s, name, corpus, "doc_id", "text")
    }
    name
  }

  /** Catalog-safe lexical-index prefix, unique per SF directory. */
  private def lexIndexName(dir: String): String =
    "graft_lex_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Build-once / maintained-per-ingest BM25 posting index over the
    * retrieval corpus (doc_id >= 10 — s16's corpus side): the
    * `{prefix}_post`/`_lexstats` family ([[graft.operators.TextAnalysis
    * .saveLexicalIndex]]), so the hybrid-retrieval lexical leg probes
    * persisted posting lists instead of re-deriving corpus tf/df per
    * call — the same key-table discipline d10/d15/p06 apply to dedup,
    * applied to retrieval. Fingerprint-guarded like every artifact; a
    * deployment appends per ingest. */
  def ensureLexicalIndex(s: SparkSession, dir: String): String = synchronized {
    import graft.sources.DerivedTables
    val name = lexIndexName(dir)
    DerivedTables.ensure(s, Seq(s"${name}_post", s"${name}_lexstats"),
        DerivedTables.sourceFingerprint(dir, "documents")) {
      TextAnalysis.saveLexicalIndex(s, name,
        Tables.documents(s, dir).filter(col("doc_id") >= 10), "doc_id", "text")
    }
    name
  }

  /** Catalog-safe partitioned-events name, unique per SF directory. */
  private def eventsByDateName(dir: String): String =
    "graft_events_bydate_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Build-once date-partitioned events layout: the physical design a
    * 100 TB event table actually ships with (one directory per day, so
    * date predicates and date-keyed joins prune partitions instead of
    * scanning the table). 30 distinct days at every shipped SF. */
  def ensureEventsByDate(s: SparkSession, dir: String): DataFrame = synchronized {
    import graft.sources.DerivedTables
    val name = eventsByDateName(dir)
    DerivedTables.ensure(s, Seq(name), DerivedTables.sourceFingerprint(dir, "events")) {
      Tables.events(s, dir)
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date")
        .format("parquet").saveAsTable(name)
    }
    s.table(name)
  }

  /** Catalog-safe cluster-table name, unique per SF directory. */
  private def clustersName(dir: String): String =
    "graft_clusters_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Build-once / read-many near-dup cluster assignments (the d07
    * computation): persisted as a catalog table per SF dir, the way a
    * production pipeline lands cluster ids as an artifact instead of
    * re-running LSH + connected components per consumer. d07 still
    * times the full clustering operator; d08 consumes this artifact so
    * its bench number reflects the signature aggregation. */
  def ensureClusters(s: SparkSession, dir: String): DataFrame = synchronized {
    import graft.sources.DerivedTables
    val name = clustersName(dir)
    DerivedTables.ensure(s, Seq(name), DerivedTables.sourceFingerprint(dir, "documents")) {
      Dedup.clusters(
        Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", threshold = 0.5)
          .select("doc_a", "doc_b"))
        .write.mode("overwrite").format("parquet").saveAsTable(name)
    }
    s.table(name)
  }

  /** Catalog-safe old-corpus cluster-table name, per SF directory. */
  private def corpusClustersName(dir: String): String =
    "graft_corpclusters_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Build-once cluster assignments over the LANDED corpus only
    * (doc_id % 10 <> 0, the d15/p06 membership convention) — the
    * artifact d16's incremental maintenance starts from, distinct
    * from [[ensureClusters]] (full corpus, d08/p04's input). */
  def ensureCorpusClusters(s: SparkSession, dir: String): DataFrame = synchronized {
    import graft.sources.DerivedTables
    val name = corpusClustersName(dir)
    DerivedTables.ensure(s, Seq(name), DerivedTables.sourceFingerprint(dir, "documents")) {
      Dedup.clusters(
        Dedup.jaccardPairs(
            Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(10)) =!= 0),
            "doc_id", "text", threshold = 0.5)
          .select("doc_a", "doc_b"))
        .write.mode("overwrite").format("parquet").saveAsTable(name)
    }
    s.table(name)
  }

  /** HLL approximate distinct, oracle-checked via an INVARIANT row: the
    * sketch estimate itself is engine-specific, so the dumped output is
    * the exact distinct counts (oracle-computable) plus a boolean
    * asserting the HLL estimate landed within 5% of exact (Spark's
    * default rsd 0.05) — the oracle emits TRUE, so a drifting sketch
    * hash-mismatches. The raw estimates stay covered by ScalaTest. */
  val q29 = q("q29_approx_distinct",
    """SELECT l_returnflag,
      | COUNT(DISTINCT l_partkey) AS exact_parts,
      | COUNT(DISTINCT l_orderkey) AS exact_orders,
      | TRUE AS parts_within_5pct, TRUE AS orders_within_5pct
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    // One leg per distinct column (r19; previously exact[Expand x3] +
    // a separate approx scan + join): each leg distincts its
    // (flag, key) pairs — no Expand anywhere — and the HLL rides the
    // SAME pass (register insertion is idempotent, so the sketch over
    // distinct pairs is register-identical to one over raw rows; the
    // q64 argument). The old structure's trap stands: HLL buffers must
    // never ride an Expand (multi-KB registers x expanded rows was
    // ~15x slower) — here no leg has one.
    // rsd 0.0125 makes the 5% invariant a 4σ bound (P(miss) ~ 1e-4
    // across all six cells; the default 0.05 leaves 5% at 1σ — a ~1/3
    // flake rate per cell).
    def leg(c: String, exactName: String, apName: String) =
      li.where(col(c).isNotNull).select(col("l_returnflag"), col(c)).distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as(exactName),
          approx_count_distinct(col(c), 0.0125).as(apName))
    leg("l_partkey", "exact_parts", "ap")
      .join(leg("l_orderkey", "exact_orders", "ao"), "l_returnflag")
      .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
        (abs(col("ap") - col("exact_parts"))
          <= col("exact_parts") * lit(0.05)).as("parts_within_5pct"),
        (abs(col("ao") - col("exact_orders"))
          <= col("exact_orders") * lit(0.05)).as("orders_within_5pct"))
  }

  /** Sliding (hopping) time window — the batch twin of
    * WindowVariantsSpec's streaming variant (SURVEY §2 T3): 10-minute
    * windows every 5 minutes over events, so each event lands in
    * exactly duration/slide = 2 windows. The oracle is the per-offset
    * UNION ALL (the semantic definition: one tumbling assignment per
    * hop offset). Window starts emitted as epoch seconds BIGINT —
    * engine-neutral, no timestamp formatting surface. Plan shape: the
    * window() generator explodes each row to its 2 assignments, then
    * one hash agg — same scan/shuffle count as a tumbling window. */
  val q61 = q("q61_sliding_window",
    """SELECT user_id, CAST(ws AS BIGINT) AS win_start,
      | CAST(COUNT(*) AS BIGINT) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM (
      | SELECT user_id, floor(floor(epoch(ts)) / 300) * 300 AS ws, value
      | FROM events
      | UNION ALL
      | SELECT user_id, floor(floor(epoch(ts)) / 300) * 300 - 300 AS ws, value
      | FROM events
      |)
      |GROUP BY user_id, ws""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(Exact.M)).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("window.start")).as("win_start"),
        col("n_events"), col("sum_value"))
  }

  /** Session window via the native session_window() operator — the
    * batch twin of WindowVariantsSpec's streaming variant (SURVEY §2
    * T3), against a gaps-and-islands oracle (the q56 precedent, but at
    * session_window's exact semantics: a gap of >= the 600 s timeout
    * splits, since touching-but-not-overlapping windows don't merge —
    * q56's hand-rolled sessionize splits only on > 600). Timestamps are
    * µs-aligned on both engines (Tables.events), so the >= boundary
    * decisions agree exactly. */
  val q62 = q("q62_session_window",
    """WITH marked AS (
      | SELECT user_id, ts, event_id, value,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |   OR ts >= lag(ts) OVER w + INTERVAL 600 SECOND
      |  THEN 1 ELSE 0 END AS new_s
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      | SELECT user_id, ts, value,
      |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
      | FROM marked
      |)
      |SELECT user_id,
      | CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
      | CAST(COUNT(*) AS BIGINT) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM sessions GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(Exact.M)).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("sess_start"),
        col("n_events"), col("sum_value"))
  }

  /** Sketch-based heavy hitters, fully oracle-checked via the two-pass
    * candidate-generation + exact-verification pattern — the shape that
    * makes frequent-item mining feasible at 100 TB. Pass 1 is one scan:
    * Spark's `stat.freqItems` (Karp-Shenker-Papadimitriou summaries
    * merged across partitions; ≤ 1/θ candidates, false positives
    * possible, false NEGATIVES impossible at support ≥ θ), collected to
    * the driver — a bounded ≤ 1/θ-element set, not data-sized. Pass 2
    * is one more scan doing EXACT counts, with non-candidate words
    * collapsed into a single NULL group so the same aggregate also
    * yields the grand total (no third scan); the final θ·N filter makes
    * the output independent of whatever extra candidates pass 1's
    * partition order produced. Candidate membership runs as a broadcast
    * hash join against the tiny candidate set rather than an `isin`
    * literal list: same plan at 50 candidates, but at θ→0.001 (1000
    * candidates) the join probes one broadcast hash table instead of
    * codegening a 1000-branch predicate per row. */
  val q63 = q("q63_heavy_hitters",
    """WITH words AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      | tot AS (SELECT COUNT(*) AS total FROM words)
      |SELECT word, COUNT(*) AS n_occurrences
      |FROM words, tot
      |GROUP BY word, tot.total
      |HAVING COUNT(*) > 0.02 * tot.total""".stripMargin) { (s, dir) =>
    val theta = 0.02 // sits in the corpus gap: common words ~3.2%, rare ~0.1%
    val words = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
    val cands = words.stat.freqItems(Array("word"), theta)
      .collect()(0).getSeq[String](0)
    // ≤ 1/θ candidate rows; distinct guards against a summary ever
    // emitting a duplicate (a dup would double-count joined rows)
    val candDf = s.createDataset(cands)(Encoders.STRING)
      .toDF("cand").distinct()
    // broadcast left join: matched words keep their candidate value,
    // everything else lands in the single NULL group (same semantics
    // as when(isin) but one hash probe instead of an N-branch predicate)
    val agg = words
      .join(broadcast(candDf), col("word") === col("cand"), "left")
      .groupBy(col("cand").as("word"))
      .agg(count(lit(1)).as("n_occurrences"))
    // grand total from the tiny aggregate itself (≤ 1/θ + 1 rows);
    // Catalyst reuses the aggregation exchange between the two branches
    val total = agg.agg(sum("n_occurrences").as("total"))
    agg.crossJoin(broadcast(total))
      .filter(col("word").isNotNull &&
        col("n_occurrences") > col("total") * theta)
      .select(col("word"), col("n_occurrences"))
  }

  /** HLL++ approximate distinct count, oracle-checked the q59 way: the
    * dumped row carries the EXACT distinct count (oracle-computable,
    * q25's shape) plus a boolean asserting the sketch estimate lies
    * within ±5% of it — 5× the rsd=0.01 standard error, so a healthy
    * sketch never flakes while a broken one hash-mismatches. The HLL
    * estimate itself is deterministic: register maxima are
    * order-insensitive under merge. At 100 TB this is the cheap first
    * pass before an exact distinct (partial HLL buffers merge map-side;
    * exact COUNT(DISTINCT) expands every key through the shuffle).
    *
    * The HLL aggregates SEPARATELY from the exact count (q29's split
    * shape, for q29's measured reason): co-planning them makes Spark's
    * single-distinct rewrite carry a partial HLL buffer (rsd 0.01 →
    * 2^14 registers, ~12 KB) per distinct (l_returnflag, l_partkey)
    * group through the expand-aggregate shuffle — ~15x slower at sf0.1
    * and memory-unbounded at 100 TB. Split, the HLL buffers merge
    * map-side (3 per partition) and the join is 3 rows × 3 rows. */
  val q64 = q("q64_approx_distinct",
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      | TRUE AS approx_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    // ONE scan (r19; previously exact + approx scanned lineitem twice
    // and 3-row-joined): HLL register insertion is idempotent, so
    // approx_count_distinct over the DISTINCT (flag, partkey) pairs is
    // register-identical to running it over the raw rows — and the
    // exact COUNT(DISTINCT) materializes exactly those pairs anyway
    // (its partial-distinct shuffle). The null filter mirrors
    // COUNT(DISTINCT)'s null exclusion (vacuous on lineitem, where
    // l_partkey is non-null; stated for exact parity in general).
    li.where(col("l_partkey").isNotNull)
      .select("l_returnflag", "l_partkey").distinct()
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_parts"),
        approx_count_distinct(col("l_partkey"), 0.01).as("ad"))
      .select(col("l_returnflag"), col("n_parts"),
        (abs(col("ad") - col("n_parts")) <= col("n_parts") * lit(0.05))
          .as("approx_ok"))
  }

  /** Snapshot diff (CDC reconciliation): per-customer order stats for
    * 1994 vs 1995, FULL OUTER joined on the key, each row classified
    * added/removed/changed/same — the reconcile-two-table-states verb.
    * Scale shape: two map-side-combined aggregates, one shuffle join on
    * the shared key (AQE-planned); no driver state. */
  val q66 = q("q66_snapshot_diff",
    """WITH a AS (SELECT o_custkey, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      | FROM orders WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1995-01-01 00:00:00' GROUP BY o_custkey),
      |b AS (SELECT o_custkey, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      | FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00' GROUP BY o_custkey)
      |SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
      | COALESCE(a.n, 0) AS n_old, COALESCE(b.n, 0) AS n_new,
      | CASE WHEN a.o_custkey IS NULL THEN 'added'
      |      WHEN b.o_custkey IS NULL THEN 'removed'
      |      WHEN a.n <> b.n OR a.total <> b.total THEN 'changed'
      |      ELSE 'same' END AS status
      |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey""".stripMargin) { (s, dir) =>
    def snap(lo: String, hi: String) = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
        col("o_orderdate") < lit(hi).cast("timestamp"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), dsumM(col("o_totalprice")).as("total"))
    val a = snap("1994-01-01", "1995-01-01")
      .select(col("o_custkey").as("ck_a"), col("n").as("n_a"), col("total").as("t_a"))
    val b = snap("1995-01-01", "1996-01-01")
      .select(col("o_custkey").as("ck_b"), col("n").as("n_b"), col("total").as("t_b"))
    a.join(b, col("ck_a") === col("ck_b"), "full")
      .select(coalesce(col("ck_a"), col("ck_b")).as("custkey"),
        coalesce(col("n_a"), lit(0L)).as("n_old"),
        coalesce(col("n_b"), lit(0L)).as("n_new"),
        when(col("ck_a").isNull, "added")
          .when(col("ck_b").isNull, "removed")
          .when(col("n_a") =!= col("n_b") || col("t_a") =!= col("t_b"), "changed")
          .otherwise("same").as("status"))
  }

  /** Rank-function family (dense_rank / percent_rank / cume_dist /
    * ntile) — the remaining window verbs W1's row_number doesn't cover.
    * The rank trio orders on l_quantity ALONE: their values are
    * tie-deterministic (they depend on key comparisons, not physical
    * order), so this also pins cross-engine tie semantics. ntile is
    * NOT tie-deterministic, so it gets the unique full ordering.
    *
    * Plan shape: NOT the direct `rank() OVER (PARTITION BY flag)` —
    * l_returnflag has 3 values, so the direct window serializes the
    * whole table into 3 sort tasks (measured 54 s at ~sf10, the
    * low-cardinality-partition wall every engine hits). Because every
    * rank verb here is a pure function of (tie-group prefix counts,
    * within-tie row number), it decomposes: aggregate per (flag,
    * quantity) — 3×50 rows — window THAT, broadcast it back, and run
    * the only per-row window on (flag, quantity) partitions (150-way
    * parallel instead of 3). dense_rank = distinct-key row_number;
    * percent_rank = prefix/(N-1); cume_dist = (prefix+ties)/N; ntile's
    * bucket is integer arithmetic on rn = prefix + within-tie rn.
    * Identical output to the direct spelling (spec-locked) — the
    * rewrite applies whenever the ORDER key's cardinality ≪ rows. */
  val q67 = q("q67_rank_functions",
    """SELECT l_orderkey, l_linenumber,
      | CAST(dense_rank() OVER wq AS BIGINT) AS drnk,
      | round(percent_rank() OVER wq, 6) AS prnk,
      | round(cume_dist() OVER wq, 6) AS cd,
      | CAST(ntile(4) OVER wu AS BIGINT) AS quartile
      |FROM lineitem
      |WINDOW wq AS (PARTITION BY l_returnflag ORDER BY l_quantity),
      |       wu AS (PARTITION BY l_returnflag
      |              ORDER BY l_quantity, l_orderkey, l_linenumber)""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val wA = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    val stats = li.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("tie_n"))
      .select(col("l_returnflag"), col("l_quantity"), col("tie_n"),
        coalesce(sum(col("tie_n")).over(
          wA.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("pfx"),
        row_number().over(wA).cast("long").as("drnk"),
        sum(col("tie_n")).over(
          Window.partitionBy("l_returnflag")).as("n_part"))
    val wTie = Window.partitionBy("l_returnflag", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
    li.join(broadcast(stats), Seq("l_returnflag", "l_quantity"))
      .withColumn("__rn", col("pfx") + row_number().over(wTie).cast("long"))
      .select(col("l_orderkey"), col("l_linenumber"), col("drnk"),
        round(when(col("n_part") > 1L,
          col("pfx").cast("double") / (col("n_part") - 1L).cast("double"))
          .otherwise(lit(0.0)), 6).as("prnk"),
        round((col("pfx") + col("tie_n")).cast("double") /
          col("n_part").cast("double"), 6).as("cd"),
        // SQL-standard ntile(4): r = n%4 leading buckets of size q+1
        expr("""CAST(CASE WHEN __rn <= (n_part % 4) * (n_part DIV 4 + 1)
               | THEN (__rn - 1) DIV (n_part DIV 4 + 1) + 1
               | ELSE n_part % 4 +
               |  (__rn - (n_part % 4) * (n_part DIV 4 + 1) - 1)
               |    DIV (n_part DIV 4) + 1
               |END AS BIGINT)""".stripMargin).as("quartile"))
  }

  /** Time-series gap fill + forward fill (Relational.gapFill): densify
    * each user's event series to a 600 s grid over its own span, carry
    * the last per-minute mean forward into generated gaps — the
    * missing-bars repair upstream of every rolling metric. Buckets
    * compare as epoch seconds (BIGINT) to keep the oracle free of
    * timestamp-representation drift. */
  val q68 = q("q68_gap_fill",
    """WITH pb AS (SELECT user_id,
      |  CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_s,
      |  round(CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / COUNT(value), 6) AS v
      | FROM events GROUP BY 1, 2),
      |span AS (SELECT user_id, min(bucket_s) AS lo, max(bucket_s) AS hi
      | FROM pb GROUP BY user_id),
      |grid AS (SELECT user_id, unnest(generate_series(lo, hi, 600)) AS bucket_s
      | FROM span)
      |SELECT g.user_id, g.bucket_s,
      | last_value(pb.v IGNORE NULLS) OVER (PARTITION BY g.user_id
      |   ORDER BY g.bucket_s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
      | pb.v IS NOT NULL AS observed
      |FROM grid g LEFT JOIN pb
      |  ON pb.user_id = g.user_id AND pb.bucket_s = g.bucket_s""".stripMargin) { (s, dir) =>
    Relational.gapFill(Tables.events(s, dir), Seq("user_id"), "ts",
        round(davg(col("value")), 6), stepSeconds = 600)
      .select(col("user_id"),
        unix_timestamp(col("bucket")).cast("long").as("bucket_s"),
        col("value"), col("observed"))
  }

  /** Z-order layout stats: Morton-interleave (l_partkey, l_suppkey) at
    * 16 bits each, bucket on the key's top 10 bits, and report each
    * z-tile's row count + per-dimension bbox. Verifies the interleave
    * arithmetic bit-for-bit (any flipped bit reassigns buckets) and
    * shows the locality the zorderWrite layout gives each output file —
    * see operators.Layout and LayoutSpec for the write path itself. */
  val q65 = q("q65_zorder_stats",
    s"""SELECT zbucket, COUNT(*) AS n_rows,
       | min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
       | min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
       |FROM (SELECT ${Layout.zkeySql(Seq("l_partkey", "l_suppkey"), 16)} >> 12 AS zbucket,
       |  l_partkey, l_suppkey FROM lineitem)
       |GROUP BY zbucket""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(shiftright(
          Layout.zkey(Seq(col("l_partkey"), col("l_suppkey")), 16), 12)
          .as("zbucket"),
        col("l_partkey"), col("l_suppkey"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
        min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
  }

  /** Conversion funnel over the event stream: per user, the earliest
    * signup, the earliest purchase AFTER that signup, and the earliest
    * error after that purchase — then one corpus-wide rollup of how
    * many users survive each stage. Strictly-ordered semantics (each
    * stage must follow the previous one in event time), computed in a
    * single user-id shuffle by Relational.funnelTimes. */
  val q75 = q("q75_funnel",
    """WITH s1 AS (
      | SELECT user_id, ts, event_type,
      |  min(CASE WHEN event_type = 'signup' THEN ts END)
      |    OVER (PARTITION BY user_id) AS t_signup
      | FROM events),
      |s2 AS (
      | SELECT *,
      |  min(CASE WHEN event_type = 'purchase' AND ts > t_signup THEN ts END)
      |    OVER (PARTITION BY user_id) AS t_purchase
      | FROM s1),
      |s3 AS (
      | SELECT *,
      |  min(CASE WHEN event_type = 'error' AND ts > t_purchase THEN ts END)
      |    OVER (PARTITION BY user_id) AS t_error
      | FROM s2),
      |u AS (
      | SELECT user_id, max(t_signup) AS t_signup,
      |  max(t_purchase) AS t_purchase, max(t_error) AS t_error
      | FROM s3 GROUP BY user_id)
      |SELECT COUNT(*) AS n_users, COUNT(t_signup) AS n_signup,
      | COUNT(t_purchase) AS n_purchase_after_signup,
      | COUNT(t_error) AS n_error_after_purchase
      |FROM u""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
    Relational.funnelTimes(e, col("user_id"), col("ts"), Seq(
        "signup" -> (col("event_type") === "signup"),
        "purchase" -> (col("event_type") === "purchase"),
        "error" -> (col("event_type") === "error")))
      .agg(count(lit(1)).as("n_users"),
        count(col("t_signup")).as("n_signup"),
        count(col("t_purchase")).as("n_purchase_after_signup"),
        count(col("t_error")).as("n_error_after_purchase"))
  }

  /** Time-weighted average value per event type: each observation is
    * weighted by the microseconds until the key's next event of the
    * same type (a TWAP — the duration-correct mean for irregular
    * time series, vs q06's trade-weighted VWAP). Exact arithmetic
    * end-to-end: value in integer cents × integer µs duration, summed
    * as DECIMAL(38,0); the only float op is the final display
    * division, performed on identical inputs in identical order on
    * both engines. One (user, type) shuffle for the lead(), then a
    * 5-group hash agg. */
  val q76 = q("q76_twap",
    """WITH seg AS (
      | SELECT user_id, event_type, value, ts,
      |  lead(ts) OVER (PARTITION BY user_id, event_type
      |                 ORDER BY ts, event_id) AS next_ts
      | FROM events),
      |d AS (
      | SELECT event_type,
      |  epoch_us(next_ts) - epoch_us(ts) AS dur_us,
      |  CAST(CAST(round(value * 100) AS BIGINT)
      |    * (epoch_us(next_ts) - epoch_us(ts)) AS DECIMAL(38,0)) AS cd
      | FROM seg WHERE next_ts IS NOT NULL)
      |SELECT event_type, COUNT(*) AS n_segments,
      | CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
      | round(CAST(SUM(cd) AS DOUBLE)
      |   / CAST(CAST(SUM(dur_us) AS BIGINT) AS DOUBLE) / 100.0, 6) AS twap
      |FROM d GROUP BY event_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("value"), col("ts"),
        col("event_id"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .withColumn("dur_us", unix_micros(col("next_ts")) - unix_micros(col("ts")))
      .withColumn("cd", (round(col("value") * 100).cast("long") * col("dur_us"))
        .cast("decimal(38,0)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_segments"),
        sum(col("dur_us")).as("total_dur_us"),
        sum(col("cd")).as("__sum_cd"))
      .select(col("event_type"), col("n_segments"), col("total_dur_us"),
        round(col("__sum_cd").cast("double") /
          col("total_dur_us").cast("double") / lit(100.0), 6).as("twap"))
  }

  /** Equi-width histogram of l_extendedprice (20 × $5250 buckets from
    * $0): the data-profiling primitive. Bucketing runs in integer
    * cents with integer division — bit-exact bucket edges on every
    * engine, no width_bucket float-boundary hazard. Scan → map-side
    * partial agg → 20-row result; the share column divides two longs
    * from a 20-row window, not a second scan. */
  val q77 = q("q77_histogram",
    s"""WITH b AS (
       | SELECT CAST(round(l_extendedprice * 100) AS BIGINT) // 525000 AS bucket,
       |  l_extendedprice, l_quantity FROM lineitem)
       |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_rows,
       | min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
       | ${dsumLSql("l_quantity")} AS sum_qty,
       | round(CAST(COUNT(*) AS DOUBLE)
       |   / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS share
       |FROM b GROUP BY bucket""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    Tables.lineitem(s, dir)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT) DIV 525000")
          .as("bucket"),
        col("l_extendedprice"), col("l_quantity"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"),
        dsumL(col("l_quantity")).as("sum_qty"))
      .withColumn("share", round(col("n_rows").cast("double") /
        sum(col("n_rows")).over(Window.partitionBy()).cast("double"), 6))
  }

  /** Hashed bag-of-n-grams linear classifier inference over the corpus
    * (fastText-style quality gate): deterministic md5-derived integer
    * weight vector, unigram+bigram features, exact BIGINT score. Zero
    * shuffle — the whole pass is one native per-row expression
    * (TextAnalysis.hashedLinearScore → plans.HashedClassifierScore). */
  val t20 = q("t20_classifier_score",
    """WITH f AS (
      | SELECT doc_id, unnest(list_concat(toks,
      |   CASE WHEN len(toks) < 2 THEN []
      |    ELSE list_transform(range(1, len(toks)),
      |      i -> toks[i] || ' ' || toks[i + 1]) END)) AS f
      | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
      |w AS (
      | SELECT doc_id,
      |  CAST(concat('0x', substr(md5(CAST(
      |    CAST(concat('0x', substr(md5(f), 1, 13)) AS BIGINT) % 4096
      |   AS VARCHAR)), 1, 13)) AS BIGINT) % 2001 - 1000 AS wt
      | FROM f)
      |SELECT doc_id, COUNT(*) AS n_feats, CAST(SUM(wt) AS BIGINT) AS score,
      | SUM(wt) > 0 AS keep
      |FROM w GROUP BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.hashedLinearScore(Tables.documents(s, dir), "doc_id", "text")
  }

  /** Exact k-NN majority-vote classification: held-out queries
    * (vec_id % 20 = 0) labeled by the dominant label among their 10
    * nearest corpus vectors. Queries broadcast, corpus streamed once;
    * both ranking stages deterministic (Similarity.knnClassify).
    * Scale note: with the query set a FIXED FRACTION of the corpus this
    * shape is inherently quadratic (both sides 100× → 10,000× scored
    * pairs); the production form at that scale is
    * Similarity.knnClassifyIvf — IVF-probed neighbors, same vote,
    * bit-identical at full probe width (SimilaritySpec). */
  val s13 = q("s13_knn_classify",
    """WITH scored AS (
      | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
      |  round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |    CAST(c.embedding AS DOUBLE[])), 6) AS cos
      | FROM embeddings q JOIN embeddings c
      |  ON q.vec_id % 20 = 0 AND c.vec_id % 20 <> 0),
      |topk AS (SELECT * FROM (
      | SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY cos DESC, neighbor_id) AS rn FROM scored) WHERE rn <= 10),
      |v AS (SELECT query_id, label, COUNT(*) AS votes
      |      FROM topk GROUP BY query_id, label)
      |SELECT query_id, label AS pred_label, votes FROM (
      | SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY votes DESC, label) AS rv FROM v) WHERE rv = 1""".stripMargin) {
    (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val c = emb.filter(col("vec_id") % 20 =!= 0)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"),
        col("label"))
    Similarity.knnClassify(q, c, 10)
  }

  /** MMR diversity re-rank (s14): from each query's cosine top-20,
    * greedily keep 5 results balancing relevance against redundancy —
    * score(c) = 0.7·rel(c) − (1−0.7)·max sim(c, selected). The greedy
    * is inherently sequential PER QUERY (k=5 steps over a ≤20-row
    * shortlist), so the oracle unrolls it as five chained QUALIFY
    * argmax steps; rel/sim are 6dp-rounded cosines and the λ
    * combination is spelled `0.7·x − (1.0 − 0.7)·y` on BOTH engines
    * (a literal 0.3 is a DIFFERENT double than 1.0−0.7). */
  val s14 = q("s14_mmr_rerank",
    """WITH ranked AS MATERIALIZED (
      | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |    CAST(c.embedding AS DOUBLE[])), 6) AS rel,
      |  ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |   ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |     CAST(c.embedding AS DOUBLE[])), 6) DESC, c.vec_id) AS rn
      | FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id >= 10),
      |sl AS MATERIALIZED (SELECT query_id, neighbor_id, rel FROM ranked WHERE rn <= 20),
      |sim AS MATERIALIZED (SELECT x.query_id, x.neighbor_id AS a, y.neighbor_id AS b,
      |  round(list_cosine_similarity(CAST(av.embedding AS DOUBLE[]),
      |    CAST(bv.embedding AS DOUBLE[])), 6) AS sim
      | FROM sl x JOIN sl y
      |  ON x.query_id = y.query_id AND x.neighbor_id <> y.neighbor_id
      | JOIN embeddings av ON av.vec_id = x.neighbor_id
      | JOIN embeddings bv ON bv.vec_id = y.neighbor_id),
      |s1 AS (SELECT query_id, neighbor_id,
      |  CAST(0.7 AS DOUBLE) * rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * 0.0 AS score FROM sl
      | QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY CAST(0.7 AS DOUBLE) * rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * 0.0 DESC, neighbor_id) = 1),
      |s2 AS (SELECT query_id, neighbor_id, score FROM (
      |  SELECT sl.query_id, sl.neighbor_id,
      |   CAST(0.7 AS DOUBLE) * sl.rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * p1.sim AS score
      |  FROM sl
      |  JOIN s1 ON s1.query_id = sl.query_id
      |   AND sl.neighbor_id <> s1.neighbor_id
      |  JOIN sim p1 ON p1.query_id = sl.query_id
      |   AND p1.a = sl.neighbor_id AND p1.b = s1.neighbor_id)
      | QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY score DESC, neighbor_id) = 1),
      |s3 AS (SELECT query_id, neighbor_id, score FROM (
      |  SELECT sl.query_id, sl.neighbor_id,
      |   CAST(0.7 AS DOUBLE) * sl.rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * greatest(p1.sim, p2.sim) AS score
      |  FROM sl
      |  JOIN s1 ON s1.query_id = sl.query_id
      |   AND sl.neighbor_id <> s1.neighbor_id
      |  JOIN s2 ON s2.query_id = sl.query_id
      |   AND sl.neighbor_id <> s2.neighbor_id
      |  JOIN sim p1 ON p1.query_id = sl.query_id
      |   AND p1.a = sl.neighbor_id AND p1.b = s1.neighbor_id
      |  JOIN sim p2 ON p2.query_id = sl.query_id
      |   AND p2.a = sl.neighbor_id AND p2.b = s2.neighbor_id)
      | QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY score DESC, neighbor_id) = 1),
      |s4 AS (SELECT query_id, neighbor_id, score FROM (
      |  SELECT sl.query_id, sl.neighbor_id,
      |   CAST(0.7 AS DOUBLE) * sl.rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * greatest(p1.sim, p2.sim, p3.sim) AS score
      |  FROM sl
      |  JOIN s1 ON s1.query_id = sl.query_id
      |   AND sl.neighbor_id <> s1.neighbor_id
      |  JOIN s2 ON s2.query_id = sl.query_id
      |   AND sl.neighbor_id <> s2.neighbor_id
      |  JOIN s3 ON s3.query_id = sl.query_id
      |   AND sl.neighbor_id <> s3.neighbor_id
      |  JOIN sim p1 ON p1.query_id = sl.query_id
      |   AND p1.a = sl.neighbor_id AND p1.b = s1.neighbor_id
      |  JOIN sim p2 ON p2.query_id = sl.query_id
      |   AND p2.a = sl.neighbor_id AND p2.b = s2.neighbor_id
      |  JOIN sim p3 ON p3.query_id = sl.query_id
      |   AND p3.a = sl.neighbor_id AND p3.b = s3.neighbor_id)
      | QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY score DESC, neighbor_id) = 1),
      |s5 AS (SELECT query_id, neighbor_id, score FROM (
      |  SELECT sl.query_id, sl.neighbor_id,
      |   CAST(0.7 AS DOUBLE) * sl.rel - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * greatest(p1.sim, p2.sim, p3.sim, p4.sim) AS score
      |  FROM sl
      |  JOIN s1 ON s1.query_id = sl.query_id
      |   AND sl.neighbor_id <> s1.neighbor_id
      |  JOIN s2 ON s2.query_id = sl.query_id
      |   AND sl.neighbor_id <> s2.neighbor_id
      |  JOIN s3 ON s3.query_id = sl.query_id
      |   AND sl.neighbor_id <> s3.neighbor_id
      |  JOIN s4 ON s4.query_id = sl.query_id
      |   AND sl.neighbor_id <> s4.neighbor_id
      |  JOIN sim p1 ON p1.query_id = sl.query_id
      |   AND p1.a = sl.neighbor_id AND p1.b = s1.neighbor_id
      |  JOIN sim p2 ON p2.query_id = sl.query_id
      |   AND p2.a = sl.neighbor_id AND p2.b = s2.neighbor_id
      |  JOIN sim p3 ON p3.query_id = sl.query_id
      |   AND p3.a = sl.neighbor_id AND p3.b = s3.neighbor_id
      |  JOIN sim p4 ON p4.query_id = sl.query_id
      |   AND p4.a = sl.neighbor_id AND p4.b = s4.neighbor_id)
      | QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY score DESC, neighbor_id) = 1)
      |SELECT query_id, CAST(1 AS BIGINT) AS mmr_rank, neighbor_id,
      | score FROM s1
      |UNION ALL SELECT query_id, 2, neighbor_id, score FROM s2
      |UNION ALL SELECT query_id, 3, neighbor_id, score FROM s3
      |UNION ALL SELECT query_id, 4, neighbor_id, score FROM s4
      |UNION ALL SELECT query_id, 5, neighbor_id, score FROM s5""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    Similarity.mmrRerank(
      emb.filter(col("id") < 10), emb.filter(col("id") >= 10),
      shortlist = 20, k = 5, lambda = 0.7)
  }

  /** The ANN recall MONITOR as an oracle-checked query: per-query
    * recall@5 of the persisted portable IVF index (s04's — same name,
    * same frozen quantizer) against brute-force exact cosine. Both
    * sides are deterministic (portable md5-init k-means, 6dp rounds,
    * id tiebreaks), so the recall FRACTION itself is engine-exact: the
    * oracle re-derives the index with the unrolled-Lloyd CTEs, probes
    * it, takes the exact top-5, and counts the overlap. This is the
    * read-only twin of `EdgeRunner --mode recall-check` (which uses
    * the production xxhash-sampled monitor over the maintained index);
    * registering it makes the round's retrain-trigger measurement part
    * of the correctness surface, not just a CLI verdict. Scale shape:
    * ANN side probes bucketed cells; the exact side is one bounded
    * corpus scan against broadcast queries — the documented price of
    * ground truth, paid on the monitoring cadence. */
  val s15 = q("s15_ivf_recall",
    s"""$ivfOracleCtes,
      |probe AS (SELECT vec_id AS query_id, cid FROM (
      | SELECT qs.vec_id, c.cid,
      |  ROW_NUMBER() OVER (PARTITION BY qs.vec_id
      |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(qs.v, c.v), c.cid) AS r
      | FROM qs, c2 c) WHERE r <= 4),
      |ann AS (SELECT query_id, neighbor_id FROM (
      | SELECT p.query_id, af.vec_id AS neighbor_id,
      |  round(list_cosine_similarity(qe.v, af.v), 6) AS cos
      | FROM probe p JOIN af ON af.cid = p.cid JOIN e qe ON qe.vec_id = p.query_id)
      | QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY cos DESC, neighbor_id) <= 5),
      |exact AS (SELECT query_id, neighbor_id FROM (
      | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  round(list_cosine_similarity(q.v, c.v), 6) AS cos
      | FROM qs q, corp c)
      | QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY cos DESC, neighbor_id) <= 5)
      |SELECT x.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
      | CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
      | round(CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*), 6) AS recall
      |FROM exact x LEFT JOIN ann a
      | ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
      |GROUP BY x.query_id""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val model = Similarity.ensureIvfIndex(s, ivfIndexName(dir),
      emb.filter(col("id") >= 10), nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)))
    val queries = emb.filter(col("id") < 10)
    val ann = Similarity.ivfTopK(queries, model, k = 5, nProbe = 4)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    Similarity.bruteForceTopK(queries, emb.filter(col("id") >= 10), k = 5)
      .select("query_id", "neighbor_id")
      .join(ann, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_exact"), 6))
  }

  /** Hybrid retrieval fusion (s16): the lexical and vector stacks
    * finally COMPOSE — per query (ids < 10, which have BOTH a document
    * and an embedding), reciprocal-rank-fuse
    * ([[graft.operators.Relational.rrfFuse]], K = 60)
    *  - the VECTOR leg: top-20 by the persisted portable IVF index
    *    (s04's — same name, same frozen quantizer, nProbe 4), and
    *  - the LEXICAL leg: top-20 BM25 ([[graft.operators.TextAnalysis
    *    .bm25PerQuery]]) where each query's terms are its own
    *    document's top-3 tf-idf keywords (the t17 rule) scored against
    *    the corpus docs (ids >= 10)
    * — the standard production shape for corpus search and
    * contamination triage. Both legs re-derive in DuckDB from the s04
    * unrolled-Lloyd CTEs and the t17/t24 CTE blocks; contributions
    * round 6dp and DECIMAL-sum, so the fused ranking is engine-exact.
    * Scale: each leg reads its fact table once (probed cells / filtered
    * posting lists); the fusion works on queries × 20 × 2 rows. */
  val s16 = q("s16_hybrid_rrf",
    s"""$ivfOracleCtes,
      |probe AS (SELECT vec_id AS query_id, cid FROM (
      | SELECT qs.vec_id, c.cid,
      |  ROW_NUMBER() OVER (PARTITION BY qs.vec_id
      |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(qs.v, c.v), c.cid) AS r
      | FROM qs, c2 c) WHERE r <= 4),
      |vleg AS (SELECT query_id, neighbor_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn FROM (
      | SELECT p.query_id, af.vec_id AS neighbor_id,
      |  round(list_cosine_similarity(qe.v, af.v), 6) AS cos
      | FROM probe p JOIN af ON af.cid = p.cid JOIN e qe ON qe.vec_id = p.query_id)
      | QUALIFY rn <= 20),
      |btoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tf_all AS (SELECT doc_id, term, COUNT(*) AS tf FROM
      |  (SELECT doc_id, unnest(t) AS term FROM btoks) GROUP BY doc_id, term),
      |df_all AS (SELECT term, COUNT(*) AS df FROM tf_all GROUP BY term),
      |nn AS (SELECT COUNT(*) AS n FROM documents),
      |qterms AS (SELECT doc_id AS query_id, term FROM (
      | SELECT tf_all.doc_id, tf_all.term,
      |  ROW_NUMBER() OVER (PARTITION BY tf_all.doc_id
      |   ORDER BY round(tf * ln((nn.n + 1.0) / (df_all.df + 1)), 6) DESC,
      |    tf_all.term) AS rn
      | FROM tf_all JOIN df_all USING (term) CROSS JOIN nn
      | WHERE tf_all.doc_id < 10) WHERE rn <= 3),
      |bdocs AS (SELECT doc_id, t FROM btoks WHERE doc_id >= 10),
      |bstats AS (SELECT COUNT(*) AS n, CAST(SUM(len(t)) AS BIGINT) AS sum_dl
      | FROM bdocs),
      |posting AS (SELECT doc_id, CAST(dl AS BIGINT) AS dl, term, COUNT(*) AS tf
      | FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM bdocs)
      | WHERE term IN (SELECT DISTINCT term FROM qterms)
      | GROUP BY doc_id, term, dl),
      |dft AS (SELECT term, COUNT(*) AS df FROM posting GROUP BY term),
      |bparts AS (SELECT q.query_id, p.doc_id,
      |  round(ln(1.0 + (bstats.n - dft.df + 0.5) / (dft.df + 0.5))
      |    * (p.tf * (1.2 + 1.0)) / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * p.dl * bstats.n / bstats.sum_dl)), 6)
      |   AS part
      | FROM posting p JOIN dft USING (term) JOIN qterms q USING (term)
      | CROSS JOIN bstats),
      |bscored AS (SELECT query_id, doc_id,
      |  CAST(SUM(CAST(part AS DECIMAL(30,10))) AS DOUBLE) AS score
      | FROM bparts GROUP BY query_id, doc_id),
      |lleg AS (SELECT query_id, doc_id AS neighbor_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, doc_id) AS BIGINT) AS rn
      | FROM bscored QUALIFY rn <= 20),
      |fused AS (SELECT query_id, neighbor_id,
      |  CAST(SUM(CAST(round(1.0 / (60 + rn), 6) AS DECIMAL(30,10))) AS DOUBLE) AS rrf,
      |  CAST(COUNT(*) AS BIGINT) AS n_legs
      | FROM (SELECT * FROM vleg UNION ALL SELECT * FROM lleg)
      | GROUP BY query_id, neighbor_id)
      |SELECT query_id, neighbor_id, rrf, n_legs,
      | CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY rrf DESC, neighbor_id) AS BIGINT) AS rn
      |FROM fused QUALIFY rn <= 10""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    // the fused read is COMPOSED across the IVF and lexical families:
    // each leg gates on the intersection of both committed sets
    // (FamilyCommit.visibleAcross — no-op for these legacy-open
    // fixtures), so an ingest committed in one family but not yet the
    // other enters NEITHER leg and RRF ranks never mix a half-landed
    // ingest (spec-locked in CrossFamilySpec)
    val lexName = ensureLexicalIndex(s, dir)
    val model = Similarity.ensureIvfIndex(s, ivfIndexName(dir),
      emb.filter(col("id") >= 10), nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)), coFamilies = Seq(lexName))
    val vleg = Similarity.ivfTopK(emb.filter(col("id") < 10), model,
        k = 20, nProbe = 4)
      .select("query_id", "neighbor_id", "rn")
    // tiny (queries × 3 rows) but DERIVED from a full corpus tf-idf:
    // checkpointed so the two consumers inside bm25PerQuery (posting
    // term filter + per-query fan-out) don't re-run the derivation
    val qterms = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 3)
      .filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("term"))
      .localCheckpoint(false)
    // the lexical leg probes the PERSISTED posting family (bucket-
    // pruned term lists + summed stats rows) — corpus text is never
    // re-scanned per retrieval call; table-vs-inline equivalence is
    // spec-locked, so the oracle's from-scratch derivation still holds
    val lleg = TextAnalysis.bm25FromTables(s, lexName,
        qterms, topN = 20, coFamilies = Seq(ivfIndexName(dir)))
      .select(col("query_id"), col("doc_id").as("neighbor_id"), col("rn"))
    Relational.rrfFuse(Seq(vleg, lleg), k = 10)
  }

  /** Cohort retention over the event stream: users cohorted by the ISO
    * week of their first signup; every later event lands in a
    * (cohort-week, week-offset) cell with distinct-user and event
    * counts — the standard growth-analytics retention matrix. The
    * first-signup time is a partition-wide window min (no self-join of
    * the event table against its own aggregate), so the plan is one
    * user-id shuffle + one cohort-cell hash agg. Week arithmetic stays
    * in integer epoch-µs on week-aligned values — exact on both
    * engines. */
  val q78 = q("q78_cohort_retention",
    """WITH t0 AS (
      | SELECT user_id, ts,
      |  min(CASE WHEN event_type = 'signup' THEN ts END)
      |    OVER (PARTITION BY user_id) AS t0
      | FROM events),
      |a AS (
      | SELECT user_id, CAST(date_trunc('week', t0) AS TIMESTAMP) AS cohort_week,
      |  (epoch_us(date_trunc('week', ts)) - epoch_us(date_trunc('week', t0)))
      |    // 604800000000 AS week_offset
      | FROM t0 WHERE t0 IS NOT NULL AND ts >= t0)
      |SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
      | COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      |FROM a GROUP BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t0",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .filter(col("t0").isNotNull && col("ts") >= col("t0"))
      .withColumn("cohort_week", date_trunc("week", col("t0")))
      .withColumn("week_offset", expr(
        "(unix_micros(date_trunc('week', ts)) - unix_micros(cohort_week))" +
          " DIV 604800000000"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
  }

  /** Skew-safe two-phase aggregation (Skew.saltedAgg) surfaced on the
    * oracle gate: events grouped by event_type — the exact shape that
    * straggles at 100 TB when one key carries half the rows. Phase 1
    * spreads each key over 16 content-hash salts, phase 2 merges the
    * ≤16 partials per key; all aggregates are associative-exact (count,
    * BIGINT cent-sum, min/max), so the split-merge is bit-identical to
    * the plain GROUP BY the oracle runs. The uniform testdata can't
    * manufacture the straggler, but it proves the rewrite's algebra;
    * AsOfSkewSpec proves the salt actually spreads rows. */
  val q79 = q("q79_salted_agg",
    """SELECT event_type, COUNT(*) AS n_events,
      | CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      | min(event_id) AS min_event, max(event_id) AS max_event
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("value_cents"))
    Skew.saltedAgg(ev, Seq("event_type"), salts = 16, Seq(
      Skew.Agg("n_events", lit(1), "count"),
      Skew.Agg("sum_cents", col("value_cents"), "sum"),
      Skew.Agg("min_event", col("event_id"), "min"),
      Skew.Agg("max_event", col("event_id"), "max")))
  }

  /** Co-located fact join over BUCKETED tables (Bucketing.writeBucketed
    * — the pre-shuffle-once physical design for a fact table every
    * query joins on the same key): lineitem ⋈ orders on orderkey with
    * ZERO exchange on either join side (BucketingSpec locks the plan
    * property), then a 5-group priority rollup. The bucketed artifacts
    * are built once per SF dir (prepare(), the ensureClusters
    * precedent), so the timed query measures the production read path:
    * at 100 TB this is the difference between re-shuffling 60 B rows
    * per query and never shuffling them again. */
  val q80 = q("q80_bucketed_join",
    s"""SELECT o_orderpriority, COUNT(*) AS n_items,
       | ${dsumLSql("l_quantity")} AS sum_qty,
       | ${dsumLSql("l_extendedprice")} AS sum_price
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    val (liT, ordT) = ensureBucketed(s, dir)
    s.table(liT).join(s.table(ordT),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        dsumL(col("l_quantity")).as("sum_qty"),
        dsumL(col("l_extendedprice")).as("sum_price"))
  }

  /** FILTER-clause aggregates — the SQL-standard conditional-aggregation
    * verb (one pass, N conditions), exercised through Spark's SQL PATH
    * (the q31 precedent) so the parser/analyzer surface is covered, not
    * just the `sum(when(...))` DataFrame rewrite it lowers to. Exact
    * DECIMAL sum under the filter keeps cross-engine bit parity; one
    * scan, one hash aggregate — conditions never become self-joins. */
  val q81 = q("q81_filter_agg",
    """SELECT o_orderpriority,
      | COUNT(*) AS n_orders,
      | COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
      | CAST(coalesce(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
      |   FILTER (WHERE o_totalprice > 150000), 0) AS DOUBLE) AS sum_big,
      | COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'F')
      |   AS n_fin_cust
      |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).createOrReplaceTempView("graft_q81_orders")
    s.sql("""SELECT o_orderpriority,
      | COUNT(*) AS n_orders,
      | COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
      | CAST(coalesce(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
      |   FILTER (WHERE o_totalprice > 150000), 0) AS DOUBLE) AS sum_big,
      | COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'F')
      |   AS n_fin_cust
      |FROM graft_q81_orders GROUP BY o_orderpriority""".stripMargin)
  }

  /** Single-pass column profile (Deequ/dbt-style data validation): one
    * row per audited column with null count, exact distinct count, and
    * min/max (stringified for a uniform schema) — the expectations
    * check a pipeline runs on every landed partition before consumers
    * touch it. ONE scan computes every column's aggregates side by
    * side (multi-distinct plans Spark's expand, the standard cost of
    * exact profiles; swap in approx_count_distinct for the 100 TB
    * profile where 2% error is fine — q29 documents that contract);
    * the per-column pivot is a stack/unpivot over the 1-row result,
    * free. */
  val q85 = q("q85_table_profile",
    """WITH a AS (SELECT COUNT(*) AS n_rows,
      |  COUNT(*) - COUNT(o_custkey) AS null_custkey,
      |  COUNT(DISTINCT o_custkey) AS nd_custkey,
      |  CAST(min(o_custkey) AS VARCHAR) AS min_custkey,
      |  CAST(max(o_custkey) AS VARCHAR) AS max_custkey,
      |  COUNT(*) - COUNT(o_orderstatus) AS null_status,
      |  COUNT(DISTINCT o_orderstatus) AS nd_status,
      |  CAST(min(o_orderstatus) AS VARCHAR) AS min_status,
      |  CAST(max(o_orderstatus) AS VARCHAR) AS max_status,
      |  COUNT(*) - COUNT(o_orderdate) AS null_date,
      |  COUNT(DISTINCT o_orderdate) AS nd_date,
      |  CAST(min(o_orderdate) AS VARCHAR) AS min_date,
      |  CAST(max(o_orderdate) AS VARCHAR) AS max_date
      | FROM orders)
      |SELECT 'o_custkey' AS column_name, n_rows, null_custkey AS n_null,
      | nd_custkey AS n_distinct, min_custkey AS min_value, max_custkey AS max_value FROM a
      |UNION ALL
      |SELECT 'o_orderstatus', n_rows, null_status, nd_status, min_status, max_status FROM a
      |UNION ALL
      |SELECT 'o_orderdate', n_rows, null_date, nd_date, min_date, max_date FROM a""".stripMargin) { (s, dir) =>
    Relational.profile(Tables.orders(s, dir),
      Seq("o_custkey", "o_orderstatus", "o_orderdate"))
  }

  /** The 100 TB profile twin (q86): q85's schema with
    * approx_count_distinct. The production operator is
    * [[Relational.profileApprox]] — a single pass with NO Expand
    * (exact multi-distinct replicates every row per audited column
    * into the shuffle; the sketch form doesn't — plan-locked in
    * PlanShapeSpec). Oracle discipline = q29/q83: dumped columns are
    * the EXACT distinct counts plus a boolean asserting each sketch
    * estimate landed within 5% of exact (rsd 0.0125 → >4 sigma,
    * deterministic given the data; verified at every shipped SF and
    * the 100× replica); the oracle emits TRUE, so a drifting sketch
    * hash-mismatches. The GATE runs the exact and approx profiles as
    * SEPARATE passes joined on column_name — the q29 lesson, measured
    * here too: a combined agg drags each column's 2^13-register HLL
    * buffer through the exact multi-distinct Expand (rows × columns
    * copies), 1.2 s → 6.6 s at sf0.1. Two scans beat one scan when
    * one of them would carry sketch state through an Expand. */
  val q86 = q("q86_profile_approx",
    """WITH a AS (SELECT COUNT(*) AS n_rows,
      |  COUNT(*) - COUNT(o_custkey) AS null_custkey,
      |  COUNT(DISTINCT o_custkey) AS nd_custkey,
      |  CAST(min(o_custkey) AS VARCHAR) AS min_custkey,
      |  CAST(max(o_custkey) AS VARCHAR) AS max_custkey,
      |  COUNT(*) - COUNT(o_orderstatus) AS null_status,
      |  COUNT(DISTINCT o_orderstatus) AS nd_status,
      |  CAST(min(o_orderstatus) AS VARCHAR) AS min_status,
      |  CAST(max(o_orderstatus) AS VARCHAR) AS max_status,
      |  COUNT(*) - COUNT(o_orderdate) AS null_date,
      |  COUNT(DISTINCT o_orderdate) AS nd_date,
      |  CAST(min(o_orderdate) AS VARCHAR) AS min_date,
      |  CAST(max(o_orderdate) AS VARCHAR) AS max_date
      | FROM orders)
      |SELECT 'o_custkey' AS column_name, n_rows, null_custkey AS n_null,
      | nd_custkey AS n_distinct, min_custkey AS min_value,
      | max_custkey AS max_value, TRUE AS nd_within_5pct FROM a
      |UNION ALL
      |SELECT 'o_orderstatus', n_rows, null_status, nd_status, min_status,
      | max_status, TRUE FROM a
      |UNION ALL
      |SELECT 'o_orderdate', n_rows, null_date, nd_date, min_date,
      | max_date, TRUE FROM a""".stripMargin) { (s, dir) =>
    val cols = Seq("o_custkey", "o_orderstatus", "o_orderdate")
    val approx = Relational.profileApprox(Tables.orders(s, dir), cols)
      .select(col("column_name"), col("n_distinct").as("nd_approx"))
    Relational.profile(Tables.orders(s, dir), cols)
      .join(broadcast(approx), "column_name")
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_value"), col("max_value"),
        (abs(col("nd_approx") - col("n_distinct")) <=
          col("n_distinct") * 0.05).as("nd_within_5pct"))
  }

  /** Re-aggregatable FREQUENCY sketches (Count-Min): per-day CMS
    * states built with Spark's `count_min_sketch` aggregate, merged to
    * the event_type rollup by the typed CmsMerge Aggregator (counters
    * are additive; Spark ships no SQL merge function) — q83's HLL
    * pattern for point frequencies instead of distinct counts. The
    * invariants are the CMS contract and DETERMINISTIC given the
    * fixed seed + data: estimates never undercount (hard guarantee),
    * and the overcount gate uses 3·eps·N — NOT the 1·eps·N that holds
    * only with prob 0.99 PER point query (15 queries/run ⇒ ~14% of
    * seed/data draws would legitimately flip a 1× gate red with
    * correct code). At 3× the per-row Markov failure odds are
    * ≤ 1/(3e) across d=5 rows ⇒ ≤ (3e)⁻⁵ ≈ 3e-6 per query — a
    * seed-fixed violation is impossible for any shipped data family
    * (also verified empirically at every SF and the 100x replica).
    * The estimate UDF touches 3 users x 5 types = 15 rows of
    * pre-broadcast sketches — never the fact table. */
  val q84 = q("q84_cms_merge",
    """WITH e AS (SELECT event_type, user_id, COUNT(*) AS exact_n
      |  FROM events WHERE user_id IN (1, 2, 3)
      |  GROUP BY event_type, user_id)
      |SELECT event_type, user_id, exact_n,
      | TRUE AS ge_exact, TRUE AS within_eps
      |FROM e""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
    // n_day rides the daily sketch pass (r19): the per-type totals the
    // eps-gate needs are just the daily counts re-summed, so the
    // third full events scan (a groupBy(type) count) is gone — events
    // is now scanned twice: once for the daily sketches, once with
    // the pushed user_id IN (1,2,3) filter for the exact side.
    val daily = ev.groupBy(col("event_type"), col("d"))
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"),
        count(lit(1)).as("n_day"))
    val merged = daily.groupBy(col("event_type"))
      .agg(graft.functions.Aggregators.cmsMerge(col("sk")).as("sk"),
        sum(col("n_day")).as("n_total"))
    val estimate = udf((sk: Array[Byte], u: Long) =>
      graft.functions.Aggregators.cmsEstimate(sk, u))
    val exact = ev.filter(col("user_id").isin(1L, 2L, 3L))
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("exact_n"))
    exact
      .join(broadcast(merged), "event_type")
      .withColumn("est", estimate(col("sk"), col("user_id")))
      .select(col("event_type"), col("user_id"), col("exact_n"),
        (col("est") >= col("exact_n")).as("ge_exact"),
        (col("est") <= col("exact_n") + ceil(col("n_total") * 0.003))
          .as("within_eps"))
  }

  /** Approximate quantiles (q87) — the third classic big-data sketch
    * after HLL (q83) and CMS (q84): percentile_approx's
    * QuantileSummaries (Greenwald-Khanna) computes distributed
    * quantiles in one pass with a DETERMINISTIC rank guarantee —
    * the returned element's rank is within N/accuracy of the target
    * for ANY partitioning/merge order, which is exactly why the gate
    * emits in-bound BOOLEANS and not the element (a different merge
    * order may surface a different element inside the band; the band
    * itself never moves). Bounds = Spark's exact interpolated
    * percentiles at p ± 5/accuracy — 5× the sketch's rank error, so
    * interpolation-vs-rank slack can't flip the gate. Exact COUNT
    * rides for the oracle (q29 discipline: the oracle emits TRUE, a
    * drifting sketch hash-mismatches). Validity bound (the q84
    * triage discipline): the band argument needs the ±0.004 rank
    * slack to exceed one rank, i.e. N > 250 rows per group — below
    * that the interpolated bounds can sit strictly between adjacent
    * order statistics and exclude the (exact) surfaced element. Every
    * shipped SF has ≥ ~2000 events per type; a red q87 on a tiny new
    * data family is that bound, not a sketch bug. At 100 TB the exact
    * percentile (full sort per group) is the thing you CAN'T run —
    * the sketch is one narrow pass + tiny merges; here exact runs
    * only to verify. */
  val q87 = q("q87_approx_quantiles",
    """SELECT event_type, COUNT(*) AS n,
      | TRUE AS p50_in_bounds, TRUE AS p95_in_bounds
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    // the rank-band gate is auto-guarded below n=250 (small groups
    // emit TRUE by construction — see Relational.approxQuantileGate),
    // so a tiny-SF or replica run cannot go red on correct code
    Relational.approxQuantileGate(Tables.events(s, dir), "event_type", "value")
  }

  /** Incremental aggregate maintenance (materialized-view refresh):
    * base facts are aggregated into a persisted STATE once, a raw
    * delta folds in via one associative merge (Skew.incrementalAgg) —
    * the refresh never rescans base facts, so at 100 TB the cost is
    * O(delta) + O(group cardinality) instead of O(table). All aggs
    * associative (count/sum/min/max over BIGINT cents), so the merged
    * state is bit-identical to the from-scratch GROUP BY the oracle
    * runs over ALL events. The base/delta boundary here is a
    * deterministic id split (stands in for the date boundary a
    * production refresh uses; the oracle is split-invariant). */
  val q82 = q("q82_incremental_agg",
    """SELECT event_type, COUNT(*) AS n_events,
      | CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      | min(event_id) AS min_event, max(event_id) AS max_event
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("value_cents"))
    val aggs = Seq(
      Skew.Agg("n_events", lit(1), "count"),
      Skew.Agg("sum_cents", col("value_cents"), "sum"),
      Skew.Agg("min_event", col("event_id"), "min"),
      Skew.Agg("max_event", col("event_id"), "max"))
    val state = Skew.partialAgg(
      ev.filter(pmod(col("event_id"), lit(5)) < 4), Seq("event_type"), aggs)
    Skew.incrementalAgg(state,
      ev.filter(pmod(col("event_id"), lit(5)) === 4), Seq("event_type"), aggs)
  }

  /** Re-aggregatable distinct-count sketches (Datasketches HLL): the
    * 100 TB rollup pattern — per-day sketches built ONCE near the
    * data, then any coarser rollup (here event_type across all days)
    * is a cheap sketch UNION over tiny binary states, never a rescan
    * of raw ids. COUNT(DISTINCT) cannot re-aggregate (distinct sets
    * don't add); sketches exist precisely to make that lossless-ish.
    * Oracle discipline = q29: the dumped columns are the EXACT
    * distinct counts plus booleans asserting the merged estimate
    * landed within 5% (lgConfigK=14 → RSE ~0.8%, so 5% is a >6-sigma
    * bound); the oracle emits TRUE, so a drifting sketch
    * hash-mismatches. */
  val q83 = q("q83_sketch_merge",
    """SELECT event_type,
      | COUNT(DISTINCT user_id) AS exact_users,
      | TRUE AS merged_within_5pct
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
    val daily = ev.groupBy(col("event_type"), col("d"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
    val merged = daily.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("approx_users"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(merged, "event_type")
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.05).as("merged_within_5pct"))
  }

  /** Catalog-safe bucketed-table name, unique per SF directory. */
  private def bucketedName(dir: String, t: String): String =
    s"graft_bkt_${t}_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Build-once bucketed lineitem/orders (8 buckets on orderkey, sorted
    * within buckets): the write pays the shuffle once; every subsequent
    * orderkey join reads co-located buckets with no exchange. Full
    * column set — a production bucketed fact table serves all queries,
    * not one. Keyed on a data fingerprint, not just the path: stale
    * tables after an in-place testdata regeneration are rebuilt. */
  def ensureBucketed(s: SparkSession, dir: String): (String, String) = synchronized {
    import graft.sources.DerivedTables
    val li = bucketedName(dir, "lineitem")
    val ord = bucketedName(dir, "orders")
    DerivedTables.ensure(s, Seq(li), DerivedTables.sourceFingerprint(dir, "lineitem")) {
      graft.sources.Bucketing.writeBucketed(
        Tables.lineitem(s, dir), li, "l_orderkey", 8)
    }
    DerivedTables.ensure(s, Seq(ord), DerivedTables.sourceFingerprint(dir, "orders")) {
      graft.sources.Bucketing.writeBucketed(
        Tables.orders(s, dir), ord, "o_orderkey", 8)
    }
    (li, ord)
  }

  /** Canonical-document selection per near-dup cluster: from each d07
    * cluster keep the member with the most tokens (doc_id tiebreak) —
    * the "keep best, drop the rest" step that turns near-dup detection
    * into an actual corpus reduction. Consumes the PERSISTED cluster
    * artifact (ensureClusters, the d08 precedent) and joins token
    * counts; both window columns share one cluster-id shuffle. The
    * oracle rebuilds the same clusters from scratch (d07/d08's
    * recursive CTE) and applies the same keep rule. */
  val d14 = q("d14_cluster_canonical",
    """WITH RECURSIVE d AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
      |pairs AS (
      | SELECT doc_a, doc_b FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |   CAST(COUNT(*) AS DOUBLE) / (min(a.n) + min(b.n) - COUNT(*)) AS jaccard
      |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      | WHERE jaccard >= 0.5),
      |edges AS (
      | SELECT doc_a AS src, doc_b AS dst FROM pairs
      | UNION SELECT doc_b, doc_a FROM pairs),
      |reach(doc_id, r) AS (
      | SELECT src, src FROM edges
      | UNION
      | SELECT re.doc_id, e.dst FROM reach re JOIN edges e ON e.src = re.r),
      |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
      |tok AS (SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
      |ranked AS (
      | SELECT cl.cluster_id, cl.doc_id, t.n_tok,
      |  COUNT(*) OVER (PARTITION BY cl.cluster_id) AS n_members,
      |  ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
      |    ORDER BY t.n_tok DESC, cl.doc_id) AS rn
      | FROM cl JOIN tok t ON t.doc_id = cl.doc_id)
      |SELECT cluster_id, doc_id AS keep_doc, n_tok AS keep_n_tok,
      | CAST(n_members AS BIGINT) AS n_members,
      | CAST(n_members - 1 AS BIGINT) AS n_dropped
      |FROM ranked WHERE rn = 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val cl = ensureClusters(s, dir)
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
    val w = Window.partitionBy("cluster_id")
    cl.join(tok, "doc_id")
      .withColumn("n_members", count(lit(1)).over(w).cast("long"))
      .withColumn("rn", row_number()
        .over(w.orderBy(col("n_tok").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("keep_doc"),
        col("n_tok").as("keep_n_tok"), col("n_members"),
        (col("n_members") - 1L).as("n_dropped"))
  }

  /** Composed corpus-mix refresh: classifier gate → exact dedup →
    * shard mixing, the p01 pipeline with the t20 model-inference gate
    * in place of the heuristic quality gate. Score, fingerprint, and
    * the gate all ride ONE documents scan (plan-locked); dedup is the
    * d02 keep-min rule on the fingerprint; shards are the t19 hash
    * rule. Per-shard rollup: doc count, exact BIGINT score mass,
    * smallest kept id. */
  val p03 = q("p03_classifier_mix",
    s"""WITH f AS (
       | SELECT doc_id, unnest(list_concat(toks,
       |   CASE WHEN len(toks) < 2 THEN []
       |    ELSE list_transform(range(1, len(toks)),
       |      i -> toks[i] || ' ' || toks[i + 1]) END)) AS f
       | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
       |w AS (
       | SELECT doc_id,
       |  CAST(concat('0x', substr(md5(CAST(
       |    CAST(concat('0x', substr(md5(f), 1, 13)) AS BIGINT) % 4096
       |   AS VARCHAR)), 1, 13)) AS BIGINT) % 2001 - 1000 AS wt
       | FROM f),
       |sc AS (SELECT doc_id, SUM(wt) AS score FROM w GROUP BY doc_id),
       |fp AS (SELECT doc_id, md5($normSql) AS fp FROM documents),
       |kept AS (
       | SELECT s.doc_id, s.score, p.fp FROM sc s JOIN fp p USING (doc_id)
       | WHERE s.score > 0),
       |k1 AS (SELECT doc_id, score FROM (
       | SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
       | FROM kept) WHERE rn = 1),
       |sh AS (SELECT doc_id, score,
       |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
       |    AS BIGINT) % 8 AS shard
       | FROM k1)
       |SELECT shard, COUNT(*) AS n_docs,
       | CAST(SUM(score) AS BIGINT) AS sum_score, min(doc_id) AS min_doc
       |FROM sh GROUP BY shard""".stripMargin) { (s, dir) =>
    val staged = Tables.documents(s, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__t"),
        TextOps.fingerprint(col("text")).as("fp"))
      .select(col("doc_id"),
        graft.plans.TextHash.classifierScore(col("__t")).as("score"), col("fp"))
    // The gate rides the dedup window instead of a pre-filter: a
    // Filter directly over the scoring projection gets the scoring
    // expression SUBSTITUTED into its condition by predicate
    // pushdown — every doc then pays the classifier twice (measured
    // 5.1 s vs 1.1 s at sf0.1 on the interpreted spelling; the native
    // expression shrinks but does not remove the duplicate work).
    // Ordering kept-first makes rn=1 the min-id KEPT doc whenever the
    // cluster has one, and the score predicate cannot push through a
    // Window on a non-partition column, so the classifier is evaluated
    // exactly once per doc. The shuffle carries (doc_id, score, fp)
    // for ALL docs — ~32 bytes/row — the price of the compute-once
    // guarantee.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy((col("score") <= 0L).asc, col("doc_id"))
    staged.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("score") > 0L)
      .withColumn("shard", TextAnalysis.shardOf(col("doc_id"), 8))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("score")).as("sum_score"),
        min(col("doc_id")).as("min_doc"))
  }

  /** Source-balanced corpus mix: per-source token quotas (p05). Every
    * source keeps its best-classifier-scored docs up to the SAME token
    * budget, so no single crawl dominates the training mix — the
    * per-group variant of t22's global budget. Window partitioned by
    * source → independent per-source shuffle partitions, no global
    * sort anywhere. Same md5-hashed-classifier scoring as t20/t22. */
  val p05 = q("p05_source_quota",
    """WITH b AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
      |f AS (SELECT doc_id, unnest(list_concat(toks,
      |  CASE WHEN len(toks) < 2 THEN []
      |   ELSE list_transform(range(1, len(toks)),
      |     i -> toks[i] || ' ' || toks[i + 1]) END)) AS f FROM b),
      |w AS (SELECT doc_id,
      |  CAST(concat('0x', substr(md5(CAST(
      |    CAST(concat('0x', substr(md5(f), 1, 13)) AS BIGINT) % 4096
      |   AS VARCHAR)), 1, 13)) AS BIGINT) % 2001 - 1000 AS wt
      | FROM f),
      |sc AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS score FROM w GROUP BY doc_id),
      |n AS (SELECT doc_id, source,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
      |r AS (SELECT n.source, n.doc_id, n.n_tok, sc.score,
      |  CAST(SUM(n.n_tok) OVER (PARTITION BY n.source
      |    ORDER BY sc.score DESC, n.doc_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
      | FROM n JOIN sc USING (doc_id))
      |SELECT source, doc_id, n_tok, score, cum_tok FROM r
      |WHERE cum_tok <= 700""".stripMargin) { (s, dir) =>
    TextAnalysis.sourceQuotaSelect(Tables.documents(s, dir),
      "doc_id", "text", "source", quota = 700L)
  }

  /** Composed incremental daily-ingest pipeline (p06): the batch that
    * lands next to a 100 TB corpus — classifier quality gate (t20) →
    * exact dedup vs the corpus (d02/d10 fingerprint rule) → VERIFIED
    * near-dup delta vs the corpus (d15: new×old band join only, never
    * old×old) → per-source landing rollup. Every stage is an
    * anti-join against PERSISTED corpus-side KEY tables
    * ([[ensureIngestKeys]]: bucketed fingerprints, band signatures,
    * shingle sets), so the per-batch plan reads corpus KEYS, never
    * corpus text — no corpus document is re-scanned per ingest
    * (plan-locked in PlanShapeSpec; d15 keeps timing the inline
    * operator, the d07/d08 artifact split). The oracle chains the
    * t20/d02/d05 spellings with the membership predicates. */
  val p06 = q("p06_incremental_ingest",
    """WITH b AS (SELECT doc_id, source, text, string_split(text, ' ') AS t
      |  FROM documents),
      |f AS (SELECT doc_id, unnest(list_concat(t,
      |  CASE WHEN len(t) < 2 THEN []
      |   ELSE list_transform(range(1, len(t)),
      |     i -> t[i] || ' ' || t[i + 1]) END)) AS f
      | FROM b WHERE doc_id % 10 = 0),
      |w AS (SELECT doc_id,
      |  CAST(concat('0x', substr(md5(CAST(
      |    CAST(concat('0x', substr(md5(f), 1, 13)) AS BIGINT) % 4096
      |   AS VARCHAR)), 1, 13)) AS BIGINT) % 2001 - 1000 AS wt
      | FROM f),
      |sc AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS score FROM w GROUP BY doc_id),
      |gated AS (SELECT n.doc_id, n.source, n.text, n.t FROM b n
      | JOIN sc ON sc.doc_id = n.doc_id WHERE n.doc_id % 10 = 0 AND sc.score > 0),
      |cfp AS (SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      | FROM b WHERE doc_id % 10 <> 0),
      |ex AS (SELECT g.* FROM gated g
      | WHERE md5(regexp_replace(lower(trim(g.text)), '\s+', ' ', 'g'))
      |  NOT IN (SELECT fp FROM cfp)),
      |d AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh FROM b),
      |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
      |neardup AS (SELECT a.doc_id AS doc_new
      | FROM e a JOIN e b2 ON a.s = b2.s
      |  AND a.doc_id % 10 = 0 AND b2.doc_id % 10 <> 0
      | GROUP BY a.doc_id, b2.doc_id
      | HAVING CAST(COUNT(*) AS DOUBLE) / (min(a.n) + min(b2.n) - COUNT(*)) >= 0.5),
      |kept AS (SELECT * FROM ex
      | WHERE doc_id NOT IN (SELECT doc_new FROM neardup))
      |SELECT source, COUNT(*) AS n_kept,
      | CAST(SUM(len(t)) AS BIGINT) AS sum_tok, min(doc_id) AS min_doc
      |FROM kept GROUP BY source""".stripMargin) { (s, dir) =>
    import graft.functions.TextOps
    val keys = ensureIngestKeys(s, dir)
    val docs = Tables.documents(s, dir)
    val newB = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val gated = newB.filter(
      graft.plans.TextHash.classifierScore(TextOps.tokens(col("text"))) > 0L)
    // the exact leg rides the SAME commit gate as the near-dup legs
    // inside jaccardPairsBetweenFromTables: all three key tables share
    // the `keys` family prefix, so its one marker is the UMBRELLA that
    // makes an ingest visible to the exact-key AND near-dup-key reads
    // atomically — a crash between the member appends leaves the
    // composed admission consistent (the batch is judged against the
    // previous corpus in BOTH legs). No-op for this legacy-open
    // fixture; the production path keeps the discipline.
    val exact = gated.join(
      graft.sources.FamilyCommit.visible(s, s.table(s"${keys}_norm"), keys),
      TextOps.fingerprint(col("text")) === col("__norm_key"), "left_anti")
    val nearDropped = Dedup.jaccardPairsBetweenFromTables(
        s, exact, keys, "doc_id", "text", threshold = 0.5)
      .select(col("doc_new").as("doc_id")).distinct()
    exact.join(nearDropped, Seq("doc_id"), "left_anti")
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum(size(TextOps.tokens(col("text"))).cast("long")).as("sum_tok"),
        min(col("doc_id")).as("min_doc"))
  }

  /** Composed eval-shard construction (p07): the read-only tail of a
    * training-data pipeline — t07's deterministic hash split selects
    * the test docs, t27's stratified sample draws a reproducible
    * subset (src0 at 80%, others 50%), t26's packing lays the
    * survivors into 256-token context windows. Every stage is a pure
    * function of doc_id/source, so the oracle chains the three
    * spellings and the output is hash-exact end to end. One text
    * scan + the prefix-sum machinery; nothing stateful, nothing
    * side-effecting. */
  val p07 = q("p07_eval_shard",
    """WITH test AS (
      | SELECT doc_id, source, text FROM documents
      | WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= 'f'),
      |samp AS (
      | SELECT doc_id, text FROM test
      | WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |    AS BIGINT) % 10000
      |  < CASE WHEN source = 'src0' THEN 8000 ELSE 5000 END),
      |n AS (SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM samp),
      |c AS (SELECT doc_id, n_tok,
      |  CAST(SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |    AS BIGINT) - n_tok AS start_tok
      | FROM n)
      |SELECT doc_id, n_tok, start_tok,
      | start_tok // 256 AS first_chunk,
      | (start_tok + n_tok - 1) // 256 AS last_chunk,
      | (start_tok + n_tok - 1) // 256 - start_tok // 256 + 1 AS n_chunks
      |FROM c""".stripMargin) { (s, dir) =>
    val test = TextAnalysis.hashSplit(Tables.documents(s, dir), "doc_id")
      .filter(col("split") === "test")
    val sampled = TextAnalysis.stratifiedSample(test, "doc_id", "source",
      Map("src0" -> 8000), defaultBp = 5000)
    TextAnalysis.packSequences(sampled, "doc_id", "text", contextLen = 256L)
  }

  /** Decontaminated (leakage-free) split: the t07 hash split, but near-
    * dup twins can never straddle train/test — the split key is the
    * d07 CLUSTER id for clustered docs (the doc's own id for
    * singletons), so each cluster lands whole in one split. The thing
    * a plain per-doc split gets wrong for LLM training data: a test
    * document whose near-duplicate sits in train is a leaked eval.
    * Consumes the PERSISTED cluster artifact (ensureClusters); the
    * oracle rebuilds the same clusters from scratch (d07/d14's
    * recursive CTE) and applies the same key rule. Per-split rollup:
    * docs, clustered docs, whole clusters, smallest id. */
  val p04 = q("p04_decontam_split",
    """WITH RECURSIVE d AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
      |pairs AS (
      | SELECT doc_a, doc_b FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |   CAST(COUNT(*) AS DOUBLE) / (min(a.n) + min(b.n) - COUNT(*)) AS jaccard
      |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      | WHERE jaccard >= 0.5),
      |edges AS (
      | SELECT doc_a AS src, doc_b AS dst FROM pairs
      | UNION SELECT doc_b, doc_a FROM pairs),
      |reach(doc_id, r) AS (
      | SELECT src, src FROM edges
      | UNION
      | SELECT re.doc_id, e.dst FROM reach re JOIN edges e ON e.src = re.r),
      |cl AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
      |k AS (SELECT doc.doc_id,
      |  COALESCE(cl.cluster_id, doc.doc_id) AS split_key,
      |  cl.doc_id IS NOT NULL AS clustered
      | FROM documents doc LEFT JOIN cl ON cl.doc_id = doc.doc_id),
      |sp AS (SELECT doc_id, split_key, clustered,
      |  CASE WHEN substr(md5(CAST(split_key AS VARCHAR)), 1, 1) < 'd' THEN 'train'
      |   WHEN substr(md5(CAST(split_key AS VARCHAR)), 1, 1) < 'f' THEN 'val'
      |   ELSE 'test' END AS split
      | FROM k)
      |SELECT split, COUNT(*) AS n_docs,
      | CAST(SUM(CASE WHEN clustered THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered_docs,
      | COUNT(DISTINCT CASE WHEN clustered THEN split_key END) AS n_clusters,
      | min(doc_id) AS min_doc
      |FROM sp GROUP BY split""".stripMargin) { (s, dir) =>
    TextAnalysis.decontaminatedSplit(
        Tables.documents(s, dir), ensureClusters(s, dir), "doc_id")
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("clustered"), 1L).otherwise(0L)).cast("long").as("n_clustered_docs"),
        countDistinct(when(col("clustered"), col("split_key"))).as("n_clusters"),
        min(col("doc_id")).as("min_doc"))
  }

  /** Gopher-style quality rules (token-count band, mean-token-length
    * band, symbol ratio cap, stopword floor) with per-rule booleans —
    * all integer cross-multiplied, one token array per doc. */
  val t21 = q("t21_gopher_rules",
    """WITH b AS (
      | SELECT doc_id, text, string_split(lower(text), ' ') AS toks
      | FROM documents),
      |m AS (
      | SELECT doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_tok,
      |  CAST(length(text) - (len(toks) - 1) AS BIGINT) AS n_tok_chars,
      |  CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
      |    AS BIGINT) AS n_symbols,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(len(list_filter(toks, x -> x IN
      |    ('the','a','of','and','is','to','in','that','it'))) AS BIGINT) AS n_stop
      | FROM b)
      |SELECT doc_id, n_tok, n_symbols, n_stop,
      | n_tok BETWEEN 50 AND 100000 AS ok_count,
      | (n_tok_chars >= n_tok * 3 AND n_tok_chars <= n_tok * 10) AS ok_mean_len,
      | n_symbols * 10 < n_chars AS ok_symbols,
      | (n_stop * 100 >= n_tok * 2 AND n_stop >= 1) AS ok_stopwords,
      | (n_tok BETWEEN 50 AND 100000
      |   AND n_tok_chars >= n_tok * 3 AND n_tok_chars <= n_tok * 10
      |   AND n_symbols * 10 < n_chars
      |   AND n_stop * 100 >= n_tok * 2 AND n_stop >= 1) AS keep
      |FROM m""".stripMargin) { (s, dir) =>
    TextAnalysis.gopherRules(Tables.documents(s, dir), "doc_id", "text")
  }

  /** Budget-capped quality selection — keep the best-scored documents
    * until a fixed token budget is spent (the "top docs up to N
    * tokens" curation step of a training-data refresh). The oracle is
    * the global running sum over (score DESC, doc_id); the Spark side
    * is the DISTRIBUTED PREFIX SUM (TextAnalysis.tokenBudgetSelect):
    * range-partition on the ranking key, per-partition cumsum, add
    * broadcast partition offsets — bit-identical, but no global
    * single-task sort (the q67 wall applied to an ORDER BY with no
    * partition key at all). */
  val t22 = q("t22_token_budget",
    """WITH b AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |f AS (SELECT doc_id, unnest(list_concat(toks,
      |  CASE WHEN len(toks) < 2 THEN []
      |   ELSE list_transform(range(1, len(toks)),
      |     i -> toks[i] || ' ' || toks[i + 1]) END)) AS f FROM b),
      |w AS (SELECT doc_id,
      |  CAST(concat('0x', substr(md5(CAST(
      |    CAST(concat('0x', substr(md5(f), 1, 13)) AS BIGINT) % 4096
      |   AS VARCHAR)), 1, 13)) AS BIGINT) % 2001 - 1000 AS wt
      | FROM f),
      |sc AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS score FROM w GROUP BY doc_id),
      |n AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      | FROM documents),
      |r AS (SELECT n.doc_id, n.n_tok, sc.score,
      |  CAST(SUM(n.n_tok) OVER (ORDER BY sc.score DESC, n.doc_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
      | FROM n JOIN sc USING (doc_id))
      |SELECT doc_id, n_tok, score, cum_tok FROM r
      |WHERE cum_tok <= 10000""".stripMargin) { (s, dir) =>
    TextAnalysis.tokenBudgetSelect(Tables.documents(s, dir),
      "doc_id", "text", budget = 10000L)
  }

  /** Vocabulary build + id encoding (the tokenize-to-ids step of
    * training-data prep): top-64 terms by corpus frequency get dense
    * rank ids (term tiebreak), every doc is encoded as its in-vocab
    * token ids in ORIGINAL order (OOV dropped, coverage counted). The
    * top-V selection is a distributed TakeOrderedAndProject over the
    * term-count table; only the 64 survivors touch the ranking
    * window. Ids stringified for the gate (q41 array convention). */
  val t23 = q("t23_vocab_encode",
    """WITH b AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |cnt AS (SELECT term, COUNT(*) AS c FROM
      |  (SELECT unnest(t) AS term FROM b) GROUP BY term),
      |vocab AS (SELECT term,
      |  CAST(ROW_NUMBER() OVER (ORDER BY c DESC, term) AS BIGINT) AS id
      | FROM cnt QUALIFY id <= 64),
      |pos AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS p, t FROM b),
      |tok AS (SELECT doc_id, p, t[p] AS term FROM pos),
      |enc AS (SELECT tok.doc_id,
      |  array_to_string(array_agg(v.id ORDER BY tok.p), ',') AS ids,
      |  COUNT(*) AS n_in_vocab
      | FROM tok JOIN vocab v USING (term) GROUP BY tok.doc_id),
      |n AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok FROM b)
      |SELECT n.doc_id, n.n_tok,
      | CAST(COALESCE(e.n_in_vocab, 0) AS BIGINT) AS n_in_vocab,
      | COALESCE(e.ids, '') AS ids
      |FROM n LEFT JOIN enc e USING (doc_id)""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    TextAnalysis.encodeDocs(docs, "doc_id", "text",
        TextAnalysis.buildVocab(docs, "text", size = 64))
      .select(col("doc_id"), col("n_tok"), col("n_in_vocab"),
        concat_ws(",", col("ids")).as("ids"))
  }

  /** BM25 ranked keyword retrieval — the lexical complement of the
    * s-series vector search. Only docs containing a query term are
    * scored (term filter BEFORE the shuffle: the posting rows of
    * |query| terms, never the corpus term table); idf/tf use the
    * standard k1=1.2, b=0.75 form with per-term parts rounded at 6dp
    * and DECIMAL-summed (the t16 float discipline). Top-10 by score
    * via distributed TakeOrderedAndProject. */
  val t24 = q("t24_bm25_search",
    """WITH b AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |stats AS (SELECT COUNT(*) AS n, CAST(SUM(len(t)) AS BIGINT) AS sum_dl FROM b),
      |tok AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM b),
      |tf AS (SELECT doc_id, term, CAST(dl AS BIGINT) AS dl, COUNT(*) AS tf
      | FROM tok WHERE term IN ('join', 'hash', 'scan')
      | GROUP BY doc_id, term, dl),
      |sc AS (SELECT doc_id, term, tf, dl,
      |  COUNT(*) OVER (PARTITION BY term) AS df FROM tf),
      |parts AS (SELECT doc_id,
      |  round(ln(1.0 + (stats.n - df + 0.5) / (df + 0.5))
      |    * (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * stats.n / stats.sum_dl)), 6)
      |   AS part
      | FROM sc CROSS JOIN stats),
      |scored AS (SELECT doc_id,
      |  CAST(SUM(CAST(part AS DECIMAL(30,10))) AS DOUBLE) AS score,
      |  COUNT(*) AS n_matched
      | FROM parts GROUP BY doc_id)
      |SELECT doc_id, score, n_matched FROM scored
      |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin) { (s, dir) =>
    TextAnalysis.bm25(Tables.documents(s, dir), "doc_id", "text",
        query = Seq("join", "hash", "scan"))
      .orderBy(col("score").desc, col("doc_id")).limit(10)
  }

  /** Corpus drift monitor (t25): which terms does src0 over-represent
    * vs src1? Per-term KL contribution with add-one smoothing over the
    * union vocabulary, top-15 by contribution. The expectations check
    * a pipeline runs when a new crawl lands next to an old one. */
  val t25 = q("t25_corpus_drift",
    """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term
      |  FROM documents WHERE source IN ('src0', 'src1')),
      |c AS (SELECT term,
      |  CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |  CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      | FROM t GROUP BY term),
      |s AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
      |  CAST(SUM(cb) AS BIGINT) AS nb, COUNT(*) AS v FROM c),
      |kk AS (SELECT term, ca, cb, round(p * ln(p / q), 6) AS kl_term FROM (
      |  SELECT c.term, c.ca, c.cb,
      |   (c.ca + 1) / CAST(s.na + s.v AS DOUBLE) AS p,
      |   (c.cb + 1) / CAST(s.nb + s.v AS DOUBLE) AS q
      |  FROM c CROSS JOIN s))
      |SELECT term, ca, cb, kl_term FROM kk
      |ORDER BY kl_term DESC, term LIMIT 15""".stripMargin) { (s, dir) =>
    TextAnalysis.tokenDrift(Tables.documents(s, dir),
      "text", "source", "src0", "src1", k = 15)
  }

  /** Deterministic stratified sample (t27): seedless md5-bucket
    * sampling with per-source rates (src0 20%, src1 5%, others 10%) —
    * the reproducible eval-subset draw of a data pipeline. Membership
    * is a pure function of (doc_id, rate): stable under repartition,
    * monotone under rate increases, identical on any engine with md5
    * — which is exactly why the oracle can enumerate the same rows.
    * Output = the sampled rows themselves (id, source, token count),
    * hash-exact. */
  val t27 = q("t27_stratified_sample",
    """SELECT doc_id, source,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |FROM documents
      |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |   AS BIGINT) % 10000
      | < CASE WHEN source = 'src0' THEN 2000
      |    WHEN source = 'src1' THEN 500 ELSE 1000 END""".stripMargin) { (s, dir) =>
    TextAnalysis.stratifiedSample(Tables.documents(s, dir),
        "doc_id", "source", Map("src0" -> 2000, "src1" -> 500),
        defaultBp = 1000)
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextOps.tokens(col("text"))).cast("long").as("n_tok"))
  }

  /** Sequence packing (t26): concat-then-chunk — docs ordered by id
    * form one token stream cut into 1024-token training windows; per
    * doc: stream offset and the chunk span it occupies. The offset is
    * the t22 distributed prefix sum (range partitions + broadcast
    * offsets — never a single global sort task); integer arithmetic
    * end to end, so the oracle's window spelling matches exactly. */
  val t26 = q("t26_sequence_packing",
    """WITH n AS (SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
      |c AS (SELECT doc_id, n_tok,
      |  CAST(SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |    AS BIGINT) - n_tok AS start_tok
      | FROM n)
      |SELECT doc_id, n_tok, start_tok,
      | start_tok // 1024 AS first_chunk,
      | (start_tok + n_tok - 1) // 1024 AS last_chunk,
      | (start_tok + n_tok - 1) // 1024 - start_tok // 1024 + 1 AS n_chunks
      |FROM c""".stripMargin) { (s, dir) =>
    TextAnalysis.packSequences(Tables.documents(s, dir),
      "doc_id", "text", contextLen = 1024L)
  }

  /** Temperature-smoothed source-mixture weights: w ∝ n_tokens^0.5 —
    * the alpha-smoothed sampling rule (mT5/XLM-R) that derives the mix
    * [[graft.operators.TextAnalysis.weightedMix]] (t14) then
    * materializes. One corpus scan + a tiny per-source agg; the 1-row
    * normalization total broadcasts (no unpartitioned window). Float
    * discipline: round(pow,6) parts, DECIMAL(30,10) normalization sum
    * (the t24 rule), rounded share — every dumped double is
    * engine-exact. */
  val t28 = q("t28_temperature_mix",
    """WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      | FROM documents GROUP BY source),
      |w AS (SELECT source, n_docs, n_tokens,
      |  round(pow(CAST(n_tokens AS DOUBLE), 0.5), 6) AS w FROM s),
      |t AS (SELECT CAST(SUM(CAST(w AS DECIMAL(30,10))) AS DOUBLE) AS tot FROM w)
      |SELECT source, n_docs, n_tokens, w,
      | round(w / tot, 6) AS share,
      | CAST(round(round(w / tot, 6) * CAST(1000000 AS DOUBLE), 0) AS BIGINT)
      |  AS expected_tokens
      |FROM w, t""".stripMargin) { (s, dir) =>
    TextAnalysis.temperatureMix(Tables.documents(s, dir), "text", "source",
      alpha = 0.5, budget = 1000000L)
  }

  /** DSIR importance resampling ([[graft.operators.TextAnalysis
    * .dsirResample]]): hashed-n-gram importance weights of every doc
    * (target LM = the English subset, raw LM = the whole pool, 1024
    * buckets, add-one smoothing), then a 100-doc Gumbel-top-k draw
    * over the log-importance — the data-selection step between the
    * quality gates (t02/t21) and the mixers (t14/t28). Per-bucket
    * log-ratios round 6dp before the per-doc DECIMAL sum; the Gumbel
    * key uses the t18 portable md5 uniform — every dumped double is
    * engine-exact by the same discipline as t16/t18. */
  val t29 = q("t29_dsir_resample",
    """WITH toks AS (SELECT doc_id, lang = 'en' AS is_target,
      |  string_split(text, ' ') AS t FROM documents),
      |feats AS (SELECT doc_id, is_target,
      |  CAST(concat('0x', substr(md5(f), 1, 13)) AS BIGINT) % 1024 AS b
      | FROM (SELECT doc_id, is_target,
      |   unnest(t || CASE WHEN len(t) >= 2
      |     THEN list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
      |     ELSE CAST([] AS VARCHAR[]) END) AS f
      |  FROM toks)),
      |bc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr,
      |  CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct
      | FROM feats GROUP BY b),
      |tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr,
      |  CAST(SUM(ct) AS BIGINT) AS nt FROM bc),
      |lr AS (SELECT b, round(ln(((ct + 1.0) * (nr + 1024)) /
      |   ((cr + 1.0) * (nt + 1024))), 6) AS lr
      | FROM bc CROSS JOIN tot),
      |docw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
      |  CAST(SUM(CAST(lr AS DECIMAL(30,10))) AS DOUBLE) AS log_importance
      | FROM feats JOIN lr USING (b) GROUP BY doc_id),
      |keyed AS (SELECT doc_id, n_feats, log_importance,
      |  round(log_importance - ln(-ln(
      |    (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
      |     + 1.0) / 4503599627370496.0)), 6) AS sel_key
      | FROM docw)
      |SELECT doc_id, n_feats, log_importance, sel_key,
      | CAST(ROW_NUMBER() OVER (ORDER BY sel_key DESC, doc_id) AS BIGINT) AS rn
      |FROM keyed QUALIFY rn <= 100""".stripMargin) { (s, dir) =>
    TextAnalysis.dsirResample(Tables.documentsFanned(s, dir), "doc_id", "text",
      targetCol = col("lang") === "en", buckets = 1024, k = 100)
  }

  /** Data-selection pipeline composed end to end (p08): DSIR
    * importance resampling (t29's exact machinery — hashed-n-gram
    * importance, Gumbel-top-100 draw) feeds sequence packing (t09's:
    * 512-token packs within 4 shards) and per-pack occupancy — the
    * select→pack step of a training-data build as ONE declarative
    * plan. The selection is 100 ids (broadcast join back onto the
    * docs), so the packing stage's window runs over the selected
    * slice only; Catalyst sees a single plan. */
  val p08 = q("p08_dsir_pack",
    """WITH toks AS (SELECT doc_id, lang = 'en' AS is_target,
      |  string_split(text, ' ') AS t FROM documents),
      |feats AS (SELECT doc_id, is_target,
      |  CAST(concat('0x', substr(md5(f), 1, 13)) AS BIGINT) % 1024 AS b
      | FROM (SELECT doc_id, is_target,
      |   unnest(t || CASE WHEN len(t) >= 2
      |     THEN list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
      |     ELSE CAST([] AS VARCHAR[]) END) AS f
      |  FROM toks)),
      |bc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr,
      |  CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct
      | FROM feats GROUP BY b),
      |tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr,
      |  CAST(SUM(ct) AS BIGINT) AS nt FROM bc),
      |lr AS (SELECT b, round(ln(((ct + 1.0) * (nr + 1024)) /
      |   ((cr + 1.0) * (nt + 1024))), 6) AS lr
      | FROM bc CROSS JOIN tot),
      |docw AS (SELECT doc_id,
      |  CAST(SUM(CAST(lr AS DECIMAL(30,10))) AS DOUBLE) AS log_importance
      | FROM feats JOIN lr USING (b) GROUP BY doc_id),
      |sel AS (SELECT doc_id FROM (
      | SELECT doc_id, ROW_NUMBER() OVER (ORDER BY
      |   round(log_importance - ln(-ln(
      |    (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
      |     + 1.0) / 4503599627370496.0)), 6) DESC, doc_id) AS rn
      | FROM docw) WHERE rn <= 100),
      |kept AS (SELECT d.doc_id, d.text FROM documents d JOIN sel USING (doc_id))
      |SELECT shard, pack_id, COUNT(*) AS n_docs,
      | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM (
      | SELECT doc_id, doc_id % 4 AS shard,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST((SUM(len(string_split(text, ' ')))
      |    OVER (PARTITION BY doc_id % 4 ORDER BY doc_id)
      |   - len(string_split(text, ' '))) // 512 AS BIGINT) AS pack_id
      | FROM kept)
      |GROUP BY shard, pack_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documentsFanned(s, dir)
    val sel = TextAnalysis.dsirResample(docs, "doc_id", "text",
        targetCol = col("lang") === "en", buckets = 1024, k = 100)
      .select("doc_id")
    TextAnalysis.packSequences(docs.join(broadcast(sel), "doc_id"),
        "doc_id", "text", capacity = 512, shards = 4)
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
  }

  /** Dedup threshold sweep — the diagnostic a pipeline owner reads
    * before PICKING the near-dup threshold: how many verified pairs
    * survive at each candidate cutoff, from ONE pass over the
    * LSH-routed ≥0.5 pair set (the d05 plan; tighter thresholds are
    * subsets, so no re-banding per cutoff). Single row of counts; the
    * exact-jaccard values are engine-identical (d05's gate), so the
    * conditional counts are too. */
  val d18 = q("d18_threshold_sweep",
    """WITH d AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
      |p AS (SELECT doc_a, doc_b, j FROM (
      | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(COUNT(*) AS DOUBLE) / (min(a.n) + min(b.n) - COUNT(*)) AS j
      | FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      | GROUP BY a.doc_id, b.doc_id) WHERE j >= 0.5)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_050,
      | CAST(COUNT(CASE WHEN j >= 0.6 THEN 1 END) AS BIGINT) AS n_060,
      | CAST(COUNT(CASE WHEN j >= 0.7 THEN 1 END) AS BIGINT) AS n_070,
      | CAST(COUNT(CASE WHEN j >= 0.8 THEN 1 END) AS BIGINT) AS n_080,
      | CAST(COUNT(CASE WHEN j >= 0.9 THEN 1 END) AS BIGINT) AS n_090
      |FROM p""".stripMargin) { (s, dir) =>
    val pairs = Dedup.jaccardPairs(Tables.documentsFanned(s, dir),
      "doc_id", "text", threshold = 0.5).select("jaccard")
    pairs.agg(count(lit(1)).as("n_050"),
      count(when(col("jaccard") >= 0.6, 1)).as("n_060"),
      count(when(col("jaccard") >= 0.7, 1)).as("n_070"),
      count(when(col("jaccard") >= 0.8, 1)).as("n_080"),
      count(when(col("jaccard") >= 0.9, 1)).as("n_090"))
  }

  /** One unrolled BPE round for t30's oracle — the unrolled-Lloyd
    * discipline (fixed round count = fixed CTE blocks; every carrier
    * CTE MATERIALIZED or DuckDB's inlining re-evaluates the whole
    * chain per reference, the s17 lesson). Per round: all-adjacent
    * pair counts weighted by word frequency, deterministic argmax
    * (freq desc, pair asc), then the greedy non-overlapping merge as
    * gaps-and-islands — hit positions grouped into runs, even offsets
    * within a run selected, position i emits the merged token when
    * selected, nothing when i-1 was selected, its own symbol
    * otherwise. */
  private def bpeRoundCtes(r: Int, tag: String = ""): String = {
    val p = s"${tag}seg_${r - 1}"
    s"""${tag}p_$r AS MATERIALIZED (
       | SELECT syms[i] AS x, syms[i+1] AS y, CAST(SUM(cnt) AS BIGINT) AS freq
       | FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS i FROM $p)
       | GROUP BY x, y),
       |${tag}w_$r AS MATERIALIZED (
       | SELECT x, y, freq FROM ${tag}p_$r ORDER BY freq DESC, x, y LIMIT 1),
       |${tag}h_$r AS MATERIALIZED (
       | SELECT t.word, t.cnt, t.syms, t.i,
       |  (t.i < len(t.syms) AND t.syms[t.i] = w.x AND t.syms[t.i+1] = w.y) AS hit
       | FROM (SELECT word, cnt, syms, unnest(range(1, len(syms) + 1)) AS i
       |       FROM $p) t
       | CROSS JOIN ${tag}w_$r w),
       |${tag}sel_$r AS MATERIALIZED (
       | SELECT word, i,
       |  (i - MIN(i) OVER (PARTITION BY word, isl)) % 2 = 0 AS selected
       | FROM (SELECT word, i,
       |        i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS isl
       |       FROM ${tag}h_$r WHERE hit)),
       |${tag}seg_$r AS MATERIALIZED (
       | SELECT h.word, h.cnt,
       |  list(CASE WHEN COALESCE(s.selected, FALSE)
       |         THEN h.syms[h.i] || h.syms[h.i+1]
       |        ELSE h.syms[h.i] END ORDER BY h.i)
       |   FILTER (WHERE NOT COALESCE(sp.selected, FALSE)) AS syms
       | FROM ${tag}h_$r h
       | LEFT JOIN ${tag}sel_$r s  ON s.word = h.word AND s.i = h.i AND s.selected
       | LEFT JOIN ${tag}sel_$r sp ON sp.word = h.word AND sp.i = h.i - 1 AND sp.selected
       | GROUP BY h.word, h.cnt)""".stripMargin
  }

  /** Byte-level seed segmentation for the t41/t42 oracle chain: regex
    * pre-tokens ([[TextAnalysis.BytePreTokenPattern]]), UTF-8 bytes as
    * lowercase hex-pair symbols. */
  private def byteBpeSeedCte: String =
    s"""bseg_0 AS MATERIALIZED (
       | SELECT word, cnt,
       |  list_transform(range(CAST(len(h) // 2 AS INT)),
       |   i -> substr(h, CAST(2 * i + 1 AS INT), 2)) AS syms
       | FROM (SELECT term AS word, CAST(COUNT(*) AS BIGINT) AS cnt,
       |        lower(hex(encode(term))) AS h
       |       FROM (SELECT unnest(regexp_extract_all(text,
       |              '${TextAnalysis.BytePreTokenPattern}')) AS term
       |             FROM documents)
       |       GROUP BY term))""".stripMargin

  private val BpeRounds = 6

  /** BPE merge learning — the tokenizer-TRAINING operator between
    * t23's word-level vocab and t03's BPE-ish application: 6 merge
    * rules learned over the corpus word-frequency table (Sennrich
    * §3.2, no end-of-word marker). Pair counts, argmax tiebreaks, and
    * the greedy left-to-right merge are integer/string-exact, so the
    * oracle (6 unrolled rounds, materialized carriers) reproduces the
    * rule list bit-for-bit. The corpus is scanned once; each round
    * runs over the distinct-word table only. */
  val t30 = q("t30_bpe_merges",
    s"""WITH b AS (SELECT string_split(text, ' ') AS t FROM documents),
       |seg_0 AS MATERIALIZED (
       | SELECT term AS word, COUNT(*) AS cnt, string_split(term, '') AS syms
       | FROM (SELECT unnest(t) AS term FROM b) GROUP BY term),
       |${(1 to BpeRounds).map(r => bpeRoundCtes(r)).mkString(",\n")}
       |${(1 to BpeRounds).map(r =>
          s"SELECT CAST($r AS BIGINT) AS round, x, y, x || y AS merged, freq FROM w_$r")
          .mkString("\nUNION ALL ")}""".stripMargin) { (s, dir) =>
    TextAnalysis.bpeMerges(Tables.documents(s, dir), "text",
      rounds = BpeRounds)
  }

  /** Tokenize WITH the trained tokenizer (t31) — learn the 6 BPE rules
    * (t30's machinery) and apply them: per doc, word/char counts and
    * the token count under the merged segmentation. The oracle reuses
    * t30's unrolled chain — `seg_6` IS the trained segmentation — and
    * joins doc words against it, so learn≡learn and apply≡apply are
    * both pinned in one gate. */
  val t31 = q("t31_bpe_apply",
    s"""WITH b2 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |b AS (SELECT t FROM b2),
       |seg_0 AS MATERIALIZED (
       | SELECT term AS word, COUNT(*) AS cnt, string_split(term, '') AS syms
       | FROM (SELECT unnest(t) AS term FROM b) GROUP BY term),
       |${(1 to BpeRounds).map(r => bpeRoundCtes(r)).mkString(",\n")},
       |docw AS (SELECT doc_id, unnest(t) AS word FROM b2)
       |SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       | CAST(SUM(len(d.word)) AS BIGINT) AS n_chars,
       | CAST(SUM(len(s.syms)) AS BIGINT) AS n_bpe_tokens
       |FROM docw d JOIN seg_${BpeRounds} s ON s.word = d.word
       |GROUP BY d.doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val rules = TextAnalysis.bpeMerges(docs, "text", rounds = BpeRounds)
      .orderBy("round").select("x", "y").as[(String, String)].collect().toSeq
    TextAnalysis.bpeApply(docs, "doc_id", "text", rules)
  }

  /** BYTE-level BPE merge learning (t41) — the GPT-2/tiktoken family:
    * regex pre-tokenization, UTF-8 bytes as hex-pair symbols, then the
    * SAME greedy merge loop as t30 (shared engine in
    * [[TextAnalysis.bpeMergeLoop]]). Every input is representable as
    * single-byte symbols, so the byte family is trivially TOTAL — the
    * systematic answer to out-of-alphabet content that t40's unigram
    * unk piece patches per-family. The oracle unrolls the same rounds
    * over the same hex-pair seed. */
  val t41 = q("t41_bytebpe_merges",
    s"""WITH $byteBpeSeedCte,
       |${(1 to BpeRounds).map(r => bpeRoundCtes(r, "b")).mkString(",\n")}
       |${(1 to BpeRounds).map(r =>
          s"SELECT CAST($r AS BIGINT) AS round, x, y, x || y AS merged, freq FROM bw_$r")
          .mkString("\nUNION ALL ")}""".stripMargin) { (s, dir) =>
    TextAnalysis.byteBpeMerges(Tables.documents(s, dir), "text",
      rounds = BpeRounds)
  }

  /** Tokenize WITH the trained byte-level tokenizer (t42): learn the
    * 6 byte merges (t41's machinery) and apply them — per doc,
    * pre-token count, UTF-8 byte count, and the token count under the
    * merged byte segmentation. The oracle rides t41's unrolled chain
    * (bseg_6 IS the trained segmentation), the t30/t31 discipline. */
  val t42 = q("t42_bytebpe_apply",
    s"""WITH $byteBpeSeedCte,
       |${(1 to BpeRounds).map(r => bpeRoundCtes(r, "b")).mkString(",\n")},
       |docpre AS (SELECT doc_id, unnest(regexp_extract_all(text,
       |  '${TextAnalysis.BytePreTokenPattern}')) AS word FROM documents)
       |SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pretok,
       | CAST(SUM(strlen(d.word)) AS BIGINT) AS n_bytes,
       | CAST(SUM(len(s.syms)) AS BIGINT) AS n_byte_tokens
       |FROM docpre d JOIN bseg_$BpeRounds s ON s.word = d.word
       |GROUP BY d.doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val rules = TextAnalysis.byteBpeMerges(docs, "text", rounds = BpeRounds)
      .orderBy("round").select("x", "y").as[(String, String)].collect().toSeq
    TextAnalysis.byteBpeApply(docs, "doc_id", "text", rules)
  }

  /** CCNet perplexity tiers (t32): per language, docs sorted by bigram
    * LM quality split head/middle/tail at equal CHARACTER-mass
    * boundaries (Wenzek et al. §4.3 — size-based cuts, so long docs
    * can't flood a tier). Integer boundary math + one correctly-
    * rounded division make the assignment engine-exact; the oracle
    * reuses t16's LM CTEs. */
  val t32 = q("t32_ccnet_tiers",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
      |  THEN list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
      |  ELSE [array_to_string(t, ' ')] END) AS bigram FROM toks),
      |cu AS (SELECT w, COUNT(*) AS cu FROM
      |  (SELECT unnest(t) AS w FROM toks) GROUP BY w),
      |vocab AS (SELECT COUNT(*) AS v FROM cu),
      |cb AS (SELECT bigram, COUNT(*) AS cb FROM bg GROUP BY bigram),
      |scored AS (SELECT bg.doc_id,
      |  round(ln((cb.cb + 1.0) / (cu.cu + vocab.v)), 6) AS lp
      | FROM bg JOIN cb USING (bigram)
      | JOIN cu ON cu.w = string_split(bg.bigram, ' ')[1]
      | CROSS JOIN vocab),
      |lm AS (SELECT doc_id, COUNT(*) AS nb,
      |  CAST(SUM(CAST(lp AS DECIMAL(30,10))) AS DOUBLE) AS slp
      | FROM scored GROUP BY doc_id),
      |r AS (SELECT d.doc_id, d.lang,
      |  CAST(length(d.text) AS BIGINT) AS n_chars, lm.slp / lm.nb AS alp
      | FROM documents d JOIN lm ON lm.doc_id = d.doc_id),
      |c AS (SELECT doc_id, lang, n_chars,
      |  SUM(n_chars) OVER (PARTITION BY lang ORDER BY alp DESC, doc_id
      |    ROWS UNBOUNDED PRECEDING) AS cum,
      |  SUM(n_chars) OVER (PARTITION BY lang) AS tot FROM r)
      |SELECT doc_id, lang, n_chars,
      | CASE WHEN cum * 3 <= tot THEN 'head'
      |      WHEN cum * 3 <= tot * 2 THEN 'middle'
      |      ELSE 'tail' END AS tier
      |FROM c""".stripMargin) { (s, dir) =>
    TextAnalysis.ccnetTiers(Tables.documents(s, dir), "doc_id", "text", "lang")
  }

  /** Containment near-dup pairs (d19): overlap coefficient ≥ 4/5 over
    * distinct trigram-shingle sets — the quote-inclusion signal
    * symmetric Jaccard misses. Candidates via the ≤16-doc rare-shingle
    * cap (d12's), verify exact, threshold an integer cross-multiply
    * (t21 discipline) — no float anywhere, hash-exact by
    * construction. */
  val d19 = q("d19_containment_pairs",
    """WITH d AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 3
      |   THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |   ELSE [array_to_string(t, ' ')] END) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
      |rare AS (SELECT s FROM (SELECT s, COUNT(*) AS ndocs FROM e GROUP BY s)
      | WHERE ndocs <= 16),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      | FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      | WHERE a.s IN (SELECT s FROM rare)),
      |shared AS (SELECT c.doc_a, c.doc_b,
      |  CAST(ea.n AS BIGINT) AS n_a, CAST(eb.n AS BIGINT) AS n_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_shared
      | FROM cand c
      | JOIN e ea ON ea.doc_id = c.doc_a
      | JOIN e eb ON eb.doc_id = c.doc_b AND eb.s = ea.s
      | GROUP BY c.doc_a, c.doc_b, ea.n, eb.n)
      |SELECT doc_a, doc_b, n_a, n_b, n_shared FROM shared
      |WHERE n_shared * 5 >= least(n_a, n_b) * 4""".stripMargin) { (s, dir) =>
    Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text")
  }

  /** Per-source n-gram diversity (t33): distinct/total uni-, bi-,
    * trigram counts per source — the repetitiveness diagnostic read
    * next to d17's duplication rates. Integer counts only (ratios
    * derived downstream); distincts shuffle 64-bit long keys. The
    * shingle convention matches TextOps: a doc shorter than n yields
    * its whole text as one shingle. */
  val t33 = q("t33_ngram_diversity",
    """WITH b AS (SELECT source, string_split(text, ' ') AS t FROM documents),
      |g1 AS (SELECT source, unnest(t) AS g FROM b),
      |g2 AS (SELECT source, unnest(CASE WHEN len(t) >= 2
      |  THEN list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
      |  ELSE [array_to_string(t, ' ')] END) AS g FROM b),
      |g3 AS (SELECT source, unnest(CASE WHEN len(t) >= 3
      |  THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |  ELSE [array_to_string(t, ' ')] END) AS g FROM b),
      |a1 AS (SELECT source, COUNT(*) AS t1, COUNT(DISTINCT g) AS d1
      | FROM g1 GROUP BY source),
      |a2 AS (SELECT source, COUNT(*) AS t2, COUNT(DISTINCT g) AS d2
      | FROM g2 GROUP BY source),
      |a3 AS (SELECT source, COUNT(*) AS t3, COUNT(DISTINCT g) AS d3
      | FROM g3 GROUP BY source),
      |nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
      |SELECT nd.source, nd.n_docs,
      | t1 AS n_tokens, d1 AS distinct_unigrams,
      | t2 AS total_bigrams, d2 AS distinct_bigrams,
      | t3 AS total_trigrams, d3 AS distinct_trigrams
      |FROM nd JOIN a1 USING (source) JOIN a2 USING (source)
      | JOIN a3 USING (source)""".stripMargin) { (s, dir) =>
    TextAnalysis.ngramDiversity(Tables.documents(s, dir), "source", "text")
  }

  /** Gopher's duplicate-n-gram repetition signals (the n-gram half t21
    * leaves out): per (doc, n ∈ {2,3}) total shingle occurrences, the
    * char mass tied up in REPEATED shingles, and the char mass of the
    * single most frequent shingle (ties broken by shingle text desc —
    * deterministic both engines). Integer char-mass numerators; the
    * Gopher gates cross-multiply against n_chars downstream (t21
    * no-float discipline). */
  val t34 = q("t34_dup_ngram_mass",
    """WITH b AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      | SELECT doc_id, 2 AS n, unnest(CASE WHEN len(t) >= 2
      |  THEN list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
      |  ELSE [array_to_string(t, ' ')] END) AS sh FROM b
      | UNION ALL
      | SELECT doc_id, 3 AS n, unnest(CASE WHEN len(t) >= 3
      |  THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
      |  ELSE [array_to_string(t, ' ')] END) AS sh FROM b),
      |c AS (SELECT doc_id, n, sh, COUNT(*) AS c FROM sh GROUP BY doc_id, n, sh),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, n
      |  ORDER BY c DESC, sh DESC) AS rn FROM c)
      |SELECT doc_id, CAST(n AS BIGINT) AS n,
      | CAST(SUM(c) AS BIGINT) AS n_grams,
      | CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN c * len(sh) END), 0) AS BIGINT) AS dup_mass,
      | CAST(MAX(CASE WHEN rn = 1 THEN c * len(sh) END) AS BIGINT) AS top_mass
      |FROM r GROUP BY doc_id, n""".stripMargin) { (s, dir) =>
    TextAnalysis.dupNgramProfile(Tables.documentsFanned(s, dir), "doc_id", "text")
      .withColumn("n", col("n").cast("long"))
      .select("doc_id", "n", "n_grams", "dup_mass", "top_mass")
  }

  /** Token-rarity profile: corpus document frequency of each doc's
    * distinct tokens folded per doc — low mean df flags jargon/noise,
    * min_df = 1 flags corpus-unique tokens. Integer df (no idf log, no
    * float drift); the standard tf-idf topology with a per-doc fold. */
  val t35 = q("t35_token_rarity",
    """WITH dt AS (SELECT DISTINCT doc_id, tok FROM
      |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
      |df AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct,
      | CAST(SUM(df) AS BIGINT) AS sum_df, CAST(MIN(df) AS BIGINT) AS min_df
      |FROM dt JOIN df USING (tok) GROUP BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.tokenRarity(Tables.documents(s, dir), "doc_id", "text")
  }

  /** Metadata-filtered vector search (filter = equi-join key, never a
    * post-filter of an unfiltered top-k — which under-fills k whenever
    * the filter is selective): top-5 same-label neighbors per query. */
  val s18 = q("s18_filtered_ann",
    """SELECT query_id, label, neighbor_id, cos, rn FROM (
      | SELECT q.vec_id AS query_id, q.label AS label, c.vec_id AS neighbor_id,
      |  round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |    CAST(c.embedding AS DOUBLE[])), 6) AS cos,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |   ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |     CAST(c.embedding AS DOUBLE[])), 6) DESC, c.vec_id) AS BIGINT) AS rn
      | FROM embeddings q JOIN embeddings c
      |  ON q.label = c.label AND q.vec_id < 10 AND c.vec_id >= 10)
      |WHERE rn <= 5""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir).select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"), col("label"))
    Similarity.filteredTopK(
      emb.filter(col("id") < 10), emb.filter(col("id") >= 10), 5, "label")
  }

  /** s18's 100 TB path: the filter rides the POSTING LIST (the index
    * is built with the label in its assignments), so the probe joins
    * on (cid, label) and filters inside the posting scan — no second
    * corpus-wide metadata join, no post-filtered shortlist. Same IVF
    * routing as s04; the oracle replays the clustering and applies
    * the label gate to the probed cells. */
  val s19 = q("s19_filtered_ivf",
    s"""$ivfOracleCtes,
      |lbl AS (SELECT vec_id, label FROM embeddings),
      |probe AS (SELECT vec_id AS query_id, cid FROM (
      | SELECT qs.vec_id, c.cid,
      |  ROW_NUMBER() OVER (PARTITION BY qs.vec_id
      |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(qs.v, c.v), c.cid) AS r
      | FROM qs, c2 c) WHERE r <= 4),
      |scored AS (SELECT p.query_id, ql.label AS label, af.vec_id AS neighbor_id,
      |  round(list_cosine_similarity(qe.v, af.v), 6) AS cos
      | FROM probe p JOIN af ON af.cid = p.cid
      | JOIN e qe ON qe.vec_id = p.query_id
      | JOIN lbl ql ON ql.vec_id = p.query_id
      | JOIN lbl cl ON cl.vec_id = af.vec_id AND cl.label = ql.label)
      |SELECT query_id, label, neighbor_id, cos,
      | CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |   ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
      |FROM scored QUALIFY rn <= 5""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir).select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"), col("label"))
    val model = Similarity.ensureIvfIndex(s, ivfLblIndexName(dir),
      emb.filter(col("id") >= 10), nCentroids = 16, iters = 2,
      portableInit = true, fingerprint = Some(embFp(dir)),
      extraCols = Seq("label"))
    Similarity.ivfFilteredTopK(emb.filter(col("id") < 10), model,
      k = 5, nProbe = 4, filterCol = "label")
  }

  /** IVF posting-occupancy report over the persisted s04 index — the
    * operational imbalance metric probe cost and recall drift hide
    * behind (one hot cell taxes every query routed to it; growing
    * imbalance precedes a recall dip). Integer counts + deterministic
    * size rank; the oracle replays the portable clustering. */
  val s20 = q("s20_ivf_cell_stats",
    s"""$ivfOracleCtes,
      |counts AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vecs
      | FROM af GROUP BY cid),
      |grid AS (SELECT CAST(b.range AS BIGINT) AS cid FROM range(16) b),
      |fullc AS (SELECT g.cid, COALESCE(c.n_vecs, 0) AS n_vecs
      | FROM grid g LEFT JOIN counts c USING (cid))
      |SELECT cid, n_vecs,
      | CAST(ROW_NUMBER() OVER (ORDER BY n_vecs DESC, cid) AS BIGINT) AS size_rank
      |FROM fullc""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val model = Similarity.ensureIvfIndex(s, ivfIndexName(dir),
      emb.filter(col("id") >= 10), nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)))
    Similarity.ivfCellStats(model)
  }

  /** Composed CCNet-style corpus build (p09): exact dedup (d02's
    * keep-min-per-fingerprint rule) → bigram-LM perplexity tiers over
    * the DEDUPED corpus (t32 — LM stats must not be skewed by exact
    * dups, the CCNet ordering) → drop the tail tier → per-(lang, tier)
    * mix rollup. One declarative plan; the deduped subtree re-derives
    * per LM pass exactly as the oracle does (a production run lands
    * the deduped corpus first — p01's pattern — and runs t32 on the
    * landing; this query is the one-plan composition gate). */
  val p09 = q("p09_ccnet_mix",
    s"""WITH kept AS (SELECT doc_id, lang, text FROM (
       | SELECT doc_id, lang, text,
       |  ROW_NUMBER() OVER (PARTITION BY md5($normSql) ORDER BY doc_id) AS rn
       | FROM documents) WHERE rn = 1),
       |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM kept),
       |bg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
       |  THEN list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
       |  ELSE [array_to_string(t, ' ')] END) AS bigram FROM toks),
       |cu AS (SELECT w, COUNT(*) AS cu FROM
       |  (SELECT unnest(t) AS w FROM toks) GROUP BY w),
       |vocab AS (SELECT COUNT(*) AS v FROM cu),
       |cb AS (SELECT bigram, COUNT(*) AS cb FROM bg GROUP BY bigram),
       |scored AS (SELECT bg.doc_id,
       |  round(ln((cb.cb + 1.0) / (cu.cu + vocab.v)), 6) AS lp
       | FROM bg JOIN cb USING (bigram)
       | JOIN cu ON cu.w = string_split(bg.bigram, ' ')[1]
       | CROSS JOIN vocab),
       |lm AS (SELECT doc_id, COUNT(*) AS nb,
       |  CAST(SUM(CAST(lp AS DECIMAL(30,10))) AS DOUBLE) AS slp
       | FROM scored GROUP BY doc_id),
       |r AS (SELECT k.doc_id, k.lang,
       |  CAST(length(k.text) AS BIGINT) AS n_chars, lm.slp / lm.nb AS alp
       | FROM kept k JOIN lm ON lm.doc_id = k.doc_id),
       |c AS (SELECT doc_id, lang, n_chars,
       |  SUM(n_chars) OVER (PARTITION BY lang ORDER BY alp DESC, doc_id
       |    ROWS UNBOUNDED PRECEDING) AS cum,
       |  SUM(n_chars) OVER (PARTITION BY lang) AS tot FROM r),
       |tiered AS (SELECT doc_id, lang, n_chars,
       |  CASE WHEN cum * 3 <= tot THEN 'head'
       |       WHEN cum * 3 <= tot * 2 THEN 'middle'
       |       ELSE 'tail' END AS tier FROM c)
       |SELECT lang, tier, CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(SUM(n_chars) AS BIGINT) AS n_chars, MIN(doc_id) AS min_doc
       |FROM tiered WHERE tier <> 'tail'
       |GROUP BY lang, tier""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val kept = Tables.documents(s, dir)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(md5(TextOps.normText(col("text"))))
          .orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
    TextAnalysis.ccnetTiers(kept, "doc_id", "text", "lang")
      .filter(col("tier") =!= "tail")
      .groupBy("lang", "tier")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
        min(col("doc_id")).as("min_doc"))
  }

  /** PQ codebook distortion report (s22): per (subspace, code), vector
    * count + exact-decimal sum of 6dp-rounded squared quantization
    * errors — codebook health next to s20's occupancy and s21's recall
    * curve (a dominant-distortion subspace needs more codes; a
    * zero-count code is dead capacity). The oracle replays the s10
    * per-slice clustering and scores d² with the same three dots the
    * assignment argmin uses. */
  val s22 = q("s22_pq_distortion", {
    // report over the DEPLOYED model (the s11/s12 corpus-slice
    // codebooks, persisted build-once): the query times the report,
    // never a retrain — the operational posture a health metric runs in
    val blocks = (0 until 4).map(s => pqSubCtes(s, k = 8, subDim = 16,
      src = "corp"))
    val ds = (0 until 4).map { s =>
      s"""d_$s AS (SELECT CAST($s AS BIGINT) AS subspace, a.code,
         |  round(list_dot_product(c.v, c.v)
         |   - 2.0 * list_dot_product(t.v, c.v)
         |   + list_dot_product(t.v, t.v), 6) AS d2
         | FROM sub$s t JOIN af_$s a ON a.vec_id = t.vec_id
         | JOIN c2_$s c ON c.cid = a.code)""".stripMargin
    }.mkString(",\n")
    val union = (0 until 4).map(s => s"SELECT * FROM d_$s").mkString(" UNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |corp AS (SELECT vec_id, v FROM e WHERE vec_id >= 10),
       |${blocks.mkString(",\n")},
       |$ds,
       |ad AS ($union),
       |aggd AS (SELECT subspace, code, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |  CAST(SUM(CAST(d2 AS DECIMAL(30,10))) AS DOUBLE) AS sum_distortion
       | FROM ad GROUP BY subspace, code),
       |grid AS (SELECT CAST(s.range AS BIGINT) AS subspace,
       |  CAST(c.range AS BIGINT) AS code FROM range(4) s, range(8) c)
       |SELECT g.subspace, g.code, COALESCE(a.n_vecs, 0) AS n_vecs,
       | COALESCE(a.sum_distortion, 0.0) AS sum_distortion
       |FROM grid g LEFT JOIN aggd a USING (subspace, code)""".stripMargin
  }) { (s, dir) =>
    val corp = Tables.embeddingsFanned(s, dir).filter(col("vec_id") >= 10)
    val (codes, books) = Similarity.ensurePqModel(s, pqModelName(dir),
      corp, m = 4, k = 8, iters = 2, dim = 64,
      fingerprint = Some(embFp(dir)))
    Similarity.pqDistortion(corp, codes, books)
  }

  /** SimHash hamming-distance pairs (d21, Manku et al.): 4 x 15-bit
    * band routing is LOSSLESS for hamming ≤ 3 (pigeonhole — at least
    * one band agrees exactly), verify is one xor+popcount; each pair
    * counted once at its first agreeing band. The oracle re-derives
    * the portable simhash and the same band/first-agree gate. */
  val d21 = q("d21_simhash_pairs",
    s"""WITH t AS (SELECT doc_id,
       |  CAST(concat('0x', substr(md5(u.w), 1, 15)) AS BIGINT) AS x
       | FROM documents, UNNEST(string_split(lower(text), ' ')) AS u(w)),
       |s AS (SELECT doc_id, COUNT(*) AS n,
       | $d04BitSums
       | FROM t GROUP BY doc_id),
       |sh2 AS (SELECT doc_id, CAST($d04BitAssemble AS BIGINT) AS h FROM s),
       |bands AS (SELECT doc_id, h, b.range AS b, (h >> (b.range*15)) & 32767 AS k
       | FROM sh2, range(4) b),
       |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  xor(a.h, b.h) AS x, a.b AS b
       | FROM bands a JOIN bands b
       |  ON a.b = b.b AND a.k = b.k AND a.doc_id < b.doc_id),
       |gated AS (SELECT doc_a, doc_b, x FROM cand
       | WHERE b = (CASE WHEN (x & 32767) = 0 THEN 0
       |   WHEN ((x >> 15) & 32767) = 0 THEN 1
       |   WHEN ((x >> 30) & 32767) = 0 THEN 2
       |   WHEN ((x >> 45) & 32767) = 0 THEN 3 ELSE 4 END))
       |SELECT doc_a, doc_b, CAST(bit_count(x) AS BIGINT) AS hamming
       |FROM gated WHERE bit_count(x) <= 3""".stripMargin) { (s, dir) =>
    Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text")
  }

  /** Held-out bigram-LM eval (t36): train the LM on one split, score
    * the other — unseen events actually occur, so OOV rates and the
    * smoothed floor are exercised (t16 trains and scores on the same
    * corpus and can never see an OOV). The cross-corpus quality gate:
    * score a candidate crawl against a trusted corpus's LM. */
  val t36 = q("t36_lm_heldout",
    """WITH tr AS (SELECT string_split(text, ' ') AS t FROM documents
      |  WHERE doc_id % 5 <> 0),
      |ev AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE doc_id % 5 = 0),
      |cu AS (SELECT w, COUNT(*) AS cu FROM
      |  (SELECT unnest(t) AS w FROM tr) GROUP BY w),
      |vocab AS (SELECT COUNT(*) AS v FROM cu),
      |cb AS (SELECT bigram, COUNT(*) AS cb FROM
      |  (SELECT unnest(CASE WHEN len(t) >= 2
      |   THEN list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
      |   ELSE [array_to_string(t, ' ')] END) AS bigram FROM tr) GROUP BY bigram),
      |ebg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
      |  THEN list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
      |  ELSE [array_to_string(t, ' ')] END) AS bigram FROM ev),
      |scored AS (SELECT e.doc_id,
      |  round(ln((COALESCE(cb.cb, 0) + 1.0) / (COALESCE(cu.cu, 0) + vocab.v)), 6) AS lp,
      |  CASE WHEN cb.cb IS NULL THEN 1 ELSE 0 END AS oovb,
      |  CASE WHEN cu.cu IS NULL THEN 1 ELSE 0 END AS oovw
      | FROM ebg e LEFT JOIN cb USING (bigram)
      | LEFT JOIN cu ON cu.w = string_split(e.bigram, ' ')[1]
      | CROSS JOIN vocab)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      | CAST(SUM(oovb) AS BIGINT) AS n_oov_bigrams,
      | CAST(SUM(oovw) AS BIGINT) AS n_oov_firstwords,
      | CAST(SUM(CAST(lp AS DECIMAL(30,10))) AS DOUBLE) AS sum_logprob
      |FROM scored GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    TextAnalysis.bigramLmHeldOut(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(5)) === 0),
      "doc_id", "text")
  }

  /** LSH estimator calibration (d20): the confusion curve behind the
    * numHashes/bands choice — per signature-agreement level, how many
    * banded candidates exist and how many clear the exact 0.5/0.7
    * Jaccard gates (cross-multiplied integers), plus exact
    * intersection/union mass. The oracle re-derives the portable
    * signatures, the band join, and the exploded-shingle exact counts. */
  val d20 = q("d20_lsh_calibration",
    s"""$minhashCandOracleCtes,
      |sh_e AS (SELECT doc_id, unnest(sh) AS s FROM d),
      |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(COUNT(*) AS BIGINT) AS s
      | FROM sh_e a JOIN sh_e b ON a.s = b.s AND a.doc_id < b.doc_id
      | GROUP BY 1, 2),
      |sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM d),
      |px AS (SELECT
      |  CAST(len(list_filter(range(32), i -> sa.sig[i+1] = sb.sig[i+1])) AS BIGINT) AS agree,
      |  COALESCE(sh.s, 0) AS shared,
      |  za.n + zb.n - COALESCE(sh.s, 0) AS uni
      | FROM cand c
      | JOIN sigs sa ON sa.doc_id = c.doc_a JOIN sigs sb ON sb.doc_id = c.doc_b
      | JOIN sz za ON za.doc_id = c.doc_a JOIN sz zb ON zb.doc_id = c.doc_b
      | LEFT JOIN shared sh ON sh.doc_a = c.doc_a AND sh.doc_b = c.doc_b)
      |SELECT agree, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      | CAST(COUNT(CASE WHEN 2*shared >= uni THEN 1 END) AS BIGINT) AS n_exact_ge_050,
      | CAST(COUNT(CASE WHEN 10*shared >= 7*uni THEN 1 END) AS BIGINT) AS n_exact_ge_070,
      | CAST(SUM(shared) AS BIGINT) AS sum_shared,
      | CAST(SUM(uni) AS BIGINT) AS sum_union
      |FROM px GROUP BY agree""".stripMargin) { (s, dir) =>
    Dedup.estimatorCalibration(Tables.documentsFanned(s, dir), "doc_id", "text")
  }

  /** IVF nProbe→recall TUNING CURVE (s21): recall@5 of the persisted
    * index at every probe width 1..4 against brute force, in one
    * query — the artifact an operator reads to pick nProbe (each +1
    * probe buys recall and costs a full extra posting list per query;
    * the curve says where it stops paying). Integer hit counts; the
    * recall division is one correctly-rounded op of engine-identical
    * integers. */
  val s21 = q("s21_nprobe_curve", {
    val annBlocks = (1 to 4).map { p =>
      s"""ann_$p AS (SELECT query_id, neighbor_id FROM (
         | SELECT pr.query_id, af.vec_id AS neighbor_id,
         |  round(list_cosine_similarity(qe.v, af.v), 6) AS cos
         | FROM pr JOIN af ON af.cid = pr.cid AND pr.r <= $p
         | JOIN e qe ON qe.vec_id = pr.query_id)
         | QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
         |   ORDER BY cos DESC, neighbor_id) <= 5)""".stripMargin
    }.mkString(",\n")
    val rows = (1 to 4).map { p =>
      s"""SELECT CAST($p AS BIGINT) AS nprobe,
         | CAST(COUNT(*) AS BIGINT) AS n_exact,
         | CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
         | round(CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*), 6) AS recall
         |FROM exact x LEFT JOIN ann_$p a
         | ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""$ivfOracleCtes,
       |pr AS (SELECT qs.vec_id AS query_id, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY qs.vec_id
       |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(qs.v, c.v), c.cid) AS r
       | FROM qs, c2 c),
       |exact AS (SELECT query_id, neighbor_id FROM (
       | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |  round(list_cosine_similarity(q.v, c.v), 6) AS cos
       | FROM qs q, corp c)
       | QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
       |   ORDER BY cos DESC, neighbor_id) <= 5),
       |$annBlocks
       |$rows""".stripMargin
  }) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val model = Similarity.ensureIvfIndex(s, ivfIndexName(dir),
      emb.filter(col("id") >= 10), nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)))
    val queries = emb.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(queries, emb.filter(col("id") >= 10), 5)
      .select("query_id", "neighbor_id").localCheckpoint(false)
    // r18: ONE routed+scored candidate pass at the deepest probe —
    // shallower depths are prefix filters (r <= p, monotone-superset
    // routing), and each depth's top-5 rank is a CONDITIONAL running
    // count in a single shared window pass: rank among {r <= p} under
    // (cos desc, neighbor_id) ≡ ivfTopK's row_number on the filtered
    // set. Previously each depth re-routed and re-scored its own
    // candidate subtree (4 probe plans per run).
    val wWin = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ranked = Similarity.ivfScoredCandidates(queries, model, maxProbe = 4)
      .select(Seq(col("query_id"), col("neighbor_id"), col("r")) ++
        (1 to 4).map(p =>
          sum(when(col("r") <= p, 1)).over(wWin).as(s"crk_$p")): _*)
      .localCheckpoint(false)
    (1 to 4).map { p =>
      val ann = ranked.filter(col("r") <= p && col(s"crk_$p") <= 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      exact.join(ann, Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
        .select(lit(p.toLong).as("nprobe"), col("n_exact"), col("n_hit"))
    }.reduce(_ unionByName _)
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_exact"), 6))
  }

  /** ADC tuning curve (s23): recall@5 over the nProbe × shortlist GRID
    * for the residual IVF-ADC path — the 100 TB layout's actual
    * retrieval (s17) has TWO knobs, probed cells and rerank shortlist,
    * and their recall/cost tradeoff is the operational decision this
    * report drives (s21 tunes plain IVF's single knob). Runs over the
    * PERSISTED artifacts (coarse index, residual codebooks, ADC
    * postings — never retrained inline, the s22 discipline); the
    * oracle re-derives the whole chain (unrolled Lloyd, residual
    * codebooks, ADC decomposition) and slices ONE scored candidate
    * table per grid cell, so every cell's approx ranking, shortlist
    * cut, and exact-cosine rerank are pinned against s17's spellings.
    * Grid cost shape: candidates are generated once per probe depth
    * (monotone supersets), each cell a rank-filter-rank over them —
    * integer counts + one 6dp division per row. */
  val s23 = q("s23_adc_tuning", {
    val blocks = (0 until 4).map(s => pqSubCtes(s, k = 8, subDim = 16, src = "res"))
    val scs = (0 until 4).map { s =>
      val lo = s * 16 + 1; val hi = (s + 1) * 16
      s"""sc_$s AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         |  list_dot_product(q.v[$lo:$hi], c.v) AS d
         | FROM qs q, af_$s a JOIN c2_$s c ON c.cid = a.code)""".stripMargin
    }
    val grid = for { p <- 1 to 4; sl <- Seq(5, 10, 20) } yield
      s"""SELECT CAST($p AS BIGINT) AS nprobe, CAST($sl AS BIGINT) AS shortlist,
         | CAST(COUNT(*) AS BIGINT) AS n_exact,
         | CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
         | round(CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*), 6) AS recall
         |FROM exact x LEFT JOIN (
         | SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS rn
         |  FROM (SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
         |     PARTITION BY query_id ORDER BY approx DESC, neighbor_id) AS arn
         |    FROM scored WHERE r <= $p) WHERE arn <= $sl) WHERE rn <= 5) a
         | ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id""".stripMargin
    s"""$ivfOracleCtes,
       |res AS MATERIALIZED (SELECT af.vec_id, af.cid,
       |  list_transform(range(len(af.v)), i -> af.v[i+1] - c.v[i+1]) AS v
       | FROM af JOIN c2 c USING (cid)),
       |${blocks.mkString(",\n")},
       |${scs.mkString(",\n")},
       |pr AS (SELECT qs.vec_id AS query_id, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY qs.vec_id
       |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(qs.v, c.v), c.cid) AS r
       | FROM qs, c2 c),
       |cd AS (SELECT q.vec_id AS query_id, c.cid,
       |  list_dot_product(q.v, c.v) AS cd
       | FROM qs q, c2 c),
       |cand AS (SELECT p.query_id, af.vec_id AS neighbor_id, af.cid, p.r
       | FROM pr p JOIN af ON af.cid = p.cid WHERE p.r <= 4),
       |scored AS MATERIALIZED (SELECT c.query_id, c.neighbor_id, c.r,
       |  round(cd.cd + sc_0.d + sc_1.d + sc_2.d + sc_3.d, 6) AS approx,
       |  round(list_cosine_similarity(qe.v, ce.v), 6) AS cos
       | FROM cand c JOIN cd ON cd.query_id = c.query_id AND cd.cid = c.cid
       |  JOIN sc_0 ON sc_0.query_id = c.query_id AND sc_0.neighbor_id = c.neighbor_id
       |  JOIN sc_1 ON sc_1.query_id = c.query_id AND sc_1.neighbor_id = c.neighbor_id
       |  JOIN sc_2 ON sc_2.query_id = c.query_id AND sc_2.neighbor_id = c.neighbor_id
       |  JOIN sc_3 ON sc_3.query_id = c.query_id AND sc_3.neighbor_id = c.neighbor_id
       |  JOIN e qe ON qe.vec_id = c.query_id
       |  JOIN e ce ON ce.vec_id = c.neighbor_id),
       |exact AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
       | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |  round(list_cosine_similarity(q.v, c.v), 6) AS cos
       | FROM qs q, corp c)
       | QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
       |   ORDER BY cos DESC, neighbor_id) <= 5)
       |${grid.mkString("\nUNION ALL ")}""".stripMargin
  }) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val corp = emb.filter(col("id") >= 10)
    val ivf = Similarity.ensureIvfIndex(s, ivfIndexName(dir), corp,
      nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)))
    val (codes, books) = Similarity.ensureResidualPqModel(s, pqResModelName(dir),
      ivf, m = 4, k = 8, iters = 2, dim = 64, fingerprint = Some(embFp(dir)))
    val postings = Similarity.ensureAdcPostings(s, pqResModelName(dir), ivf,
      codes, m = 4, fingerprint = Some(embFp(dir)))
    val queries = emb.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(queries, corp, 5)
      .select("query_id", "neighbor_id").localCheckpoint(false)
    // score once at the deepest probe, slice 12 ways (the oracle's
    // `scored` table). r18: the 12 grid cells' two-level ranks are
    // CONDITIONAL running counts over TWO shared window passes —
    //   arn_p  = rank by (approx desc, neighbor) among {r <= p}
    //   rn_p_sl = rank by (cos desc, neighbor) among {r <= p, arn_p <= sl}
    // ≡ each cell's rank-filter-rank over its own filtered subtree
    // (24 window plans before; the rank-within-filtered-set identity
    // is the same one s21 uses).
    val grid = for { p <- 1 to 4; sl <- Seq(5, 10, 20) } yield (p, sl)
    val uw = org.apache.spark.sql.expressions.Window
    def runWin(order: Seq[Column]) = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(order: _*)
      .rowsBetween(uw.unboundedPreceding, uw.currentRow)
    val wApprox = runWin(Seq(col("approx").desc, col("neighbor_id")))
    val wCos = runWin(Seq(col("cos").desc, col("neighbor_id")))
    val scored = Similarity.adcResidualScoredCandidates(queries, ivf,
        postings, books, maxProbe = 4)
      .select(Seq(col("query_id"), col("neighbor_id"), col("r"),
        col("cos")) ++
        (1 to 4).map(p =>
          sum(when(col("r") <= p, 1)).over(wApprox).as(s"arn_$p")): _*)
    val ranked = scored.select(Seq(col("query_id"), col("neighbor_id"),
        col("r")) ++ (1 to 4).map(p => col(s"arn_$p")) ++
        grid.map { case (p, sl) =>
          sum(when(col("r") <= p && col(s"arn_$p") <= sl, 1)).over(wCos)
            .as(s"rn_${p}_$sl")
        }: _*)
      .localCheckpoint(false)
    grid.map { case (p, sl) =>
      val ann = ranked.filter(col("r") <= p && col(s"arn_$p") <= sl &&
          col(s"rn_${p}_$sl") <= 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      exact.join(ann, Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
        .select(lit(p.toLong).as("nprobe"), lit(sl.toLong).as("shortlist"),
          col("n_exact"), col("n_hit"))
    }.reduce(_ unionByName _)
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_exact"), 6))
  }

  /** Tokenizer-TRUE sequence packing (p10): learn the BPE merges
    * (t30), tokenize the corpus with them (t31), pack to fixed-token
    * sequences by the TRAINED tokenizer's counts (the number a real
    * pre-training run budgets by — whitespace counts under-fill packs
    * exactly where BPE compresses most), and report per-(shard, pack)
    * occupancy. The oracle rides t30's unrolled chain: seg_6 IS the
    * trained segmentation, so learn, apply, and pack are pinned in one
    * gate. */
  val p10 = q("p10_bpe_pack",
    s"""WITH b2 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |b AS (SELECT t FROM b2),
       |seg_0 AS MATERIALIZED (
       | SELECT term AS word, COUNT(*) AS cnt, string_split(term, '') AS syms
       | FROM (SELECT unnest(t) AS term FROM b) GROUP BY term),
       |${(1 to BpeRounds).map(r => bpeRoundCtes(r)).mkString(",\n")},
       |docw AS (SELECT doc_id, unnest(t) AS word FROM b2),
       |dtok AS (SELECT d.doc_id,
       |  CAST(SUM(len(s.syms)) AS BIGINT) AS n_tokens
       | FROM docw d JOIN seg_${BpeRounds} s ON s.word = d.word
       | GROUP BY d.doc_id),
       |packed AS (SELECT doc_id, doc_id % 4 AS shard, n_tokens,
       |  CAST((SUM(n_tokens) OVER (PARTITION BY doc_id % 4 ORDER BY doc_id)
       |   - n_tokens) // 4096 AS BIGINT) AS pack_id
       | FROM dtok)
       |SELECT shard, pack_id, COUNT(*) AS n_docs,
       | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |FROM packed GROUP BY shard, pack_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val rules = TextAnalysis.bpeMerges(docs, "text", rounds = BpeRounds)
      .orderBy("round").select("x", "y").as[(String, String)].collect().toSeq
    TextAnalysis.packByCount(
        TextAnalysis.bpeApply(docs, "doc_id", "text", rules),
        "doc_id", "n_bpe_tokens", capacity = 4096, shards = 4)
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
  }

  // ---- unigram-LM (SentencePiece-style) tokenizer: t37 learn / t38 apply

  private val UniVocab = 48
  private val UniRounds = 2
  private val UniPiece = 4
  private val UniWordLen = TextAnalysis.UnigramMaxWordLen

  /** The unrolled Viterbi DP over prefix lengths 1..UniWordLen under
    * the vocab CTE `vocab`, per word of the `words` table: dp_<tag>_j
    * holds, per word with len ≥ j, the canonical best (score, ntok,
    * last-piece length) for the j-char prefix — ROW_NUMBER (score DESC,
    * ntok ASC, bp ASC) is the same total order the native expression
    * folds left-to-right ([[graft.plans.UnigramViterbi]]), so ties
    * cannot diverge. The l = 1 legs are TOTAL (LEFT JOIN + the
    * `MIN(score) - 10000000` unk floor — the same one-definition rule
    * as [[graft.plans.TextHash.unkScoreOf]]): an out-of-alphabet code
    * point segments as its own unk piece, never an unreachable cell.
    * dp_<tag> unions the stages with a pos column for the backtrace. */
  private def uniDpCtes(tag: String, vocab: String,
                        words: String = "uwords"): String = {
    val unk = s"(SELECT MIN(score) - 10000000 FROM $vocab)"
    val stages = (1 to UniWordLen).map { j =>
      val legs = (1 to math.min(UniPiece, j)).map { l =>
        if (l == 1 && j == 1)
          s"""SELECT w.word, COALESCE(v.score, $unk) AS score, 1 AS ntok, 1 AS bp
             |   FROM $words w LEFT JOIN $vocab v ON v.piece = substr(w.word, 1, 1)
             |   WHERE w.wl >= $j""".stripMargin
        else if (l == j)
          s"""SELECT w.word, v.score AS score, 1 AS ntok, $l AS bp
             |   FROM $words w JOIN $vocab v ON v.piece = substr(w.word, 1, $l)
             |   WHERE w.wl >= $j""".stripMargin
        else if (l == 1)
          s"""SELECT d.word, d.score + COALESCE(v.score, $unk) AS score, d.ntok + 1 AS ntok, 1 AS bp
             |   FROM dp_${tag}_${j - 1} d JOIN $words w ON w.word = d.word
             |   LEFT JOIN $vocab v ON v.piece = substr(d.word, $j, 1)
             |   WHERE w.wl >= $j""".stripMargin
        else
          s"""SELECT d.word, d.score + v.score AS score, d.ntok + 1 AS ntok, $l AS bp
             |   FROM dp_${tag}_${j - l} d JOIN $words w ON w.word = d.word
             |   JOIN $vocab v ON v.piece = substr(d.word, ${j - l + 1}, $l)
             |   WHERE w.wl >= $j""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""dp_${tag}_$j AS MATERIALIZED (
         | SELECT word, score, ntok, bp FROM (
         |  SELECT word, score, ntok, bp, ROW_NUMBER() OVER (PARTITION BY word
         |    ORDER BY score DESC, ntok ASC, bp ASC) AS rn
         |  FROM ($legs)) WHERE rn = 1)""".stripMargin
    }
    stages.mkString(",\n") + s""",
       |dp_$tag AS MATERIALIZED (${(1 to UniWordLen).map(j =>
          s"SELECT word, CAST($j AS BIGINT) AS pos, score, ntok, bp FROM dp_${tag}_$j")
          .mkString("\n UNION ALL ")})""".stripMargin
  }

  /** Linear backtrace of the canonical segmentation: walk bp from
    * pos = len(word) down to 0, one piece per step (a recursive CTE
    * with strictly decreasing pos — no path enumeration). */
  private def uniBtCte(tag: String): String =
    s"""bt_$tag(word, pos, piece) AS (
       | SELECT w.word, CAST(w.wl - d.bp AS BIGINT),
       |  substr(w.word, w.wl - d.bp + 1, d.bp)
       | FROM uwords w JOIN dp_$tag d ON d.word = w.word AND d.pos = w.wl
       | UNION ALL
       | SELECT b.word, b.pos - d.bp,
       |  substr(b.word, CAST(b.pos - d.bp + 1 AS INT), d.bp)
       | FROM bt_$tag b JOIN dp_$tag d ON d.word = b.word AND d.pos = b.pos
       | WHERE b.pos > 0)""".stripMargin

  /** Per-word out-of-alphabet code-point count under `vocab`'s
    * single-char pieces — the oracle twin of
    * [[graft.plans.TextHash.unigramOovCount]] (≡ the unk-piece count
    * of the canonical total segmentation: no vocab piece contains an
    * out-of-alphabet code point, so each is covered by exactly one
    * unk piece). */
  private def uniUnkCte(vocab: String, words: String): String =
    s"""alpha AS (SELECT piece FROM $vocab WHERE len(piece) = 1),
       |wunk AS MATERIALIZED (SELECT wc.word,
       |  CAST(SUM(CASE WHEN a.piece IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nunk
       | FROM (SELECT word, unnest(list_transform(range(1, wl + 1),
       |    i -> substr(word, CAST(i AS INT), 1))) AS ch FROM $words) wc
       | LEFT JOIN alpha a ON a.piece = wc.ch GROUP BY wc.word)""".stripMargin

  /** One hard-EM round: Viterbi DP under vocab_{r−1}, backtrace,
    * recount pieces weighted by word frequency, prune unused
    * multi-char pieces, floor the alphabet at 1, rescore. */
  private def uniEmCtes(r: Int): String =
    s"""${uniDpCtes(s"r$r", s"vocab_${r - 1}")},
       |${uniBtCte(s"r$r")},
       |used_$r AS MATERIALIZED (SELECT b.piece, CAST(SUM(w.cnt) AS BIGINT) AS used
       | FROM bt_r$r b JOIN uwords w USING (word) GROUP BY b.piece),
       |kept_$r AS MATERIALIZED (
       | SELECT v.piece,
       |  CASE WHEN len(v.piece) = 1 THEN greatest(coalesce(u.used, 0), 1)
       |       ELSE u.used END AS cnt
       | FROM vocab_${r - 1} v LEFT JOIN used_$r u ON u.piece = v.piece
       | WHERE len(v.piece) = 1 OR coalesce(u.used, 0) > 0),
       |vocab_$r AS MATERIALIZED (
       | SELECT piece, cnt,
       |  CAST(round(ln(cnt * 1.0 / (SELECT SUM(cnt) FROM kept_$r)) * 1000000.0)
       |   AS BIGINT) AS score
       | FROM kept_$r)""".stripMargin

  /** Seed: substring candidates of the distinct-word table, all
    * single-char pieces + top (UniVocab − alphabet) multi-char by
    * (count desc, piece asc), scored like every round. `where`
    * restricts the TRAINING corpus (the t40 cross-corpus split). */
  private def uniSeedCtes(where: String = ""): String =
    s"""uwords AS MATERIALIZED (
       | SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(len(word) AS INT) AS wl
       | FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents$where)
       | GROUP BY word),
       |usubs AS MATERIALIZED (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
       |${(1 to UniPiece).map(l =>
          s" SELECT unnest(list_transform(range(1, w.wl - $l + 2)," +
            s" i -> substr(w.word, CAST(i AS INT), $l))) AS piece, w.cnt" +
            s" FROM uwords w WHERE w.wl >= $l").mkString("\n UNION ALL\n")}
       |) GROUP BY piece),
       |kept_0 AS MATERIALIZED (
       | SELECT piece, cnt FROM usubs WHERE len(piece) = 1
       | UNION ALL
       | SELECT piece, cnt FROM (
       |  SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece ASC) AS rn
       |  FROM usubs WHERE len(piece) > 1)
       | WHERE rn <= $UniVocab - (SELECT COUNT(*) FROM usubs WHERE len(piece) = 1)),
       |vocab_0 AS MATERIALIZED (
       | SELECT piece, cnt,
       |  CAST(round(ln(cnt * 1.0 / (SELECT SUM(cnt) FROM kept_0)) * 1000000.0)
       |   AS BIGINT) AS score
       | FROM kept_0)""".stripMargin

  /** Unigram-LM tokenizer LEARNING (t37) — see
    * [[TextAnalysis.unigramVocab]]: hard-EM (Viterbi-EM) over a
    * substring seed vocab with pruning, integer-scaled log-prob
    * scores, alphabet never pruned. The oracle unrolls the whole
    * learner: seed selection, per-round 12-stage DP + linear
    * backtrace + recount + rescore — learn ≡ learn, bit-for-bit. */
  val t37 = q("t37_unigram_vocab",
    s"""WITH RECURSIVE
       |${uniSeedCtes()},
       |${(1 to UniRounds).map(uniEmCtes).mkString(",\n")}
       |SELECT piece, cnt, score FROM vocab_$UniRounds""".stripMargin) { (s, dir) =>
    TextAnalysis.unigramVocab(Tables.documents(s, dir), "text",
      vocabSize = UniVocab, rounds = UniRounds, maxPieceLen = UniPiece)
  }

  /** Tokenize WITH the trained unigram LM (t38, the t31 shape): per
    * doc, word/char counts and the token count under the canonical
    * Viterbi segmentation. The oracle extends t37's chain with one
    * more DP under the final vocab and reads each word's ntok at
    * pos = len — learn ≡ learn AND apply ≡ apply in one gate. */
  val t38 = q("t38_unigram_apply",
    s"""WITH RECURSIVE
       |${uniSeedCtes()},
       |${(1 to UniRounds).map(uniEmCtes).mkString(",\n")},
       |${uniDpCtes("ap", s"vocab_$UniRounds")},
       |wtok AS MATERIALIZED (SELECT w.word, d.ntok FROM uwords w
       | JOIN dp_ap d ON d.word = w.word AND d.pos = w.wl),
       |${uniUnkCte(s"vocab_$UniRounds", "uwords")},
       |docw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       | FROM documents)
       |SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       | CAST(SUM(len(d.word)) AS BIGINT) AS n_chars,
       | CAST(SUM(t.ntok) AS BIGINT) AS n_unigram_tokens,
       | CAST(SUM(u.nunk) AS BIGINT) AS n_unk
       |FROM docw d JOIN wtok t USING (word) JOIN wunk u USING (word)
       |GROUP BY d.doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
    // frame reuse (r19): the trainer's distinct-word table IS the
    // apply-side word table (same corpus, same tokenizer) — one corpus
    // tokenize+distinct saved per invocation
    val (words, vocabDf) = TextAnalysis.unigramVocabFrames(docs, "text",
      vocabSize = UniVocab, rounds = UniRounds, maxPieceLen = UniPiece)
    val vocab = vocabDf
      .select(col("piece"), col("score")).as[(String, Long)].collect().toMap
    TextAnalysis.unigramApplyFrames(docs, "doc_id", "text", words, vocab,
      maxPieceLen = UniPiece)
  }

  /** Metadata-FILTERED IVF-ADC retrieval (s24) — s19's
    * filter-rides-the-posting discipline applied to the compressed
    * path (s12): the label joins postings on (cid, label) INSIDE the
    * narrow posting scan, candidates are ADC-scored (per-query LUT,
    * m lookups each), the approx shortlist reranks by exact cosine.
    * Post-filtering an unfiltered shortlist would under-fill k
    * whenever the filter is selective — the gate is in the scan, and
    * recall stays bounded by the probed cells exactly as unfiltered.
    * The oracle re-derives the coarse index AND the sub-codebooks and
    * scores through the same decomposition with the same label gate. */
  val s24 = q("s24_filtered_ivfadc", {
    val blocks = (0 until 4).map(s => pqSubCtes(s, k = 8, subDim = 16, src = "corp"))
    val scs = (0 until 4).map { s =>
      val lo = s * 16 + 1; val hi = (s + 1) * 16
      s"""sc_$s AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         |  list_dot_product(q.v[$lo:$hi], c.v) AS d
         | FROM qs q, af_$s a JOIN c2_$s c ON c.cid = a.code)""".stripMargin
    }
    s"""$ivfOracleCtes,
       |${blocks.mkString(",\n")},
       |${scs.mkString(",\n")},
       |lbl AS (SELECT vec_id, label FROM embeddings),
       |probe AS (SELECT vec_id AS query_id, cid FROM (
       | SELECT qs.vec_id, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY qs.vec_id
       |   ORDER BY list_dot_product(c.v, c.v) - 2.0 * list_dot_product(qs.v, c.v), c.cid) AS r
       | FROM qs, c2 c) WHERE r <= 4),
       |cand AS (SELECT p.query_id, ql.label AS label, af.vec_id AS neighbor_id
       | FROM probe p JOIN af ON af.cid = p.cid
       | JOIN lbl ql ON ql.vec_id = p.query_id
       | JOIN lbl cl ON cl.vec_id = af.vec_id AND cl.label = ql.label),
       |approx AS (SELECT c.query_id, c.label, c.neighbor_id,
       |  round(sc_0.d + sc_1.d + sc_2.d + sc_3.d, 6) AS approx
       | FROM cand c JOIN sc_0 USING (query_id, neighbor_id)
       |  JOIN sc_1 USING (query_id, neighbor_id)
       |  JOIN sc_2 USING (query_id, neighbor_id)
       |  JOIN sc_3 USING (query_id, neighbor_id)),
       |short AS (SELECT query_id, label, neighbor_id FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY approx DESC, neighbor_id) AS arn FROM approx) WHERE arn <= 20),
       |rr AS (SELECT s.query_id, s.label, s.neighbor_id,
       |  round(list_cosine_similarity(qe.v, ce.v), 6) AS cos
       | FROM short s JOIN e qe ON qe.vec_id = s.query_id
       |  JOIN e ce ON ce.vec_id = s.neighbor_id)
       |SELECT query_id, label, neighbor_id, cos,
       | CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |   ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
       |FROM rr QUALIFY rn <= 5""".stripMargin
  }) { (s, dir) =>
    val emb = Tables.embeddings(s, dir).select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"), col("label"))
    val lblModel = Similarity.ensureIvfIndex(s, ivfLblIndexName(dir),
      emb.filter(col("id") >= 10), nCentroids = 16, iters = 2,
      portableInit = true, fingerprint = Some(embFp(dir)),
      extraCols = Seq("label"))
    val (codes, books) = Similarity.ensurePqModel(s, pqModelName(dir),
      emb.filter(col("id") >= 10)
        .select(col("id").as("vec_id"), col("vec").as("embedding")),
      m = 4, k = 8, iters = 2, dim = 64, fingerprint = Some(embFp(dir)))
    // postings DERIVED from two persisted artifacts (labeled
    // assignments × PQ codes) — one bucket-aligned join; a deployment
    // at maintenance cadence lands them as a table with the same
    // writer, extraCols riding every batch
    val postings = Similarity.adcPostings(lblModel, codes, m = 4,
      extraCols = Seq("label"))
    Similarity.ivfAdcFilteredTopK(emb.filter(col("id") < 10), lblModel,
      postings, books, k = 5, nProbe = 4, shortlist = 20,
      filterCol = "label")
  }

  /** Embedding-drift SEGMENT monitor (s25) — the corpus-level early
    * warning the vector side was missing (t25's token-drift twin):
    * old vs new ingest segments routed onto the SAME persisted
    * centroids; per cell the occupancy shift and the squared
    * displacement between segment means, ranked by shift. A rising
    * report schedules `--mode retrain` BEFORE recall dips. The oracle
    * replays the portable unrolled-Lloyd index, splits the final
    * assignment by segment, and re-derives the decimal-exact means. */
  val s25 = q("s25_segment_drift",
    s"""$ivfOracleCtes,
       |oseg AS (SELECT cid, v FROM af WHERE vec_id % 2 = 0),
       |nseg AS (SELECT cid, v FROM af WHERE vec_id % 2 = 1),
       |oc AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_old FROM oseg GROUP BY cid),
       |nc AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_new FROM nseg GROUP BY cid),
       |om AS (SELECT cid, pos, CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / COUNT(x) AS m
       | FROM (SELECT cid, unnest(range(len(v))) AS pos, unnest(v) AS x FROM oseg)
       | GROUP BY cid, pos),
       |nm AS (SELECT cid, pos, CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / COUNT(x) AS m
       | FROM (SELECT cid, unnest(range(len(v))) AS pos, unnest(v) AS x FROM nseg)
       | GROUP BY cid, pos),
       |oma AS (SELECT cid, list(m ORDER BY pos) AS mv FROM om GROUP BY cid),
       |nma AS (SELECT cid, list(m ORDER BY pos) AS mv FROM nm GROUP BY cid),
       |dv AS (SELECT o.cid,
       |  list_transform(range(len(o.mv)),
       |   i -> o.mv[CAST(i + 1 AS INT)] - n.mv[CAST(i + 1 AS INT)]) AS d
       | FROM oma o JOIN nma n USING (cid)),
       |tot AS (SELECT (SELECT COUNT(*) FROM oseg) AS t_old,
       |  (SELECT COUNT(*) FROM nseg) AS t_new),
       |grid AS (SELECT CAST(b.range AS BIGINT) AS cid FROM range(16) b),
       |rep AS (SELECT g.cid,
       |  COALESCE(oc.n_old, 0) AS n_old, COALESCE(nc.n_new, 0) AS n_new,
       |  round(abs(COALESCE(nc.n_new, 0) * 1.0 / t.t_new
       |    - COALESCE(oc.n_old, 0) * 1.0 / t.t_old), 6) AS occ_shift,
       |  round(list_dot_product(dv.d, dv.d), 6) AS disp
       | FROM grid g LEFT JOIN oc USING (cid) LEFT JOIN nc USING (cid)
       | LEFT JOIN dv ON dv.cid = g.cid CROSS JOIN tot t)
       |SELECT cid, n_old, n_new, occ_shift, disp,
       | CAST(ROW_NUMBER() OVER (ORDER BY occ_shift DESC, cid) AS BIGINT)
       |  AS drift_rank
       |FROM rep""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddingsFanned(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val model = Similarity.ensureIvfIndex(s, ivfIndexName(dir),
      emb.filter(col("id") >= 10), nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)))
    Similarity.segmentDriftReport(model,
      emb.filter(col("id") >= 10 && pmod(col("id"), lit(2)) === 0)
        .select("vec"),
      emb.filter(col("id") >= 10 && pmod(col("id"), lit(2)) === 1)
        .select("vec"))
  }

  /** Prototypicality selection over the coarse cells (s26 — Sorscher
    * et al. 2022: rank by closeness to the cluster centroid, keep the
    * top-k most prototypical per cell — the coverage-balanced corpus
    * selection / data-pruning primitive). The oracle replays the
    * portable unrolled-Lloyd index and ranks the final assignment
    * against the same final centroids. */
  val s26 = q("s26_prototype_select",
    s"""$ivfOracleCtes,
       |scored AS (SELECT af.cid, af.vec_id,
       |  round(list_cosine_similarity(af.v, c.v), 6) AS cos_centroid
       | FROM af JOIN c2 c ON c.cid = af.cid)
       |SELECT cid, vec_id, cos_centroid,
       | CAST(ROW_NUMBER() OVER (PARTITION BY cid
       |   ORDER BY cos_centroid DESC, vec_id) AS BIGINT) AS rn
       |FROM scored QUALIFY rn <= 8""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val model = Similarity.ensureIvfIndex(s, ivfIndexName(dir),
      emb.filter(col("id") >= 10), nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)))
    Similarity.prototypeSelect(model, k = 8)
  }

  /** SemDeDup over the persisted IVF cells (d22 — Abbas et al. 2023):
    * semantic near-dups are pruned WITHIN coarse-quantizer clusters
    * only — the assignment is the blocking structure, so pairwise
    * cosine never touches the full corpus. Keep-min per >θ pair (the
    * d02/d15 discipline on semantic similarity; strict >, the d06
    * boundary rule); one row per cell
    * incl. empty ones (the s20 rule) with vec/dropped/kept counts.
    * The oracle replays the portable unrolled-Lloyd clustering and the
    * same within-cell pair rule. */
  val d22 = q("d22_semdedup", {
    s"""$ivfOracleCtes,
       |pairs AS (SELECT b.cid, b.vec_id FROM af a JOIN af b
       | ON a.cid = b.cid AND a.vec_id < b.vec_id
       | WHERE round(list_cosine_similarity(a.v, b.v), 6) > 0.45),
       |dropped AS (SELECT cid, CAST(COUNT(DISTINCT vec_id) AS BIGINT)
       |  AS n_dropped FROM pairs GROUP BY cid),
       |counts AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vecs
       | FROM af GROUP BY cid),
       |grid AS (SELECT CAST(b.range AS BIGINT) AS cid FROM range(16) b)
       |SELECT g.cid, COALESCE(c.n_vecs, 0) AS n_vecs,
       | COALESCE(d.n_dropped, 0) AS n_dropped,
       | COALESCE(c.n_vecs, 0) - COALESCE(d.n_dropped, 0) AS n_kept
       |FROM grid g LEFT JOIN counts c USING (cid)
       |LEFT JOIN dropped d USING (cid)""".stripMargin
  }) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val model = Similarity.ensureIvfIndex(s, ivfIndexName(dir),
      emb.filter(col("id") >= 10), nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)))
    Similarity.semDedupCellStats(model, threshold = 0.45)
  }

  /** CAPPED SemDeDup report (d24) — d22's rule with the hot-cell cap
    * ACTIVE ([[Similarity.semDedupCellStatsCapped]], maxCell = 30 —
    * a MIXED split at the smoke SFs, so one gate run pins both legs
    * and the boundary between them):
    * cells at/under the cap keep the exact all-pairs rule, cells above
    * it degrade to the s07 keeper rule (O(s), broadcast keeper join),
    * `capped` marks where the bound bit. The oracle replays the same
    * split: all-pairs for cold cells, keeper-vs-member for hot ones —
    * the degrade semantics pinned cross-engine, not just spec'd. */
  val d24 = q("d24_semdedup_capped", {
    s"""$ivfOracleCtes,
       |counts AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vecs
       | FROM af GROUP BY cid),
       |hot AS (SELECT cid FROM counts WHERE n_vecs > 30),
       |coldpairs AS (SELECT b.cid, b.vec_id FROM af a JOIN af b
       | ON a.cid = b.cid AND a.vec_id < b.vec_id
       | WHERE a.cid NOT IN (SELECT cid FROM hot)
       |  AND round(list_cosine_similarity(a.v, b.v), 6) > 0.45),
       |colddrop AS (SELECT cid, CAST(COUNT(DISTINCT vec_id) AS BIGINT)
       |  AS n_dropped FROM coldpairs GROUP BY cid),
       |keepers AS (SELECT af.cid, af.vec_id, af.v FROM af
       | JOIN (SELECT cid, MIN(vec_id) AS kid FROM af GROUP BY cid) k
       |  ON k.cid = af.cid AND k.kid = af.vec_id
       | WHERE af.cid IN (SELECT cid FROM hot)),
       |hotdrop AS (SELECT a.cid, CAST(COUNT(*) AS BIGINT) AS n_dropped
       | FROM af a JOIN keepers kp ON kp.cid = a.cid AND a.vec_id <> kp.vec_id
       | WHERE round(list_cosine_similarity(a.v, kp.v), 6) > 0.45
       | GROUP BY a.cid),
       |drops AS (SELECT * FROM colddrop UNION ALL SELECT * FROM hotdrop),
       |grid AS (SELECT CAST(b.range AS BIGINT) AS cid FROM range(16) b)
       |SELECT g.cid, COALESCE(c.n_vecs, 0) AS n_vecs,
       | COALESCE(d.n_dropped, 0) AS n_dropped,
       | COALESCE(c.n_vecs, 0) - COALESCE(d.n_dropped, 0) AS n_kept,
       | g.cid IN (SELECT cid FROM hot) AS capped
       |FROM grid g LEFT JOIN counts c USING (cid)
       |LEFT JOIN drops d USING (cid)""".stripMargin
  }) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val model = Similarity.ensureIvfIndex(s, ivfIndexName(dir),
      emb.filter(col("id") >= 10), nCentroids = 16, iters = 2, portableInit = true,
      fingerprint = Some(embFp(dir)))
    Similarity.semDedupCellStatsCapped(model, threshold = 0.45, maxCell = 30)
  }

  /** Shared oracle chain for the keep-first substring REMOVAL (d23 /
    * p12 — [[Dedup.substringDedupRewrite]], k = 8): gram keys over the
    * `toksCte` table, keep-first marking (ROW_NUMBER per gkey ordered
    * by (doc_id, pos) — rn 1 IS the kept first occurrence), the d11
    * gaps-and-islands span merge widened to token-index bounds, and
    * the covered-token set. */
  private def substrRemovalCtes(toksCte: String): String =
    s"""g23 AS (
       | SELECT doc_id,
       |  CAST(unnest(range(len(t) - 7)) AS BIGINT) AS pos,
       |  unnest(list_transform(range(len(t) - 7),
       |   i -> md5(array_to_string(t[i+1:i+8], ' ')))) AS gkey
       | FROM $toksCte WHERE len(t) >= 8),
       |marked23 AS (
       | SELECT doc_id, pos FROM (
       |  SELECT doc_id, pos,
       |   ROW_NUMBER() OVER (PARTITION BY gkey ORDER BY doc_id, pos) AS rn,
       |   COUNT(*) OVER (PARTITION BY gkey) AS n_occ
       |  FROM g23) WHERE n_occ >= 2 AND rn > 1),
       |flag23 AS (
       | SELECT doc_id, pos,
       |  CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 8
       |   THEN 1 ELSE 0 END AS brk
       | FROM marked23 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |sp23_0 AS (
       | SELECT doc_id, pos,
       |  SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
       | FROM flag23),
       |sp23 AS (SELECT doc_id, MIN(pos) AS p0, MAX(pos) + 7 AS p1
       | FROM sp23_0 GROUP BY doc_id, span_id),
       |tokpos23 AS (SELECT doc_id,
       |  CAST(unnest(range(len(t))) AS BIGINT) AS i, unnest(t) AS tok
       | FROM $toksCte),
       |cov23 AS (SELECT DISTINCT tp.doc_id, tp.i FROM tokpos23 tp
       | JOIN sp23 s ON s.doc_id = tp.doc_id AND tp.i BETWEEN s.p0 AND s.p1)"""
      .stripMargin

  /** Duplicated-substring REMOVAL (d23) — the production rewrite d11
    * only profiles ([[Dedup.substringDedupRewrite]]): every repeated
    * 8-gram keeps its corpus-order first occurrence, marked windows
    * merge to maximal spans, covered tokens drop; per doc the cleaned
    * text plus removed token/char counts. The oracle replays the same
    * inverted index, keep-first rule, and span merge in SQL. */
  val d23 = q("d23_substring_removal",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |${substrRemovalCtes("toks")}
       |SELECT tp.doc_id,
       | CAST(COUNT(*) AS BIGINT) AS n_tokens,
       | CAST(COUNT(c.i) AS BIGINT) AS n_removed_tokens,
       | CAST(COALESCE(SUM(CASE WHEN c.i IS NOT NULL THEN len(tp.tok) END), 0)
       |  AS BIGINT) AS n_removed_chars,
       | COALESCE(string_agg(CASE WHEN c.i IS NULL THEN tp.tok END, ' '
       |  ORDER BY tp.i), '') AS clean_text
       |FROM tokpos23 tp LEFT JOIN cov23 c ON c.doc_id = tp.doc_id AND c.i = tp.i
       |GROUP BY tp.doc_id""".stripMargin) { (s, dir) =>
    Dedup.substringDedupRewrite(Tables.documentsFanned(s, dir), "doc_id", "text",
      k = 8)
  }

  /** Tokenizer COMPARISON report (t39) — the corpus-level fertility /
    * compression numbers a pipeline owner reads to PICK a tokenizer:
    * for each trained family (t30's 6-rule BPE, t37's unigram LM),
    * total words / chars / tokens plus tokens-per-word (fertility) and
    * chars-per-token (compression), 6dp. Both tokenizers are LEARNED
    * and APPLIED inside the query (the p10/p11 discipline), so the
    * report is end-to-end oracle-exact: the oracle carries BOTH
    * unrolled chains — the BPE merge rounds AND the unigram EM DP —
    * in one statement and reads each family's trained segmentation.
    * Corpus text is scanned once per family's word table + once per
    * doc join; everything else runs over distinct words. */
  val t39 = q("t39_tokenizer_compare",
    s"""WITH RECURSIVE b AS (SELECT string_split(text, ' ') AS t FROM documents),
       |seg_0 AS MATERIALIZED (
       | SELECT term AS word, COUNT(*) AS cnt, string_split(term, '') AS syms
       | FROM (SELECT unnest(t) AS term FROM b) GROUP BY term),
       |${(1 to BpeRounds).map(r => bpeRoundCtes(r)).mkString(",\n")},
       |$byteBpeSeedCte,
       |${(1 to BpeRounds).map(r => bpeRoundCtes(r, "b")).mkString(",\n")},
       |${uniSeedCtes()},
       |${(1 to UniRounds).map(uniEmCtes).mkString(",\n")},
       |${uniDpCtes("ap", s"vocab_$UniRounds")},
       |wtok AS MATERIALIZED (SELECT w.word, d.ntok FROM uwords w
       | JOIN dp_ap d ON d.word = w.word AND d.pos = w.wl),
       |docw AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |bpet AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(len(d.word)) AS BIGINT) AS n_chars,
       |  CAST(SUM(len(s.syms)) AS BIGINT) AS n_tokens
       | FROM docw d JOIN seg_$BpeRounds s ON s.word = d.word),
       |unit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(len(d.word)) AS BIGINT) AS n_chars,
       |  CAST(SUM(t.ntok) AS BIGINT) AS n_tokens
       | FROM docw d JOIN wtok t USING (word)),
       |bdocw AS (SELECT unnest(regexp_extract_all(text,
       |  '${TextAnalysis.BytePreTokenPattern}')) AS word FROM documents),
       |bbpet AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(strlen(d.word)) AS BIGINT) AS n_chars,
       |  CAST(SUM(len(s.syms)) AS BIGINT) AS n_tokens
       | FROM bdocw d JOIN bseg_$BpeRounds s ON s.word = d.word)
       |SELECT tokenizer, n_words, n_chars, n_tokens,
       | round(n_tokens * 1.0 / n_words, 6) AS tokens_per_word,
       | round(n_chars * 1.0 / n_tokens, 6) AS chars_per_token
       |FROM (SELECT 'bpe' AS tokenizer, * FROM bpet
       |      UNION ALL SELECT 'unigram', * FROM unit
       |      UNION ALL SELECT 'byte', * FROM bbpet)""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
    // The three tokenizer trainings are INDEPENDENT driver loops of
    // small sequential jobs (argmax collect per merge round / EM
    // round), each leaving most cores idle between actions — so run
    // them as concurrent jobs from a thread pool (optimization guide
    // §2.6 "overlap independent jobs"; r18). Each training is
    // deterministic and untouched; only their wall-clocks overlap.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    // dedicated 3-thread pool, not the shared global fork-join pool:
    // these futures BLOCK on Spark collects, which would starve other
    // users of the implicit global, and a private pool can be shut
    // down so a failed training doesn't leave the other two burning
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val rulesF = Future(TextAnalysis.bpeMerges(docs, "text", rounds = BpeRounds)
        .orderBy("round").select("x", "y").as[(String, String)].collect().toSeq)
      val brulesF = Future(TextAnalysis.byteBpeMerges(docs, "text", rounds = BpeRounds)
        .orderBy("round").select("x", "y").as[(String, String)].collect().toSeq)
      val vocabF = Future {
        // frame reuse (r19, as t38): keep the trainer's distinct-word
        // frame for the apply leg below
        val (words, vdf) = TextAnalysis.unigramVocabFrames(docs, "text",
          vocabSize = UniVocab, rounds = UniRounds, maxPieceLen = UniPiece)
        (words,
          vdf.select(col("piece"), col("score")).as[(String, Long)].collect().toMap)
      }
      val rules = Await.result(rulesF, Duration.Inf)
      val brules = Await.result(brulesF, Duration.Inf)
      val (uwords, vocab) = Await.result(vocabF, Duration.Inf)
      t39Assemble(docs, rules, brules, uwords, vocab)
    } finally pool.shutdownNow()
  }

  private def t39Assemble(docs: DataFrame, rules: Seq[(String, String)],
                          brules: Seq[(String, String)], uwords: DataFrame,
                          vocab: Map[String, Long]): DataFrame = {
    def totals(applied: DataFrame, tokCol: String, name: String): DataFrame =
      applied.agg(sum(col("n_words")).as("n_words"),
          sum(col("n_chars")).as("n_chars"),
          sum(col(tokCol)).as("n_tokens"))
        .select(lit(name).as("tokenizer"), col("n_words"), col("n_chars"),
          col("n_tokens"))
    totals(TextAnalysis.bpeApply(docs, "doc_id", "text", rules),
        "n_bpe_tokens", "bpe")
      .unionByName(totals(
        TextAnalysis.unigramApplyFrames(docs, "doc_id", "text", uwords, vocab,
          maxPieceLen = UniPiece), "n_unigram_tokens", "unigram"))
      // the byte family reports pre-tokens as words and UTF-8 bytes as
      // the character mass (its native units — the fertility and
      // compression a byte-tokenizer owner actually budgets by)
      .unionByName(totals(
        TextAnalysis.byteBpeApply(docs, "doc_id", "text", brules)
          .withColumnRenamed("n_pretok", "n_words")
          .withColumnRenamed("n_bytes", "n_chars"),
        "n_byte_tokens", "byte"))
      .withColumn("tokens_per_word",
        round(col("n_tokens").cast("double") / col("n_words"), 6))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("n_tokens"), 6))
  }

  /** Unigram-tokenizer-TRUE sequence packing (p11) — p10's capstone
    * for the OTHER tokenizer family: learn the unigram-LM vocab (t37),
    * tokenize the corpus with the canonical Viterbi (t38), pack to
    * fixed-token sequences by the TRAINED tokenizer's counts, report
    * per-(shard, pack) occupancy. The oracle rides the t37/t38
    * unrolled chain — dp_ap IS the trained segmentation — so learn,
    * apply, and pack are pinned in one gate, the p10 discipline. */
  val p11 = q("p11_unigram_pack",
    s"""WITH RECURSIVE
       |${uniSeedCtes()},
       |${(1 to UniRounds).map(uniEmCtes).mkString(",\n")},
       |${uniDpCtes("ap", s"vocab_$UniRounds")},
       |wtok AS MATERIALIZED (SELECT w.word, d.ntok FROM uwords w
       | JOIN dp_ap d ON d.word = w.word AND d.pos = w.wl),
       |docw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       | FROM documents),
       |dtok AS (SELECT d.doc_id, CAST(SUM(t.ntok) AS BIGINT) AS n_tokens
       | FROM docw d JOIN wtok t USING (word) GROUP BY d.doc_id),
       |packed AS (SELECT doc_id, doc_id % 4 AS shard, n_tokens,
       |  CAST((SUM(n_tokens) OVER (PARTITION BY doc_id % 4 ORDER BY doc_id)
       |   - n_tokens) // 4096 AS BIGINT) AS pack_id
       | FROM dtok)
       |SELECT shard, pack_id, COUNT(*) AS n_docs,
       | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |FROM packed GROUP BY shard, pack_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
    // frame reuse (r19, as t38): trainer's word table feeds the apply
    val (words, vocabDf) = TextAnalysis.unigramVocabFrames(docs, "text",
      vocabSize = UniVocab, rounds = UniRounds, maxPieceLen = UniPiece)
    val vocab = vocabDf
      .select(col("piece"), col("score")).as[(String, Long)].collect().toMap
    TextAnalysis.packByCount(
        TextAnalysis.unigramApplyFrames(docs, "doc_id", "text", words, vocab,
          maxPieceLen = UniPiece),
        "doc_id", "n_unigram_tokens", capacity = 4096, shards = 4)
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
  }

  // t40's injected apply-split words: one mixed word carrying a
  // supplementary-plane code point (🦜 U+1F99C) AND a BMP
  // non-ASCII one (§ U+00A7) between likely-in-alphabet chars, plus
  // one ALL-unk word (🦉🦉) on even doc_ids — both planes exercised,
  // ONE shared constant so the Spark and DuckDB texts cannot drift
  private val UnkWordMixed = " a🦜b§c"
  private val UnkWordPure = " 🦉🦉"

  /** ONE definition of the t40/t43 cross-corpus oracle chain: train
    * split %5≠0 (seed + EM rounds arrive separately via
    * [[uniSeedCtes]]/[[uniEmCtes]]), apply split %5=0 with the
    * injected novel-character words, the unk-aware DP over the
    * apply-word table, per-word token + unk counts, and the exploded
    * doc-word table. t43 extends the same chain with banding — the
    * two queries cannot drift. */
  private def uniXcCtes: String =
    s"""adocs AS (SELECT doc_id, text || '$UnkWordMixed' ||
       |  CASE WHEN doc_id % 2 = 0 THEN '$UnkWordPure' ELSE '' END AS text
       | FROM documents WHERE doc_id % 5 = 0),
       |awords AS MATERIALIZED (SELECT word, CAST(len(word) AS INT) AS wl
       | FROM (SELECT unnest(string_split(text, ' ')) AS word FROM adocs)
       | GROUP BY word),
       |${uniDpCtes("xc", s"vocab_$UniRounds", words = "awords")},
       |wtok AS MATERIALIZED (SELECT w.word, d.ntok FROM awords w
       | JOIN dp_xc d ON d.word = w.word AND d.pos = w.wl),
       |${uniUnkCte(s"vocab_$UniRounds", "awords")},
       |docw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       | FROM adocs)""".stripMargin

  /** The t40/t43 NATIVE chain, shared: train the unigram vocab on the
    * %5≠0 split, inject the novel-character words into the held-out
    * split, guard the oracle's unrolled-DP word-length bound (loud,
    * not a silent join dropout — the operator itself stays total),
    * apply. */
  private def uniCrossApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val vocab = TextAnalysis.unigramVocab(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "text",
        vocabSize = UniVocab, rounds = UniRounds, maxPieceLen = UniPiece)
      .select(col("piece"), col("score")).as[(String, Long)].collect().toMap
    val applied = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .withColumn("text", concat(col("text"), lit(UnkWordMixed),
        when(pmod(col("doc_id"), lit(2)) === 0, lit(UnkWordPure))
          .otherwise(lit(""))))
    // ORACLE-parity guard, not an operator limit: the oracle DP is
    // unrolled to UniWordLen stages, and the learner's own require
    // covers only the TRAIN split — a longer held-out word would
    // silently vanish from the oracle's doc join while the total
    // native Viterbi counts it
    val applyMaxWl = applied
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .agg(coalesce(max(length(col("w"))), lit(0))).head().getInt(0)
    require(applyMaxWl <= UniWordLen,
      s"cross-corpus apply split carries a $applyMaxWl-char word but " +
        s"the oracle DP is unrolled to $UniWordLen stages")
    TextAnalysis.unigramApply(applied, "doc_id", "text", vocab,
      maxPieceLen = UniPiece)
  }

  /** CROSS-CORPUS unigram-tokenizer application (t40) — the operator's
    * production purpose: train the unigram LM on the %5≠0 split, apply
    * it to the HELD-OUT %5=0 split with novel characters injected (the
    * t36 held-out discipline). The TOTAL Viterbi ([[graft.plans
    * .UnigramViterbi]] unk floor) covers each out-of-alphabet code
    * point with its own unk piece — one emoji in one document must
    * never kill the job — and `n_unk` reports the unk mass per doc so
    * pipelines gate on unk rate instead. The oracle trains the same
    * EM chain on the train split only, then runs the unk-aware DP over
    * the injected apply-word table. */
  val t40 = q("t40_unigram_crosscorpus",
    s"""WITH RECURSIVE
       |${uniSeedCtes(" WHERE doc_id % 5 <> 0")},
       |${(1 to UniRounds).map(uniEmCtes).mkString(",\n")},
       |$uniXcCtes
       |SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       | CAST(SUM(len(d.word)) AS BIGINT) AS n_chars,
       | CAST(SUM(t.ntok) AS BIGINT) AS n_unigram_tokens,
       | CAST(SUM(u.nunk) AS BIGINT) AS n_unk
       |FROM docw d JOIN wtok t USING (word) JOIN wunk u USING (word)
       |GROUP BY d.doc_id""".stripMargin) { (s, dir) =>
    uniCrossApply(s, dir)
  }

  /** Unk-rate ADMISSION gate report (t43) — what `n_unk` exists FOR:
    * new ingest tokenized under the trusted-corpus vocab (t40's chain)
    * and banded by unk rate — clean (zero unk), admissible (unk ≤ 5%
    * of tokens, integer cross-multiplied: 20·n_unk ≤ n_unigram_tokens),
    * rejected (above). One row per band with doc count, token mass,
    * and unk mass — the numbers an ingest gate alerts on. The oracle
    * extends t40's unrolled chain with the same banding CASE. */
  val t43 = q("t43_unk_gate",
    s"""WITH RECURSIVE
       |${uniSeedCtes(" WHERE doc_id % 5 <> 0")},
       |${(1 to UniRounds).map(uniEmCtes).mkString(",\n")},
       |$uniXcCtes,
       |perdoc AS (SELECT d.doc_id,
       |  CAST(SUM(t.ntok) AS BIGINT) AS n_tok,
       |  CAST(SUM(u.nunk) AS BIGINT) AS n_unk
       | FROM docw d JOIN wtok t USING (word) JOIN wunk u USING (word)
       | GROUP BY d.doc_id)
       |SELECT CASE WHEN n_unk = 0 THEN 'clean'
       |  WHEN 20 * n_unk <= n_tok THEN 'admissible'
       |  ELSE 'rejected' END AS band,
       | CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       | CAST(SUM(n_unk) AS BIGINT) AS total_unk
       |FROM perdoc GROUP BY band""".stripMargin) { (s, dir) =>
    uniCrossApply(s, dir)
      .withColumn("band",
        when(col("n_unk") === 0L, lit("clean"))
          .when(col("n_unk") * 20L <= col("n_unigram_tokens"),
            lit("admissible"))
          .otherwise(lit("rejected")))
      .groupBy("band")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_unigram_tokens")).as("total_tokens"),
        sum(col("n_unk")).as("total_unk"))
  }

  /** Gate → substring-dedup → pack (p12) — the d23 rewrite composed
    * into the packing pipeline: length-gate the corpus, remove
    * repeated substrings (keep-first), pack by the CLEANED token
    * counts (packing by pre-rewrite counts would under-fill every
    * pack exactly where the dedup removed most). The corpus-wide
    * duplicate counting runs over the GATED corpus — the composed
    * semantics, pinned by the oracle running the same chain over the
    * same gated toks. Single documents scan (plan-locked): the gate
    * rides the rewrite's one checkpointed token table. */
  val p12 = q("p12_substring_dedup_pack",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
       |  FROM documents WHERE len(string_split(text, ' ')) >= 40),
       |${substrRemovalCtes("toks")},
       |nclean AS (SELECT tp.doc_id,
       |  CAST(COUNT(*) AS BIGINT) - CAST(COUNT(c.i) AS BIGINT) AS n_clean
       | FROM tokpos23 tp LEFT JOIN cov23 c
       |  ON c.doc_id = tp.doc_id AND c.i = tp.i
       | GROUP BY tp.doc_id),
       |packed AS (SELECT doc_id, doc_id % 4 AS shard, n_clean AS n_tokens,
       |  CAST((SUM(n_clean) OVER (PARTITION BY doc_id % 4 ORDER BY doc_id)
       |   - n_clean) // 2048 AS BIGINT) AS pack_id
       | FROM nclean)
       |SELECT shard, pack_id, COUNT(*) AS n_docs,
       | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |FROM packed GROUP BY shard, pack_id""".stripMargin) { (s, dir) =>
    val gated = Tables.documentsFanned(s, dir)
      .filter(size(TextOps.tokens(col("text"))) >= 40)
    val clean = Dedup.substringDedupRewrite(gated, "doc_id", "text", k = 8)
      .withColumn("n_clean", col("n_tokens") - col("n_removed_tokens"))
    TextAnalysis.packByCount(clean, "doc_id", "n_clean",
        capacity = 2048, shards = 4)
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
  }

  /** Byte-tokenizer-TRUE sequence packing (p13) — completes the
    * learn/apply/pack triple for the third family (p10 = char BPE,
    * p11 = unigram): learn the byte merges (t41), tokenize (t42),
    * pack by the trained BYTE-token counts. The oracle rides t41's
    * unrolled chain — bseg_6 IS the trained segmentation. */
  val p13 = q("p13_bytebpe_pack",
    s"""WITH $byteBpeSeedCte,
       |${(1 to BpeRounds).map(r => bpeRoundCtes(r, "b")).mkString(",\n")},
       |docpre AS (SELECT doc_id, unnest(regexp_extract_all(text,
       |  '${TextAnalysis.BytePreTokenPattern}')) AS word FROM documents),
       |dtok AS (SELECT d.doc_id, CAST(SUM(len(s.syms)) AS BIGINT) AS n_tokens
       | FROM docpre d JOIN bseg_$BpeRounds s ON s.word = d.word
       | GROUP BY d.doc_id),
       |packed AS (SELECT doc_id, doc_id % 4 AS shard, n_tokens,
       |  CAST((SUM(n_tokens) OVER (PARTITION BY doc_id % 4 ORDER BY doc_id)
       |   - n_tokens) // 4096 AS BIGINT) AS pack_id
       | FROM dtok)
       |SELECT shard, pack_id, COUNT(*) AS n_docs,
       | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |FROM packed GROUP BY shard, pack_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val rules = TextAnalysis.byteBpeMerges(docs, "text", rounds = BpeRounds)
      .orderBy("round").select("x", "y").as[(String, String)].collect().toSeq
    TextAnalysis.packByCount(
        TextAnalysis.byteBpeApply(docs, "doc_id", "text", rules),
        "doc_id", "n_byte_tokens", capacity = 4096, shards = 4)
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
  }

  /** Shared oracle chain for the Stupid-Backoff trigram family (t44 /
    * p14 — [[TextAnalysis.trigramBackoffHeldOut]], α = 0.4): train
    * 1/2/3-gram count tables over `trainCte` (a CTE exposing a token
    * list `t`), the eval trigram stream over `evalCte` (exposing
    * `doc_id` and `t`), the four-leg backoff resolution with LEFT
    * joins (so backoff legs actually fire — t36's discipline), and the
    * per-doc rollup `doc_44`. α arithmetic is forced to DOUBLE in SQL
    * (DuckDB parses bare 0.4 as DECIMAL, whose exact 0.16 differs from
    * the IEEE product Spark computes). */
  private def trigramBackoffCtes(trainCte: String, evalCte: String): String =
    s"""c1_44 AS (SELECT w, COUNT(*) AS c1 FROM
       |  (SELECT unnest(t) AS w FROM $trainCte) GROUP BY w),
       |n_44 AS (SELECT CAST(SUM(c1) AS BIGINT) AS n FROM c1_44),
       |c2_44 AS (SELECT b, COUNT(*) AS c2 FROM
       |  (SELECT unnest(list_transform(range(len(t) - 1),
       |     i -> t[i+1] || ' ' || t[i+2])) AS b
       |   FROM $trainCte WHERE len(t) >= 2) GROUP BY b),
       |c3_44 AS (SELECT g, COUNT(*) AS c3 FROM
       |  (SELECT unnest(list_transform(range(len(t) - 2),
       |     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
       |   FROM $trainCte WHERE len(t) >= 3) GROUP BY g),
       |eg_44 AS (SELECT doc_id, g, string_split(g, ' ') AS p FROM
       |  (SELECT doc_id, unnest(list_transform(range(len(t) - 2),
       |     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
       |   FROM $evalCte WHERE len(t) >= 3)),
       |legs_44 AS (SELECT e.doc_id,
       |  CASE WHEN t3.c3 IS NOT NULL THEN 0
       |       WHEN b23.c2 IS NOT NULL THEN 1
       |       WHEN u3.c1 IS NOT NULL THEN 2 ELSE 3 END AS leg,
       |  CASE WHEN t3.c3 IS NOT NULL
       |       THEN round(ln(CAST(t3.c3 AS DOUBLE) / b12.c2), 6)
       |       WHEN b23.c2 IS NOT NULL
       |       THEN round(ln((CAST(0.4 AS DOUBLE) * b23.c2) / u2.c1), 6)
       |       WHEN u3.c1 IS NOT NULL
       |       THEN round(ln(((CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE))
       |         * u3.c1) / n_44.n), 6)
       |       ELSE round(ln((CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE))
       |         / n_44.n), 6) END AS lp
       | FROM eg_44 e
       | LEFT JOIN c3_44 t3 ON t3.g = e.g
       | LEFT JOIN c2_44 b12 ON b12.b = e.p[1] || ' ' || e.p[2]
       | LEFT JOIN c2_44 b23 ON b23.b = e.p[2] || ' ' || e.p[3]
       | LEFT JOIN c1_44 u2 ON u2.w = e.p[2]
       | LEFT JOIN c1_44 u3 ON u3.w = e.p[3]
       | CROSS JOIN n_44),
       |doc_44 AS (SELECT doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       |  CAST(SUM(CASE WHEN leg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri_hits,
       |  CAST(SUM(CASE WHEN leg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi_backoffs,
       |  CAST(SUM(CASE WHEN leg = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni_backoffs,
       |  CAST(SUM(CASE WHEN leg = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  CAST(SUM(CAST(lp AS DECIMAL(30,10))) AS DOUBLE) AS sum_logscore
       | FROM legs_44 GROUP BY doc_id)""".stripMargin

  /** Held-out Stupid-Backoff trigram scoring (t44) — the production
    * upgrade of t36's add-one bigram (CCNet's real filter is a 5-gram
    * KenLM; Stupid Backoff is its deterministic count-ratio cousin):
    * train on the %5≠0 split, score the held-out split's trigrams
    * through the four backoff legs, report per doc the leg-usage
    * profile + exact decimal log-score sum. Eval docs shorter than 3
    * tokens report zeros (totality without pseudo-gram padding). */
  val t44 = q("t44_trigram_backoff",
    s"""WITH tr44 AS (SELECT string_split(text, ' ') AS t FROM documents
       |  WHERE doc_id % 5 <> 0),
       |ev44 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |  WHERE doc_id % 5 = 0),
       |${trigramBackoffCtes("tr44", "ev44")}
       |SELECT d.doc_id,
       | COALESCE(doc_44.n_trigrams, 0) AS n_trigrams,
       | COALESCE(doc_44.n_tri_hits, 0) AS n_tri_hits,
       | COALESCE(doc_44.n_bi_backoffs, 0) AS n_bi_backoffs,
       | COALESCE(doc_44.n_uni_backoffs, 0) AS n_uni_backoffs,
       | COALESCE(doc_44.n_oov, 0) AS n_oov,
       | COALESCE(doc_44.sum_logscore, CAST(0.0 AS DOUBLE)) AS sum_logscore
       |FROM (SELECT doc_id FROM ev44) d
       |LEFT JOIN doc_44 USING (doc_id)""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    TextAnalysis.trigramBackoffHeldOut(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(5)) === 0),
      "doc_id", "text")
  }

  /** Backoff-gated candidate-corpus mix (p14) — the p09 composition
    * with the TRIGRAM scorer selected: the trusted split (%5≠0) trains
    * the Stupid-Backoff LM, the candidate split (%5=0) scores against
    * it, candidates tier by mean log-score within language (p09's
    * cumulative-char-share head/middle/tail rule), the tail drops, and
    * the rollup reports per (lang, tier) doc/char mass PLUS the
    * backoff-leg usage totals a gate owner reads to judge whether the
    * score is trustworthy (a tier resolved mostly at the OOV floor is
    * a domain mismatch, not quality signal). Zero-trigram docs carry
    * no mean and are excluded from tiering by construction. */
  val p14 = q("p14_backoff_gate_mix",
    s"""WITH tr44 AS (SELECT string_split(text, ' ') AS t FROM documents
       |  WHERE doc_id % 5 <> 0),
       |ev44 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |  WHERE doc_id % 5 = 0),
       |${trigramBackoffCtes("tr44", "ev44")},
       |r14 AS (SELECT d.doc_id, d.lang,
       |  CAST(length(d.text) AS BIGINT) AS n_chars,
       |  s.n_tri_hits, s.n_bi_backoffs, s.n_uni_backoffs, s.n_oov,
       |  s.sum_logscore / s.n_trigrams AS als
       | FROM documents d JOIN doc_44 s ON s.doc_id = d.doc_id
       | WHERE s.n_trigrams >= 1),
       |c14 AS (SELECT *,
       |  SUM(n_chars) OVER (PARTITION BY lang ORDER BY als DESC, doc_id
       |    ROWS UNBOUNDED PRECEDING) AS cum,
       |  SUM(n_chars) OVER (PARTITION BY lang) AS tot FROM r14),
       |tiered14 AS (SELECT *,
       |  CASE WHEN cum * 3 <= tot THEN 'head'
       |       WHEN cum * 3 <= tot * 2 THEN 'middle'
       |       ELSE 'tail' END AS tier FROM c14)
       |SELECT lang, tier, CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       | CAST(SUM(n_tri_hits) AS BIGINT) AS n_tri_hits,
       | CAST(SUM(n_bi_backoffs) AS BIGINT) AS n_bi_backoffs,
       | CAST(SUM(n_uni_backoffs) AS BIGINT) AS n_uni_backoffs,
       | CAST(SUM(n_oov) AS BIGINT) AS n_oov,
       | MIN(doc_id) AS min_doc
       |FROM tiered14 WHERE tier <> 'tail'
       |GROUP BY lang, tier""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val scored = TextAnalysis.trigramBackoffHeldOut(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(5)) === 0),
      "doc_id", "text")
      .filter(col("n_trigrams") >= 1)
    val r = scored.join(docs.select(col("doc_id"), col("lang"),
      length(col("text")).cast("long").as("n_chars")), Seq("doc_id"))
      .withColumn("als", col("sum_logscore") / col("n_trigrams"))
    val w = Window.partitionBy("lang").orderBy(col("als").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("lang")
    r.withColumn("cum", sum("n_chars").over(w))
      .withColumn("tot", sum("n_chars").over(tot))
      .withColumn("tier",
        when(col("cum") * 3 <= col("tot"), lit("head"))
          .when(col("cum") * 3 <= col("tot") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .filter(col("tier") =!= "tail")
      .groupBy("lang", "tier")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"),
        sum("n_tri_hits").as("n_tri_hits"),
        sum("n_bi_backoffs").as("n_bi_backoffs"),
        sum("n_uni_backoffs").as("n_uni_backoffs"),
        sum("n_oov").as("n_oov"),
        min("doc_id").as("min_doc"))
  }

  // ---- in-engine logistic-regression family (t45/t46/p15) ----------

  private val LrBuckets = 4096
  private val LrRounds = 4

  /** Feature/meta CTEs for the hashed-n-gram logistic family over
    * `docsCte` (doc_id, lang, text): t20's exact feature map (unigrams
    * + bigrams, md5-13-hex bucket hash mod [[LrBuckets]] — the SAME
    * 4096-bucket space as the t20 teacher, so the learned model can
    * represent the teacher exactly) plus the reserved bias bucket
    * (id = 4096) every doc carries once. Label y = the t20 TEACHER
    * GATE (fixed-hash score > 0) — the in-engine distillation target:
    * this synthetic corpus draws every language from one shared
    * vocabulary, so `lang` is textually unlearnable, while the teacher
    * gate is a real linear function of exactly these features. `pfx`
    * distinguishes train/eval streams. */
  private def lrFeatCtes(docsCte: String, pfx: String): String =
    s"""${pfx}f45 AS MATERIALIZED (SELECT doc_id,
       |  CAST(concat('0x', substr(md5(f), 1, 13)) AS BIGINT) % $LrBuckets AS bucket
       | FROM (SELECT doc_id, unnest(list_concat(toks,
       |    CASE WHEN len(toks) < 2 THEN []
       |     ELSE list_transform(range(1, len(toks)),
       |       i -> toks[i] || ' ' || toks[i + 1]) END)) AS f
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $docsCte))
       | UNION ALL SELECT doc_id, CAST($LrBuckets AS BIGINT) AS bucket
       |  FROM $docsCte),
       |${pfx}y45 AS (SELECT doc_id,
       |  SUM(CAST(concat('0x', substr(md5(CAST(bucket AS VARCHAR)), 1, 13))
       |    AS BIGINT) % 2001 - 1000) AS ts
       | FROM ${pfx}f45 WHERE bucket < $LrBuckets GROUP BY doc_id),
       |${pfx}m45 AS MATERIALIZED (SELECT d.doc_id,
       |  CAST(CASE WHEN t.ts > 0 THEN 1 ELSE 0 END AS BIGINT) AS y,
       |  CAST((CASE WHEN len(string_split(d.text, ' ')) < 2
       |   THEN len(string_split(d.text, ' '))
       |   ELSE len(string_split(d.text, ' ')) * 2 - 1 END) + 1 AS BIGINT)
       |    AS n_feats
       | FROM $docsCte d JOIN ${pfx}y45 t USING (doc_id))""".stripMargin

  /** One unrolled gradient-descent round (the t30 discipline): score
    * sum per doc (exact decimal over the prior round's weights), 6dp
    * logistic link, per-bucket decimal gradient, 6dp weight update
    * with lr = 1024 (full-batch mean class-balanced gradients are tiny). w45_0 is the empty table (all weights 0). */
  private def lrRoundCtes(r: Int): String =
    s"""s45_$r AS (SELECT f.doc_id,
       |  CAST(SUM(CAST(COALESCE(w.w, CAST(0.0 AS DOUBLE)) AS DECIMAL(30,10)))
       |    AS DOUBLE) AS sw
       | FROM trf45 f LEFT JOIN w45_${r - 1} w USING (bucket)
       | GROUP BY f.doc_id),
       |e45_$r AS (SELECT m.doc_id,
       |  (round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
       |    + exp(-(s.sw / m.n_feats))), 6) - m.y)
       |   * (CASE WHEN m.y = 1
       |      THEN CAST(nd45.nd AS DOUBLE) / (CAST(2.0 AS DOUBLE) * nd45.np)
       |      ELSE CAST(nd45.nd AS DOUBLE) / (CAST(2.0 AS DOUBLE) * nd45.nn)
       |      END) AS err,
       |  m.n_feats
       | FROM trm45 m JOIN s45_$r s USING (doc_id) CROSS JOIN nd45),
       |g45_$r AS (SELECT f.bucket,
       |  CAST(SUM(CAST(round(e.err / e.n_feats, 6) AS DECIMAL(30,10)))
       |    AS DOUBLE) AS g
       | FROM trf45 f JOIN e45_$r e USING (doc_id) GROUP BY f.bucket),
       |w45_$r AS MATERIALIZED (SELECT g.bucket,
       |  round(COALESCE(w.w, CAST(0.0 AS DOUBLE))
       |    - (CAST(1024.0 AS DOUBLE) * g.g) / nd45.nd, 6) AS w
       | FROM g45_$r g LEFT JOIN w45_${r - 1} w USING (bucket)
       | CROSS JOIN nd45)""".stripMargin

  private def lrTrainChain(trainCte: String): String =
    s"""${lrFeatCtes(trainCte, "tr")},
       |nd45 AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
       |  CAST(SUM(y) AS BIGINT) AS np,
       |  CAST(COUNT(*) - SUM(y) AS BIGINT) AS nn FROM trm45),
       |w45_0 AS (SELECT CAST(NULL AS BIGINT) AS bucket,
       |  CAST(NULL AS DOUBLE) AS w WHERE 1 = 0),
       |${(1 to LrRounds).map(lrRoundCtes).mkString(",\n")}""".stripMargin

  /** In-engine logistic-regression TRAINING (t45): learn the hashed
    * n-gram quality classifier's weights — 4 full-batch class-balanced GD
    * rounds over
    * t20's feature space, label = the t20 teacher gate (the in-engine
    * distillation target — see lrFeatCtes), every round boundary
    * 6dp-rounded and decimal-summed so the unrolled oracle replays the
    * exact trajectory. Output: per observed bucket, occurrence count
    * and learned weight. */
  val t45 = q("t45_logistic_train",
    s"""WITH ${lrTrainChain("documents")}
       |SELECT w.bucket, c.n_occ, w.w
       |FROM w45_$LrRounds w
       |JOIN (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_occ
       |  FROM trf45 GROUP BY bucket) c USING (bucket)""".stripMargin) { (s, dir) =>
    TextAnalysis.logisticTrainReport(Tables.documentsFanned(s, dir), "doc_id",
      "text", graft.plans.TextHash.classifierScore(TextOps.tokens(col("text"))) > 0L,
      nBuckets = LrBuckets, rounds = LrRounds)
  }

  /** Held-out application of the trained classifier (t46): weights
    * learn on the %5≠0 split, the %5=0 split scores under them — per
    * doc the exact decimal weight sum, the sign gate `pred`, and the
    * label comparison (the generalization read: pred vs the teacher
    * gate on docs the learner never saw). */
  val t46 = q("t46_logistic_apply",
    s"""WITH tr45 AS (SELECT doc_id, lang, text FROM documents
       |  WHERE doc_id % 5 <> 0),
       |ev45 AS (SELECT doc_id, lang, text FROM documents
       |  WHERE doc_id % 5 = 0),
       |${lrTrainChain("tr45")},
       |${lrFeatCtes("ev45", "ev")},
       |esc45 AS (SELECT f.doc_id,
       |  CAST(SUM(CAST(COALESCE(w.w, CAST(0.0 AS DOUBLE)) AS DECIMAL(30,10)))
       |    AS DOUBLE) AS sum_w
       | FROM evf45 f LEFT JOIN w45_$LrRounds w USING (bucket)
       | GROUP BY f.doc_id)
       |SELECT m.doc_id, m.n_feats, s.sum_w, m.y,
       | s.sum_w > CAST(0.0 AS DOUBLE) AS pred,
       | (s.sum_w > CAST(0.0 AS DOUBLE)) = (m.y = 1) AS correct
       |FROM evm45 m JOIN esc45 s USING (doc_id)""".stripMargin) { (s, dir) =>
    val docs = Tables.documentsFanned(s, dir)
    val model = TextAnalysis.logisticTrain(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "doc_id", "text",
      graft.plans.TextHash.classifierScore(TextOps.tokens(col("text"))) > 0L,
      nBuckets = LrBuckets, rounds = LrRounds)
    TextAnalysis.logisticApply(
      docs.filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text",
      graft.plans.TextHash.classifierScore(TextOps.tokens(col("text"))) > 0L, model)
  }

  /** The p15/p16 oracle: full training trajectory + gate/dedup/shard
    * tail in one statement. IDENTICAL for both queries by design —
    * p15 trains per invocation (the oracle-replayable twin), p16
    * scores from the PERSISTED model; same weights either way, so the
    * same expected output proves the persisted path faithful. */
  private def trainedShardsSql: String =
    s"""WITH tr45 AS (SELECT doc_id, lang, text FROM documents
       |  WHERE doc_id % 5 <> 0),
       |${lrTrainChain("tr45")},
       |${lrFeatCtes("documents", "all")},
       |asc45 AS (SELECT f.doc_id,
       |  SUM(CAST(COALESCE(w.w, CAST(0.0 AS DOUBLE)) AS DECIMAL(30,10))) AS swd
       | FROM allf45 f LEFT JOIN w45_$LrRounds w USING (bucket)
       | GROUP BY f.doc_id),
       |fp45 AS (SELECT doc_id, md5($normSql) AS fp FROM documents),
       |kept45 AS (SELECT a.doc_id, a.swd, p.fp
       | FROM asc45 a JOIN fp45 p USING (doc_id)
       | WHERE a.swd > 0),
       |k145 AS (SELECT doc_id, swd FROM (
       | SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
       | FROM kept45) WHERE rn = 1),
       |sh45 AS (SELECT doc_id, swd,
       |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
       |    AS BIGINT) % 8 AS shard
       | FROM k145)
       |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(SUM(swd) AS DOUBLE) AS sum_score, MIN(doc_id) AS min_doc
       |FROM sh45 GROUP BY shard""".stripMargin

  /** The gate/dedup/shard tail shared by p15 (freshly trained model)
    * and p16 (persisted model): gate the WHOLE corpus on the trained
    * sign, survivors exact-dedup keep-first (d02's rule) and
    * shard-assign; the rollup carries the exact decimal score mass per
    * shard (sum-of-sums stays exact; the one double cast happens at
    * the output edge). */
  private def trainedGateShards(docs: DataFrame,
                                model: TextAnalysis.LogisticModel): DataFrame = {
    val scored = TextAnalysis.logisticScoreDecimal(docs, "doc_id", "text",
      model)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy("doc_id")
    scored
      .join(docs.select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp")), Seq("doc_id"))
      .filter(col("swd") > 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("swd"),
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 13),
          16, 10).cast("long"), lit(8L)).as("shard"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("swd")).cast("double").as("sum_score"),
        min(col("doc_id")).as("min_doc"))
  }

  /** Trained-classifier corpus build (p15) — p03's composition with
    * the TRAINED gate: weights learn on the trusted %5≠0 split
    * in-engine (t45's learner), the WHOLE corpus gates on the trained
    * sign (pred), survivors exact-dedup keep-first (d02's rule) and
    * shard-assign. The oracle replays the full training trajectory AND
    * the gate/dedup/shard tail in one statement. */
  val p15 = q("p15_trained_gate_shards", trainedShardsSql) { (s, dir) =>
    val docs = Tables.documentsFanned(s, dir)
    val model = TextAnalysis.logisticTrain(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "doc_id", "text",
      graft.plans.TextHash.classifierScore(TextOps.tokens(col("text"))) > 0L,
      nBuckets = LrBuckets, rounds = LrRounds)
    trainedGateShards(docs, model)
  }

  /** PERSISTED-model corpus build (p16) — p15's exact semantics
    * through the PRODUCTION scoring path: the model comes from
    * [[ensureCorpusModel]] (warehouse-persisted, fingerprint-guarded,
    * built once in Bench prepare / on first use), so the timed query
    * is ONE broadcast-weight scoring pass + the gate/dedup/shard tail
    * — no training in the loop. Same oracle as p15: identical output
    * proves the persisted path faithful to the in-memory trainer. */
  val p16 = q("p16_persisted_gate_shards", trainedShardsSql) { (s, dir) =>
    trainedGateShards(Tables.documentsFanned(s, dir), ensureCorpusModel(s, dir))
  }

  /** Learning-curve diagnostic (t49): held-out confusion counts after
    * EVERY training round (0 = untrained all-zero weights, the
    * base-rate floor; LrRounds = t46's committed point) — the
    * convergence evidence behind TESTDATA's "4 rounds is the committed
    * point" claim, now oracle-checked: one trajectory train (same cost
    * as t45 — the per-round snapshots are the weight tables the loop
    * already holds), then one scoring pass per round over the %5=0
    * split. The oracle scores the SAME w45_r tables its training chain
    * already materializes. */
  val t49 = q("t49_learning_curve",
    s"""WITH tr45 AS (SELECT doc_id, lang, text FROM documents
       |  WHERE doc_id % 5 <> 0),
       |ev45 AS (SELECT doc_id, lang, text FROM documents
       |  WHERE doc_id % 5 = 0),
       |${lrTrainChain("tr45")},
       |${lrFeatCtes("ev45", "ev")},
       |${(0 to LrRounds).map(r =>
        s"""acc49_$r AS (SELECT CAST($r AS BIGINT) AS round,
           |  CAST(SUM(CASE WHEN s.swd > CAST(0.0 AS DOUBLE) AND m.y = 1
           |    THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |  CAST(SUM(CASE WHEN s.swd > CAST(0.0 AS DOUBLE) AND m.y = 0
           |    THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |  CAST(SUM(CASE WHEN NOT s.swd > CAST(0.0 AS DOUBLE) AND m.y = 0
           |    THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           |  CAST(SUM(CASE WHEN NOT s.swd > CAST(0.0 AS DOUBLE) AND m.y = 1
           |    THEN 1 ELSE 0 END) AS BIGINT) AS fn
           | FROM evm45 m JOIN (SELECT f.doc_id,
           |    CAST(SUM(CAST(COALESCE(w.w, CAST(0.0 AS DOUBLE))
           |      AS DECIMAL(30,10))) AS DOUBLE) AS swd
           |   FROM evf45 f LEFT JOIN w45_$r w USING (bucket)
           |   GROUP BY f.doc_id) s USING (doc_id))""".stripMargin)
        .mkString(",\n")}
       |${(0 to LrRounds).map(r => s"SELECT * FROM acc49_$r")
        .mkString("\nUNION ALL\n")}""".stripMargin) { (s, dir) =>
    val docs = Tables.documentsFanned(s, dir)
    val teacher =
      graft.plans.TextHash.classifierScore(TextOps.tokens(col("text"))) > 0L
    val traj = TextAnalysis.logisticTrainTrajectory(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "doc_id", "text",
      teacher, nBuckets = LrBuckets, rounds = LrRounds)
    val evalDocs = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    // ONE materialized eval feature stream scores all 5 trajectory
    // snapshots (r18: logisticApply per round re-tokenized the split
    // 5×; the stream is checkpointed pre-partitioned on doc_id so each
    // round's scoring aggregation runs exchange-free)
    val (evalMeta, evalFeats) = TextAnalysis.logisticFrames(evalDocs,
      "doc_id", "text", teacher, LrBuckets, materialize = true)
    val round0 = TextAnalysis.LogisticModel(Map.empty, LrBuckets,
      traj.head.nDocs, 0, traj.head.lr)
    (round0 +: traj).map { m =>
      TextAnalysis.logisticApplyFrames(evalMeta, evalFeats, m)
        .agg(
          count(when(col("pred") && col("y") === 1L, 1)).as("tp"),
          count(when(col("pred") && col("y") === 0L, 1)).as("fp"),
          count(when(!col("pred") && col("y") === 0L, 1)).as("tn"),
          count(when(!col("pred") && col("y") === 1L, 1)).as("fn"))
        .select(lit(m.rounds.toLong).as("round"),
          col("tp"), col("fp"), col("tn"), col("fn"))
    }.reduce(_ unionAll _)
  }

  /** The t48 mean-score cutoffs: exact 6dp decimals spanning the
    * observed held-out operating region (5%-quantile mean score ≈
    * −0.01, 95% ≈ 1.07 at the driver SFs) — low cutoffs show the
    * recall-heavy end, high ones the precision-heavy end. */
  private val CalibCutoffs = Seq(
    "-0.5", "-0.25", "0.0", "0.25", "0.5", "0.75", "1.0")

  /** Classifier calibration sweep (t48): the d18 discipline applied to
    * the TRAINED score — per mean-score cutoff over the held-out %5=0
    * split, integer confusion counts (TP/FP/TN/FN) of the gate
    * `swd > c·n_feats`, every cutoff answered from ONE scored pass
    * (broadcast cutoff grid, no per-cutoff rescan — plan-locked). The
    * pick-a-threshold evidence a gate owner reads before a p15-style
    * corpus build; precision/recall derive exactly from the integers. */
  val t48 = q("t48_calibration_sweep",
    s"""WITH tr45 AS (SELECT doc_id, lang, text FROM documents
       |  WHERE doc_id % 5 <> 0),
       |ev45 AS (SELECT doc_id, lang, text FROM documents
       |  WHERE doc_id % 5 = 0),
       |${lrTrainChain("tr45")},
       |${lrFeatCtes("ev45", "ev")},
       |escd48 AS (SELECT f.doc_id,
       |  SUM(CAST(COALESCE(w.w, CAST(0.0 AS DOUBLE)) AS DECIMAL(30,10)))
       |    AS swd
       | FROM evf45 f LEFT JOIN w45_$LrRounds w USING (bucket)
       | GROUP BY f.doc_id),
       |sc48 AS (SELECT m.doc_id, m.n_feats, m.y, s.swd
       | FROM evm45 m JOIN escd48 s USING (doc_id)),
       |cut48 AS (SELECT CAST(c AS DECIMAL(8,6)) AS cutoff
       | FROM (VALUES ${CalibCutoffs.map(c => s"('$c')").mkString(", ")})
       |   v(c))
       |SELECT CAST(cutoff AS DOUBLE) AS cutoff,
       | CAST(SUM(CASE WHEN swd > cutoff * n_feats AND y = 1
       |   THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       | CAST(SUM(CASE WHEN swd > cutoff * n_feats AND y = 0
       |   THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       | CAST(SUM(CASE WHEN NOT swd > cutoff * n_feats AND y = 0
       |   THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       | CAST(SUM(CASE WHEN NOT swd > cutoff * n_feats AND y = 1
       |   THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |FROM sc48 CROSS JOIN cut48 GROUP BY cutoff""".stripMargin) { (s, dir) =>
    val docs = Tables.documentsFanned(s, dir)
    val model = TextAnalysis.logisticTrain(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "doc_id", "text",
      graft.plans.TextHash.classifierScore(TextOps.tokens(col("text"))) > 0L,
      nBuckets = LrBuckets, rounds = LrRounds)
    val eval = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    // ONE materialized eval feature stream feeds BOTH the meta
    // (n_feats, y) side and the decimal score side (r18: previously
    // three separate tokenize passes over the eval split — meta's own
    // select, plus the score's unmaterialized frames); the join is
    // colocated on the checkpointed doc_id partitioning
    val (meta, feats) = TextAnalysis.logisticFrames(eval, "doc_id", "text",
      graft.plans.TextHash.classifierScore(TextOps.tokens(col("text"))) > 0L,
      LrBuckets, materialize = true)
    val scored = meta.select("doc_id", "n_feats", "y").join(
      TextAnalysis.logisticScoreDecimalFrames(feats, model), Seq("doc_id"))
    TextAnalysis.calibrationSweep(scored, CalibCutoffs)
  }

  /** Gopher intra-doc repetition profile (t47 — Rae et al. 2021 §A1.1
    * Table A1, the n-gram repetition rules t02/gopherRules' token
    * arithmetic can't express): per doc the top bigram (deterministic
    * tie), its occurrence count + multiplicative char mass, the
    * ONCE-counted char coverage of duplicated 5-grams (d11 span-merge
    * + d23 boundary-walk semantics), and the integer-cross-multiplied
    * gate at Gopher's 0.20 / 0.15 thresholds. */
  val t47 = q("t47_repetition_profile",
    """WITH tk47 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |st47 AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
      |  CAST(length(array_to_string(t, '')) AS BIGINT) AS n_chars FROM tk47),
      |bg47 AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS n FROM (
      |  SELECT doc_id, unnest(list_transform(range(len(t) - 1),
      |    i -> t[i+1] || ' ' || t[i+2])) AS g
      |  FROM tk47 WHERE len(t) >= 2) GROUP BY 1, 2),
      |top47 AS (SELECT doc_id, g AS top_gram, n AS top_count,
      |  CAST(n * (length(g) - 1) AS BIGINT) AS top_chars FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY n DESC, g) AS rn FROM bg47) WHERE rn = 1),
      |p47 AS (SELECT doc_id, CAST(unnest(range(len(t) - 4)) AS BIGINT) AS pos,
      |  unnest(list_transform(range(len(t) - 4), i ->
      |    t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
      |      || ' ' || t[i+5])) AS g
      | FROM tk47 WHERE len(t) >= 5),
      |d47 AS (SELECT doc_id, pos FROM (SELECT doc_id, pos,
      |  COUNT(*) OVER (PARTITION BY doc_id, g) AS c FROM p47) WHERE c >= 2),
      |f47 AS (SELECT doc_id, pos,
      |  CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 5
      |   THEN 1 ELSE 0 END AS brk
      | FROM d47 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |s47a AS (SELECT doc_id, pos,
      |  SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id FROM f47),
      |s47 AS (SELECT doc_id, MIN(pos) AS p0, MAX(pos) + 4 AS p1
      | FROM s47a GROUP BY doc_id, span_id),
      |tp47 AS (SELECT doc_id, CAST(unnest(range(len(t))) AS BIGINT) AS i,
      |  unnest(t) AS tok FROM tk47),
      |cv47 AS (SELECT DISTINCT tp.doc_id, tp.i FROM tp47 tp
      | JOIN s47 s ON s.doc_id = tp.doc_id AND tp.i BETWEEN s.p0 AND s.p1),
      |cov47 AS (SELECT tp.doc_id,
      |  CAST(COUNT(c.i) AS BIGINT) AS dup_tokens,
      |  CAST(COALESCE(SUM(CASE WHEN c.i IS NOT NULL THEN len(tp.tok) END), 0)
      |    AS BIGINT) AS dup_chars
      | FROM tp47 tp LEFT JOIN cv47 c ON c.doc_id = tp.doc_id AND c.i = tp.i
      | GROUP BY tp.doc_id)
      |SELECT st.doc_id, st.n_tokens, st.n_chars,
      | COALESCE(t.top_gram, '') AS top_gram,
      | CAST(COALESCE(t.top_count, 0) AS BIGINT) AS top_count,
      | CAST(COALESCE(t.top_chars, 0) AS BIGINT) AS top_chars,
      | CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
      | CAST(COALESCE(c.dup_chars, 0) AS BIGINT) AS dup_chars,
      | (COALESCE(t.top_chars, 0) * 5 <= st.n_chars
      |  AND COALESCE(c.dup_chars, 0) * 20 <= st.n_chars * 3) AS rep_ok
      |FROM st47 st LEFT JOIN top47 t USING (doc_id)
      |LEFT JOIN cov47 c USING (doc_id)""".stripMargin) { (s, dir) =>
    TextAnalysis.repetitionProfile(Tables.documents(s, dir), "doc_id", "text")
  }

  val all: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q24, q25, q26, q27, q28, q29, q30, q31,
    q32, q33, q34, q35, q36, q37, q38, q39, q40, q41, q42, q43,
    q44, q45, q46, q47, q48, q49, q50, q51, q52, q53, q54, q55, q56, q57, q58, q59, q60,
    q61, q62, q63, q64, q65, q66, q67, q68, q69, q70, q71, q72, q73, q74,
    q75, q76, q77, q78, q79, q80, q81, q82, q83, q84, q85, q86, q87,
    d01, d02, d03, d04, d05, d06, d07, d08, d09, d10, d11, d12, d13, d14, d15, d16, d17, d18, d19, d20, d21, d22, d23, d24,
    t01, t02, t03, t04, t05, t06, t07, t08, t09, t10, t11, t12, t13, t14,
    t15, t16, t17, t18, t19, t20, t21, t22, t23, t24, t25, t26, t27, t28, t29, t30, t31, t32, t33, t34, t35, t36, t37, t38, t39, t40, t41, t42, t43, t44, t45, t46, t47, t48, t49,
    s01, s02, s03, s04, s05, s06, s07, s08, s09, s10, s11, s12, s13, s14, s15, s16, s17, s18, s19, s20, s21, s22, s23, s24, s25, s26,
    m01, m02, m03, p01, p02, p03, p04, p05, p06, p07, p08, p09, p10, p11, p12, p13, p14, p15, p16)
}
