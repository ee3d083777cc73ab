package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, Relational, Skew}

class AsOfSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("asOf attaches latest right row at or before left ts, per key") {
    val trades = Seq(
      ("A", ts(50), 1L), ("A", ts(150), 2L), ("A", ts(250), 3L),
      ("B", ts(100), 4L)
    ).toDF("sym", "t", "trade_id")
    val quotes = Seq(
      ("A", ts(100), 10.0), ("A", ts(200), 20.0), ("B", ts(100), 5.0)
    ).toDF("sym", "t", "px")
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "t",
        Map("px" -> "quote_px"))
      .select("trade_id", "quote_px")
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L).isEmpty)          // no quote yet at t=50
    assert(got(2L).contains(10.0))   // latest quote <= 150 is t=100
    assert(got(3L).contains(20.0))   // latest quote <= 250 is t=200
    assert(got(4L).contains(5.0))    // equal timestamps match (inclusive)
  }

  test("asOfNative matches the composed form and plans the custom exec") {
    val trades = Seq(
      ("A", ts(50), 1L), ("A", ts(150), 2L), ("A", ts(250), 3L),
      ("B", ts(100), 4L), ("C", ts(10), 5L)
    ).toDF("sym", "t", "trade_id")
    val quotes = Seq(
      ("A", ts(100), 10.0), ("A", ts(200), 20.0), ("B", ts(100), 5.0),
      ("D", ts(1), 99.0)
    ).toDF("sym", "t", "px")
    val native = AsOfJoin.asOfNative(trades, quotes, Seq("sym"), "t", "t",
        Map("px" -> "quote_px"))
      .select("trade_id", "quote_px")
    val composed = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "t",
        Map("px" -> "quote_px"))
      .select("trade_id", "quote_px")
    assert(native.as[(Long, Option[Double])].collect().toSet ==
      composed.as[(Long, Option[Double])].collect().toSet)
    // AQE wraps the plan (AdaptiveSparkPlanExec hides its inner plan
    // from collect), so assert on the rendered tree
    assert(native.queryExecution.executedPlan.treeString.contains("AsOfJoin"),
      "expected AsOfJoinExec in the physical plan")
  }

  test("asOfBroadcast matches the composed form and never shuffles the left side") {
    val rnd = new scala.util.Random(23)
    val base = 1735732800000L
    // unique (key, ts) on the quote side: all as-of forms agree
    val trades = Seq.tabulate(300)(i =>
      (i.toLong, s"u${rnd.nextInt(6)}", ts(base + rnd.nextInt(7200) * 1000L)))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq.tabulate(80)(i =>
      (i.toLong * 7, s"u${rnd.nextInt(8)}", ts(base + i * 90 * 1000L), rnd.nextDouble()))
      .toDF("qid", "sym", "t", "px")
    val bcast = AsOfJoin.asOfBroadcast(trades, quotes, Seq("sym"), "t", "t",
        Map("qid" -> "qid", "px" -> "px"))
      .select("trade_id", "qid", "px")
    val composed = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "t",
        Map("qid" -> "qid", "px" -> "px"))
      .select("trade_id", "qid", "px")
    assert(bcast.as[(Long, Option[Long], Option[Double])].collect().toSet ==
      composed.as[(Long, Option[Long], Option[Double])].collect().toSet)
    val p = bcast.queryExecution.executedPlan.treeString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), "left side must not be shuffle-joined")
  }

  test("asOfBroadcast excludes NULL keys and NULL timestamps") {
    val trades = Seq(
      (Some("A"), Some(ts(150)), 1L),
      (None: Option[String], Some(ts(150)), 2L),
      (Some("A"), None: Option[Timestamp], 3L)
    ).toDF("sym", "t", "trade_id")
    val quotes = Seq(
      (Some("A"), Some(ts(100)), 10.0),
      (None: Option[String], Some(ts(50)), 66.0),
      (Some("A"), None: Option[Timestamp], 77.0)
    ).toDF("sym", "t", "px")
    val got = AsOfJoin.asOfBroadcast(trades, quotes, Seq("sym"), "t", "t",
        Map("px" -> "quote_px"))
      .select("trade_id", "quote_px")
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(10.0), 2L -> None, 3L -> None))
  }

  test("asOf and asOfNative exclude NULL keys and NULL timestamps") {
    // SQL semantics: `r.key = l.key AND r.ts <= l.ts` is never TRUE when
    // any operand is NULL — NULL-key/NULL-ts right rows match nothing,
    // NULL-key/NULL-ts left rows surface with NULL carried columns.
    val trades = Seq(
      (Some("A"), Some(ts(150)), 1L),   // normal: matches quote at 100
      (None: Option[String], Some(ts(150)), 2L), // NULL key → no match
      (Some("A"), None: Option[Timestamp], 3L),  // NULL ts → no match
      (Some("N"), Some(ts(150)), 4L)    // key only present with NULLs on right
    ).toDF("sym", "t", "trade_id")
    val quotes = Seq(
      (Some("A"), Some(ts(100)), 10.0),
      (None: Option[String], Some(ts(50)), 66.0),  // NULL key: unmatchable
      (Some("N"), None: Option[Timestamp], 77.0)   // NULL ts: unmatchable
    ).toDF("sym", "t", "px")
    val expected = Map(1L -> Some(10.0), 2L -> None, 3L -> None, 4L -> None)
    val composed = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "t",
        Map("px" -> "quote_px"))
      .select("trade_id", "quote_px")
      .as[(Long, Option[Double])].collect().toMap
    assert(composed == expected)
    val native = AsOfJoin.asOfNative(trades, quotes, Seq("sym"), "t", "t",
        Map("px" -> "quote_px"))
      .select("trade_id", "quote_px")
      .as[(Long, Option[Double])].collect().toMap
    assert(native == expected)
  }

  test("rangeJoin equals the naive theta join") {
    val rnd = new scala.util.Random(5)
    val base = 1735732800000L
    val events = Seq.tabulate(300)(i =>
      (i.toLong, s"u${rnd.nextInt(5)}", ts(base + rnd.nextInt(3600) * 1000L)))
      .toDF("event_id", "user", "t")
    val intervals = Seq.tabulate(40)(i =>
      { val s0 = base + rnd.nextInt(3600) * 1000L
        (i.toLong + 1000, s"u${rnd.nextInt(5)}", ts(s0), ts(s0 + 330000)) })
      .toDF("interval_id", "user", "start_ts", "end_ts")
    val fast = Relational.rangeJoin(events, intervals, Seq("user"),
        "t", "start_ts", "end_ts")
      .select("event_id", "interval_id").as[(Long, Long)].collect().toSet
    val naive = events.join(intervals, Seq("user"))
      .filter(col("t") >= col("start_ts") && col("t") < col("end_ts"))
      .select("event_id", "interval_id").as[(Long, Long)].collect().toSet
    assert(fast == naive && naive.nonEmpty)
  }

  test("rangeJoinNative equals the naive theta join and plans the custom exec") {
    val rnd = new scala.util.Random(11)
    val base = 1735732800000L
    val events = Seq.tabulate(400)(i =>
      (i.toLong, s"u${rnd.nextInt(4)}", ts(base + rnd.nextInt(3600) * 1000L)))
      .toDF("event_id", "user", "t")
    // overlapping, variable-length intervals (some nested inside others)
    // — exercises the active-buffer eviction that the sorted start
    // order alone would get wrong
    val intervals = Seq.tabulate(60)(i =>
      { val s0 = base + rnd.nextInt(3600) * 1000L
        (i.toLong + 1000, s"u${rnd.nextInt(4)}", ts(s0),
          ts(s0 + (30 + rnd.nextInt(1200)) * 1000L)) })
      .toDF("interval_id", "user", "start_ts", "end_ts")
    val native = Relational.rangeJoinNative(events, intervals, Seq("user"),
        "t", "start_ts", "end_ts", Map("interval_id" -> "interval_id"))
    val got = native.select("event_id", "interval_id")
      .as[(Long, Long)].collect().toList
    val naive = events.join(intervals, Seq("user"))
      .filter(col("t") >= col("start_ts") && col("t") < col("end_ts"))
      .select("event_id", "interval_id").as[(Long, Long)].collect().toList
    // multiset compare: an event inside two intervals must appear twice
    assert(got.sorted == naive.sorted && naive.nonEmpty)
    assert(native.queryExecution.executedPlan.treeString.contains("IntervalJoin"),
      "expected IntervalJoinExec in the physical plan")
  }

  test("native joins reject mismatched key types at plan build") {
    // INT vs BIGINT keys would hash-partition the two sides differently
    // and compare through the wrong slot width — must fail loudly, not
    // silently join nothing
    val l = Seq((1, ts(100), 1L)).toDF("k", "t", "id")       // k: INT
    val r = Seq((1L, ts(50), 9.0)).toDF("k", "t", "px")      // k: BIGINT
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(l, r, Seq("k"), "t", "t", Map("px" -> "px"))
    }
    assert(e1.getMessage.contains("key types must match"))
    val r2 = Seq((1L, ts(50), ts(150), 9L)).toDF("k", "s", "e", "iid")
    val e2 = intercept[IllegalArgumentException] {
      Relational.rangeJoinNative(l, r2, Seq("k"), "t", "s", "e",
        Map("iid" -> "iid"))
    }
    assert(e2.getMessage.contains("key types must match"))
  }

  test("rangeJoinNative excludes NULL keys and NULL bounds") {
    val events = Seq(
      (1L, Some("A"), Some(ts(100))),
      (2L, None: Option[String], Some(ts(100))),  // NULL key → no match
      (3L, Some("A"), None: Option[Timestamp])    // NULL ts → no match
    ).toDF("event_id", "user", "t")
    val intervals = Seq(
      (10L, Some("A"), Some(ts(50)), Some(ts(150))),
      (11L, None: Option[String], Some(ts(0)), Some(ts(1000))), // NULL key
      (12L, Some("A"), None: Option[Timestamp], Some(ts(1000))), // NULL start
      (13L, Some("A"), Some(ts(0)), None: Option[Timestamp])     // NULL end
    ).toDF("interval_id", "user", "start_ts", "end_ts")
    val got = Relational.rangeJoinNative(events, intervals, Seq("user"),
        "t", "start_ts", "end_ts", Map("interval_id" -> "interval_id"))
      .select("event_id", "interval_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("saltedAgg equals plain aggregation") {
    val df = Seq.tabulate(1000)(i => ("hot", i.toDouble)) ++
      Seq.tabulate(10)(i => (s"k$i", i.toDouble))
    val data = df.toDF("k", "v")
    val plain = data.groupBy("k").agg(
        sum("v").as("s"), count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
      .as[(String, Double, Long, Double, Double)].collect().toSet
    val salted = Skew.saltedAgg(data, Seq("k"), 8, Seq(
        Skew.Agg("s", col("v"), "sum"), Skew.Agg("n", lit(1), "count"),
        Skew.Agg("mn", col("v"), "min"), Skew.Agg("mx", col("v"), "max")))
      .as[(String, Double, Long, Double, Double)].collect().toSet
    assert(salted == plain)
  }

  test("incrementalAgg merge is bit-identical to the from-scratch GROUP BY") {
    val base = Seq(("a", 1L), ("a", 5L), ("b", 2L)).toDF("k", "v")
    val delta = Seq(("a", 10L), ("c", 7L)).toDF("k", "v") // c: delta-only key
    val aggs = Seq(
      Skew.Agg("n", lit(1), "count"), Skew.Agg("s", col("v"), "sum"),
      Skew.Agg("mn", col("v"), "min"), Skew.Agg("mx", col("v"), "max"))
    val incr = Skew.incrementalAgg(
        Skew.partialAgg(base, Seq("k"), aggs), delta, Seq("k"), aggs)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val full = Skew.partialAgg(base.unionByName(delta), Seq("k"), aggs)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(incr == full, s"incr=$incr full=$full")
    assert(incr.exists(_._1 == "c"), "delta-only key must pass through")
    // base-only key untouched by the delta
    assert(incr.contains(("b", 1L, 2L, 2L, 2L)))
  }

  test("content salt is retry-deterministic and actually spreads rows") {
    val df = Seq.tabulate(100)(i => (s"k${i % 3}", i.toDouble)).toDF("k", "v")
    def salts() = df.withColumn("s", Skew.contentSalt(df, 8))
      .orderBy("v").select("s").as[Int].collect().toSeq
    val first = salts()
    // a pure content hash assigns the same salt on every evaluation —
    // what a task retry needs (mono_id/rand would reshuffle rows)
    assert(first == salts())
    assert(first.distinct.length > 1, "salt must spread a hot key")
    assert(first.forall(s => s >= 0 && s < 8))
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true in final plan)") {
    // The OTHER skew tool besides salting: Spark's own runtime re-plan.
    // Thresholds scaled to toy data (the 256 MB default floor is a
    // cluster setting); the assertion locks that OptimizeSkewedJoin
    // actually fires, so a config regression that silently disables
    // the 100 TB skew path turns the suite red.
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
      // 150k rows on ONE hot key vs ~1k spread keys: the hot shuffle
      // partition dwarfs the median and crosses the scaled threshold
      val left = spark.range(0, 160000).select(
        when(col("id") < 150000, lit(0L)).otherwise(col("id") % 1000).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 1000).select(col("id").as("k"),
        concat(lit("name_"), col("id")).as("name"))
      val joined = left.join(right, "k")
      // materialize THIS QueryExecution (count() would plan a new one
      // and leave joined's adaptive plan unexecuted / non-final)
      assert(joined.collect().length == 160000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew-join did not fire:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedBroadcastJoin equals plain join") {
    val big = Seq.tabulate(500)(i => ("hot", i)) ++ Seq.tabulate(5)(i => (s"k$i", i))
    val bigDf = big.toDF("k", "v")
    val dim = Seq(("hot", "HOT"), ("k1", "K1"), ("k3", "K3")).toDF("k", "name")
    val plain = bigDf.join(dim, "k").select("k", "v", "name")
      .as[(String, Int, String)].collect().toSet
    val salted = Skew.saltedBroadcastJoin(bigDf, dim, "k", 4)
      .select("k", "v", "name").as[(String, Int, String)].collect().toSet
    assert(salted == plain)
  }
}
