package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approxQuantileGate: small groups auto-guard TRUE, large groups evaluate the band") {
    // n=10 with distinct values: the exact ±0.5%-rank band interpolates
    // STRICTLY BETWEEN two elements, so the (correct) approx answer —
    // an actual element — cannot land inside it: the raw gate is FALSE
    // on correct code, which is exactly why the guard exists
    val tiny = (1 to 10).map(v => ("t", v.toDouble))
    // n=300: the band spans whole elements and the gate is meaningful
    val big = (1 to 300).map(v => ("b", v.toDouble))
    val df = (tiny ++ big).toDF("g", "value")
    val guarded = Relational.approxQuantileGate(df, "g", "value")
      .as[(String, Long, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(guarded("t") == (("t", 10L, true, true)),
      "below the bound the gate must be vacuous-TRUE")
    assert(guarded("b") == (("b", 300L, true, true)))
    // both sides of the bound: with the guard disabled the tiny group's
    // raw band check really does fail on correct data
    val raw = Relational.approxQuantileGate(df, "g", "value", minN = 0)
      .as[(String, Long, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(!raw("t")._3 && !raw("t")._4,
      "n=10 distinct values: no element can sit inside the interpolated band")
    assert(raw("b")._3 && raw("b")._4)
  }

  test("topKPerGroup keeps exactly k best rows per key with stable order") {
    val df = Seq(
      ("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("a", 4, 30.0),
      ("b", 5, 1.0)).toDF("k", "id", "v")
    val top = Relational.topKPerGroup(df, Seq(col("k")),
      Seq(col("v").desc, col("id")), 2)
    val rows = top.select("k", "id", "rn").as[(String, Int, Long)]
      .collect().sortBy(r => (r._1, r._3))
    // ties on v=30.0 broken by id: id=2 before id=4
    assert(rows.toSeq == Seq(("a", 2, 1L), ("a", 4, 2L), ("b", 5, 1L)))
  }

  test("latestPerKey returns the max-ts row per key, keeping all columns") {
    val df = Seq(
      ("a", 1L, "x"), ("a", 3L, "y"), ("b", 2L, "z")).toDF("k", "ts", "payload")
    val got = Relational.latestPerKey(df, Seq("k"), "ts")
      .as[(String, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 3L, "y"), ("b", 2L, "z")))
  }

  test("latestPerKey keeps ties (both rows at the max ts)") {
    val df = Seq(("a", 5L, 1), ("a", 5L, 2), ("a", 1L, 3)).toDF("k", "ts", "n")
    assert(Relational.latestPerKey(df, Seq("k"), "ts").count() == 2)
  }

  test("compact keeps first rows and value changes, drops repeats per key") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 11.0), ("a", 4L, 11.0),
      ("a", 5L, 10.0), // back to an OLD value: still a change, kept
      ("b", 1L, 10.0)  // other key: own first row
    ).toDF("k", "ts", "v")
    val got = Relational.compact(df, Seq(col("k")), Seq(col("ts")), col("v"))
      .select("k", "ts").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 1L), ("a", 3L), ("a", 5L), ("b", 1L)))
  }

  test("compact is null-correct: change to null kept, null repeat dropped") {
    val df = Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, None), ("a", 3L, None),
      ("a", 4L, Some(10.0)),
      ("c", 1L, Option.empty[Double]) // first row with null value: kept
    ).toDF("k", "ts", "v")
    val got = Relational.compact(df, Seq(col("k")), Seq(col("ts")), col("v"))
      .select("k", "ts").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("a", 4L), ("c", 1L)))
  }

  test("bloomPruneJoin equals the plain join, and the probe prunes misses") {
    val fact = Seq((1L, 10.0), (1L, 11.0), (2L, 20.0), (9L, 90.0), (7L, 70.0))
      .toDF("fk", "v")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("dk", "name")
    val got = Relational.bloomPruneJoin(fact, dim, "fk", "dk",
        expectedDimKeys = 3)
      .select("fk", "v", "name").as[(Long, Double, String)].collect().toSet
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "v", "name").as[(Long, Double, String)].collect().toSet
    assert(got == plain && got.size == 3)
    // the membership probe itself: definite misses are pruned pre-join
    val bits = graft.plans.BloomExprs.serialize(
      dim.stat.bloomFilter("dk", 3, 0.01))
    val kept = fact.filter(graft.plans.BloomExprs.mightContain(col("fk"), bits))
      .count()
    assert(kept >= 3 && kept < 5, s"bloom should prune most misses, kept=$kept")
  }

  test("gapFill densifies per-key grids and carries values forward") {
    val df = Seq(
      // user a: observations at minutes 0, 3 (gap at 1, 2), two rows in min 0
      ("a", "2024-01-01 10:00:05", 10.0),
      ("a", "2024-01-01 10:00:45", 20.0),
      ("a", "2024-01-01 10:03:10", 40.0),
      // user b: single observation -> single-row grid
      ("b", "2024-01-01 11:00:00", 7.0)
    ).toDF("k", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Relational.gapFill(df, Seq("k"), "ts",
        round(avg(col("value")), 6), stepSeconds = 60)
      .select(col("k"), unix_timestamp(col("bucket")).as("b"),
        col("value"), col("observed"))
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    assert(got.size == 5) // a: 4 buckets, b: 1
    assert(got(("a", t0)) == ((15.0, true)))        // in-bucket mean
    assert(got(("a", t0 + 60)) == ((15.0, false)))  // filled
    assert(got(("a", t0 + 120)) == ((15.0, false))) // filled
    assert(got(("a", t0 + 180)) == ((40.0, true)))
    assert(got.exists { case ((k, _), (v, o)) => k == "b" && v == 7.0 && o })
  }

  test("funnelTimes enforces strict stage order per key") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val df = Seq(
      // u1: clean signup(10) -> purchase(20) -> error(30)
      (1L, ts(10), "signup"), (1L, ts(20), "purchase"), (1L, ts(30), "error"),
      // u2: purchase BEFORE signup doesn't count; no purchase after -> stage 2 null
      (2L, ts(10), "purchase"), (2L, ts(20), "signup"), (2L, ts(30), "error"),
      // u3: purchase at the same instant as signup is NOT strictly after
      (3L, ts(10), "signup"), (3L, ts(10), "purchase"),
      // u4: earliest qualifying purchase picked (25, not 40); error before it ignored
      (4L, ts(10), "signup"), (4L, ts(15), "error"), (4L, ts(25), "purchase"),
      (4L, ts(40), "purchase"), (4L, ts(50), "error"),
      // u5: no signup at all
      (5L, ts(10), "view")).toDF("user_id", "ts", "event_type")
    val got = Relational.funnelTimes(df, col("user_id"), col("ts"), Seq(
        "signup" -> (col("event_type") === "signup"),
        "purchase" -> (col("event_type") === "purchase"),
        "error" -> (col("event_type") === "error")))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3))))
      .toMap
    assert(got(1L) == ((Some(ts(10)), Some(ts(20)), Some(ts(30)))))
    assert(got(2L) == ((Some(ts(20)), None, None)))
    assert(got(3L) == ((Some(ts(10)), None, None)))
    assert(got(4L) == ((Some(ts(10)), Some(ts(25)), Some(ts(50)))))
    assert(got(5L) == ((None, None, None)))
    assert(got.size == 5)
  }

  test("q67 decomposed rank functions equal the direct window spelling") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("q67_rank_functions")(spark, dir)
    val wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    val wu = Window.partitionBy("l_returnflag")
      .orderBy("l_quantity", "l_orderkey", "l_linenumber")
    val direct = graft.sources.Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      dense_rank().over(wq).cast("long").as("drnk"),
      round(percent_rank().over(wq), 6).as("prnk"),
      round(cume_dist().over(wq), 6).as("cd"),
      ntile(4).over(wu).cast("long").as("quartile"))
    assert(got.count() == direct.count())
    assert(got.exceptAll(direct).count() == 0 &&
      direct.exceptAll(got).count() == 0,
      "decomposed rank family must be row-identical to the direct windows")
  }
}
