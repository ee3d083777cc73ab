package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.HeavyHitterStream
import graft.streaming.HeavyHitterStream.Hitter

/** SpaceSaving invariants under live micro-batches: estimate ≥ true ≥
  * estimate − err, state bounded by capacity per group, guaranteed
  * tracking of anything above N/capacity, group independence. */
class StreamHeavyHitterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming SpaceSaving summary: bounded state, bounded error") {
    implicit val sqlCtx = spark.sqlContext
    val savedProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.streaming.TtlState.RocksDbProvider)
    try {
      val input = MemoryStream[(String, String)]
      val snaps = scala.collection.mutable.ArrayBuffer.empty[Seq[Hitter]]
      val q = HeavyHitterStream.topItems(input.toDS(), capacity = 3)
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Hitter], _: Long) =>
          val rows = df.collect().toSeq
          if (rows.nonEmpty) snaps.synchronized { snaps += rows }
          ()
        }
        .start()
      // batch 1: a×5, b×3, c×1 in group g; x×2 in group h
      input.addData(Seq.fill(5)("g" -> "a") ++ Seq.fill(3)("g" -> "b") ++
        Seq("g" -> "c") ++ Seq.fill(2)("h" -> "x"): _*)
      q.processAllAvailable()
      // batch 2: d arrives with the summary full -> evicts c (min),
      // inheriting its count as err; a keeps counting exactly
      input.addData(Seq("g" -> "d") ++ Seq.fill(2)("g" -> "a"): _*)
      q.processAllAvailable()
      q.stop()

      val s1 = snaps.head.filter(_.group == "g")
      assert(s1.map(h => (h.item, h.count, h.err)).toSet ==
        Set(("a", 5L, 0L), ("b", 3L, 0L), ("c", 1L, 0L)))
      // snapshot ordering: count desc, item asc
      assert(s1.map(_.item) == Seq("a", "b", "c"))
      assert(snaps.head.filter(_.group == "h")
        .map(h => (h.item, h.count, h.err)) == Seq(("x", 2L, 0L)))

      val s2 = snaps.last.filter(_.group == "g")
      assert(s2.size <= 3, s"state must stay within capacity: $s2")
      val byItem = s2.map(h => h.item -> h).toMap
      // exact counts survive for never-evicted items (state carried
      // across batches through the RocksDB store)
      assert(byItem("a").count == 7L && byItem("a").err == 0L)
      assert(byItem("b").count == 3L && byItem("b").err == 0L)
      // d inherited c's count as its over-estimate bound
      assert(byItem("d").count == 2L && byItem("d").err == 1L)
      assert(!byItem.contains("c"), "evicted item must leave the summary")
      // the SpaceSaving guarantee, spelled as the user reads it:
      // true count ∈ [count − err, count] for every tracked item
      val truth = Map("a" -> 7L, "b" -> 3L, "d" -> 1L)
      truth.foreach { case (i, t) =>
        assert(byItem(i).count >= t && byItem(i).count - byItem(i).err <= t,
          s"error bound violated for $i: ${byItem(i)} vs true $t")
      }
    } finally savedProvider match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }
}
