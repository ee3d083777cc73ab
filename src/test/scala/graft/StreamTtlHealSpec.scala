package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.streaming.NearDupStream

/** Stream-TTL / batch-fold coherence: [[NearDupStream.suppress]]'s
  * suppressor state is PROCESSING-time TTL'd, so a near-dup arriving
  * after its twin's bucket state aged out is FALSELY ADMITTED — by
  * design (bounded state is the price of an unbounded stream). This
  * spec pins the documented heal: the batch-side cluster fold
  * ([[Dedup.appendClusterAssignments]], the d15/d16 path) re-derives
  * candidate pairs from the PERSISTED key family, which never expires,
  * and re-verifies them exactly — so the pair the stream missed is
  * recorded as one cluster at the next fold, and downstream dedup /
  * canonical selection treats the false admit as the duplicate it is. */
class StreamTtlHealSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = ("the quick brown fox jumps over the lazy dog " +
    "while seventeen sleepy badgers watch from the mossy riverbank " +
    "under a pale october moon and nothing else happens tonight")
  private val nearDup = base.replace("nothing else", "nothing much")

  test("a TTL'd false admit is healed by the next batch cluster fold") {
    implicit val sqlCtx = spark.sqlContext
    val name = "ttlheal_nd"
    val savedProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.streaming.TtlState.RocksDbProvider)
    try {
      // --- the stream's false admit ---
      val input = MemoryStream[(Long, String, Timestamp)]
      val admitted = NearDupStream.suppress(
        input.toDS().toDF("doc_id", "text", "ts"),
        ttl = java.time.Duration.ofSeconds(2), threshold = 0.7)
      val q = admitted.writeStream.outputMode("append")
        .format("memory").queryName("ttlheal_test").start()
      def awaitRows(n: Long): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        while (spark.table("ttlheal_test").count() < n &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      }
      input.addData((1L, base, new Timestamp(1000L)))
      awaitRows(1)
      // outlive the suppressor TTL, then send the near-dup: its twin's
      // bucket state has aged out, so the stream admits it
      Thread.sleep(3000)
      input.addData((4L, nearDup, new Timestamp(60000L)))
      awaitRows(2)
      q.stop()
      val ids = spark.table("ttlheal_test")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 4L),
        s"expected the TTL'd twin to be falsely admitted, got $ids")

      // --- the batch-side heal ---
      // the admitted docs land in the persisted key family (what the
      // neardup sink's landAndMaintain does per micro-batch)
      val doc1 = Seq((1L, base)).toDF("doc_id", "text")
      val doc4 = Seq((4L, nearDup)).toDF("doc_id", "text")
      Dedup.saveNearDupKeys(spark, name, doc1, "doc_id", "text")
      Dedup.saveClusterAssignments(spark, name,
        Dedup.clusters(Dedup.jaccardPairs(doc1, "doc_id", "text",
          threshold = 0.7).select("doc_a", "doc_b")))
      assert(spark.table(s"${name}_clusters").count() == 0L) // no pairs yet
      Dedup.appendNearDupKeys(spark, name, doc4, "doc_id", "text",
        ingestId = "stream000001")
      // the fold re-derives the batch x corpus pair from the key
      // tables (no TTL there) and verifies it exactly: the pair the
      // stream missed becomes one cluster
      Dedup.appendClusterAssignments(spark, name, doc4, "doc_id", "text",
        threshold = 0.7, ingestId = "stream000001")
      val clusters = spark.table(s"${name}_clusters")
        .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
      assert(clusters == Map(1L -> 1L, 4L -> 1L),
        s"fold should record the missed pair as one cluster, got $clusters")
    } finally {
      savedProvider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
      spark.sql("DROP VIEW IF EXISTS ttlheal_test")
      for (t <- Seq(s"${name}_ndband", s"${name}_ndsh", s"${name}_clusters"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
