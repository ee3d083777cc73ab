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

  test("multi-band suppression state survives a checkpoint restart (chained stateful ops)") {
    implicit val sqlCtx = spark.sqlContext
    val savedProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.streaming.TtlState.RocksDbProvider)
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("neardup_band_ckpt").toString
      val out = java.nio.file.Files
        .createTempDirectory("neardup_band_out").toString
      val input = MemoryStream[(Long, String, Timestamp)]
      def startQuery() = NearDupStream.suppress(
          input.toDS().toDF("doc_id", "text", "ts"),
          ttl = java.time.Duration.ofMinutes(30), threshold = 0.7,
          bands = 4)
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
      // restart against the SAME checkpoint: all four band buckets of
      // doc 1 must come back from RocksDB (two chained stateful
      // operators share the checkpoint) and still suppress its twin
      val q2 = startQuery()
      input.addData((2L, nearDup, new Timestamp(60000L)),
        (3L, distinct, new Timestamp(61000L)))
      awaitRows(2)
      Thread.sleep(1000)
      q2.stop()
      val ids = spark.read.parquet(out)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 3L),
        s"restart must reload banded suppression state (expected 1,3): $ids")
    } finally savedProvider match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("multi-band blocking lifts recall above single-band, exactly as the signature model predicts") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // 25 (original, near-dup) pairs at j ~ 0.73 — the j ≈ threshold
    // regime where single-band blocking (catch prob = j) visibly
    // leaks and any-of-8 (1 − (1−j)^8) does not
    val rnd = new scala.util.Random(42)
    val vocab = Array.tabulate(400)(i => s"w$i")
    def doc(): Array[String] = Array.fill(40)(vocab(rnd.nextInt(vocab.length)))
    val originals = (1 to 25).map(i => i.toLong -> doc())
    val twins = originals.map { case (id, toks) =>
      val t = toks.clone()
      t(rnd.nextInt(20)) = "xx" + id
      t(20 + rnd.nextInt(20)) = "yy" + id
      (100 + id) -> t
    }
    val threshold = 0.5
    val numHashes = 32
    // signature-level prediction: the stream must behave EXACTLY as
    // the same minhash signatures say it should
    val sigs = (originals ++ twins).toDF("doc_id", "toks")
      .select(col("doc_id"), graft.plans.TextHash.minhashSig(
        col("toks"), 3, numHashes).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    def est(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    def predicted(bands: Int): Set[Long] = originals.map(_._1).flatMap { id =>
      val (o, n) = (sigs(id), sigs(100 + id))
      val verified = est(o, n) >= threshold
      val blocked = (0 until bands).exists(b => o(b) == n(b))
      if (verified && blocked) Some(100 + id) else None
    }.toSet
    val pSingle = predicted(1)
    val pAny8 = predicted(8)
    assert(est(sigs(1L), sigs(101L)) >= threshold, "pairs must verify")
    assert(pSingle.subsetOf(pAny8) && pSingle != pAny8,
      s"corpus must expose the uplift: single=$pSingle any8=$pAny8")
    assert(pAny8.size == 25, s"any-of-8 must catch every pair here: $pAny8")
    val savedProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.streaming.TtlState.RocksDbProvider)
    try {
      def run(bands: Int, sinkName: String, expectedTwins: Int): Set[Long] = {
        val input = MemoryStream[(Long, String, Timestamp)]
        val q = NearDupStream.suppress(
            input.toDS().toDF("doc_id", "text", "ts"),
            ttl = java.time.Duration.ofMinutes(10), threshold = threshold,
            bands = bands)
          .writeStream.outputMode("append")
          .format("memory").queryName(sinkName).start()
        // TWS-with-TTL queries trigger continuous maintenance batches,
        // so processAllAvailable never settles — poll the sink like
        // the other suppression tests
        def awaitRows(n: Long): Unit = {
          val deadline = System.currentTimeMillis() + 90000
          while (spark.table(sinkName).count() < n &&
            System.currentTimeMillis() < deadline) Thread.sleep(100)
        }
        try {
          input.addData(originals.map { case (id, t) =>
            (id, t.mkString(" "), new Timestamp(id * 1000)) })
          awaitRows(25)
          input.addData(twins.map { case (id, t) =>
            (id, t.mkString(" "), new Timestamp(id * 1000)) })
          awaitRows(25L + expectedTwins)
          Thread.sleep(1500) // settle: wrong late admissions land here
        } finally q.stop()
        spark.table(sinkName).select("doc_id").as[Long].collect().toSet
      }
      val admitted1 = run(1, "neardup_band1", 25 - pSingle.size)
      val admitted8 = run(8, "neardup_band8", 25 - pAny8.size)
      val all = (originals ++ twins).map(_._1.toLong).toSet
      assert(admitted1 == all -- pSingle,
        s"bands=1 must match the single-probe model")
      assert(admitted8 == all -- pAny8,
        s"bands=8 must match the any-of-8 model")
      assert((admitted1 -- admitted8).nonEmpty,
        "bands=8 must suppress near-dups that slipped the single band")
    } finally savedProvider match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("multi-band admits exactly one copy of a same-batch duplicate row") {
    implicit val sqlCtx = spark.sqlContext
    val savedProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      graft.streaming.TtlState.RocksDbProvider)
    try {
      val input = MemoryStream[(Long, String, Timestamp)]
      val q = NearDupStream.suppress(
          input.toDS().toDF("doc_id", "text", "ts"),
          ttl = java.time.Duration.ofMinutes(10), threshold = 0.7,
          bands = 4)
        .writeStream.outputMode("append")
        .format("memory").queryName("neardup_dupe_row").start()
      try {
        // the same row posted TWICE in one batch plus a distinct doc:
        // the reducer must admit doc 7 ONCE (first copy clean, second
        // flags dup against it — the bands=1 first-wins semantics),
        // never zero times (the doc_id-keyed collapse bug) or twice
        input.addData((7L, base, new Timestamp(1000L)),
          (7L, base, new Timestamp(1000L)),
          (8L, distinct, new Timestamp(2000L)))
        val deadline = System.currentTimeMillis() + 60000
        while (spark.table("neardup_dupe_row").count() < 2 &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
        Thread.sleep(1000)
      } finally q.stop()
      val ids = spark.table("neardup_dupe_row")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(7L, 8L),
        s"expected doc 7 admitted exactly once plus doc 8, got $ids")
    } finally savedProvider match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("AnyBandReducer: per-band clean witness, not a cross-copy clean count") {
    import NearDupStream.{AnyBandReducer, FlagRow}
    val t = new Timestamp(0L)
    def flags(xs: (Int, Boolean)*): Iterator[FlagRow] =
      xs.iterator.map { case (b, dup) => FlagRow(1L, b, 7L, "x", t, dup) }
    val r = new AnyBandReducer(bands = 2)
    def admitted(rows: Iterator[FlagRow]): Boolean =
      r.handleInputRows(1L, rows, null).nonEmpty
    // single clean copy → admit
    assert(admitted(flags(0 -> false, 1 -> false)))
    // any-band dup on a single copy → suppress
    assert(!admitted(flags(0 -> true, 1 -> false)))
    // the cap corner: TWO identical copies, band 0 verifies a PRIOR
    // near-dup for both (all-dup), band 1's bucket is cap-saturated so
    // both stay clean — 2 clean flags would satisfy a naive
    // count >= bands, but band 0 has no clean witness → suppress
    assert(!admitted(flags(0 -> true, 1 -> false, 0 -> true, 1 -> false)))
    // two clean copies (novel doc, cap blocked the store) → admit one
    assert(admitted(flags(0 -> false, 1 -> false, 0 -> false, 1 -> false)))
    // first copy clean+stored, second flags dup against it → admit one
    assert(admitted(flags(0 -> false, 1 -> false, 0 -> true, 1 -> true)))
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
