package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CorpusStream

/** Streaming corpus ingestion: quality gate + watermarked content dedup
  * end-to-end off a memory source into partitioned parquet. */
class CorpusStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val longText =
    (1 to 30).map(i => s"token$i").mkString(" ") // 30 unique tokens: quality

  private def doc(id: Long, text: String, lang: String, tsSec: Long) =
    s"""{"doc_id": $id, "text": "$text", "lang": "$lang", "ts": "2025-01-01 10:${"%02d".format(tsSec / 60)}:${"%02d".format(tsSec % 60)}"}"""

  test("stream drops low-quality docs and re-delivered content") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("corpus_out").toString
    val ckpt = Files.createTempDirectory("corpus_ckpt").toString
    val input = MemoryStream[String]
    val q = CorpusStream.start(input.toDF(), out, ckpt,
      trigger = Trigger.ProcessingTime("0 seconds"), watermark = "10 minutes")
    input.addData(doc(1, longText, "en", 0))
    input.addData(doc(2, "too short", "en", 10))                  // < 10 tokens
    input.addData(doc(3, longText, "en", 20))                     // dup of 1
    input.addData(doc(4, longText.toUpperCase, "de", 30))         // dup after norm
    input.addData(doc(5, longText + " extra tail tokens here", "fr", 40))
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.schema(
      org.apache.spark.sql.types.StructType(CorpusStream.doc.fields :+
        org.apache.spark.sql.types.StructField("fp",
          org.apache.spark.sql.types.StringType))
      ).parquet(out)
    val ids = landed.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 5L), s"expected only docs 1 and 5, got $ids")
    // partitioned by lang for downstream pruning
    assert(new java.io.File(s"$out/lang=en").exists())
  }

  test("stream anti-joins the known corpus: already-landed content never re-lands") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("corpus_out2").toString
    val ckpt = Files.createTempDirectory("corpus_ckpt2").toString
    // doc 1's content is already in the landed corpus (differing case —
    // the fingerprint normalizes); doc 5's is fresh
    val known = Seq((100L, longText.toUpperCase)).toDF("doc_id", "text")
    val input = MemoryStream[String]
    val q = CorpusStream.start(input.toDF(), out, ckpt,
      trigger = Trigger.ProcessingTime("0 seconds"), watermark = "10 minutes",
      knownKeys = Some(CorpusStream.knownFingerprints(known)))
    input.addData(doc(1, longText, "en", 0))
    input.addData(doc(5, longText + " extra tail tokens here", "fr", 10))
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.schema(
      org.apache.spark.sql.types.StructType(CorpusStream.doc.fields :+
        org.apache.spark.sql.types.StructField("fp",
          org.apache.spark.sql.types.StringType))
      ).parquet(out)
    assert(landed.select("doc_id").as[Long].collect().toSet == Set(5L))
  }

  test("prepareClassified gates by classifier score, identically stream vs batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // enough docs that both score signs occur (md5-derived weights)
    val texts = (0 until 40).map(i =>
      (100L + i, (1 to 12).map(j => s"d${i}w$j").mkString(" ")))
    val staticDocs = texts.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("ts", org.apache.spark.sql.functions.lit("2025-01-01 10:00:00").cast("timestamp"))
    val expected = staticDocs.select(col("doc_id"), col("text"),
        graft.plans.TextHash.classifierScore(
          graft.functions.TextOps.tokens(col("text"))).as("score"))
      .filter(col("score") > 0L)
      // batch twin also dedups by content; these texts are all distinct
      .select("doc_id").as[Long].collect().toSet
    assert(expected.nonEmpty && expected.size < texts.size,
      s"gate must split the corpus, kept ${expected.size}/${texts.size}")
    // batch path
    val batchKept = CorpusStream.prepareClassified(staticDocs)
      .select("doc_id").as[Long].collect().toSet
    assert(batchKept == expected)
    // streaming path over the same docs
    val input = MemoryStream[String]
    val prepared = CorpusStream.prepareClassified(
      CorpusStream.parseDocs(input.toDF()))
    val q = prepared.writeStream.format("memory")
      .queryName("clf_gate").outputMode("append")
      .trigger(Trigger.ProcessingTime("0 seconds")).start()
    texts.zipWithIndex.foreach { case ((id, t), i) => input.addData(doc(id, t, "en", i)) }
    q.processAllAvailable()
    q.stop()
    val streamKept = spark.table("clf_gate")
      .select("doc_id").as[Long].collect().toSet
    assert(streamKept == expected, s"stream=$streamKept expected=$expected")
  }

  test("prepare on a static frame applies the same gate and dedup") {
    val docs = Seq(
      (1L, longText, "en"),
      (2L, "too short", "en"),
      (3L, longText, "en")
    ).toDF("doc_id", "text", "lang")
      .withColumn("ts", org.apache.spark.sql.functions.lit(
        java.sql.Timestamp.valueOf("2025-01-01 10:00:00")))
    val got = CorpusStream.prepare(docs).select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("prepareObserved surfaces per-batch gate metrics in streaming progress") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val q = CorpusStream.prepareObserved(
        CorpusStream.parseDocs(input.toDF()), watermark = "10 minutes")
      .writeStream.format("memory").queryName("obs_corpus")
      .outputMode("append").trigger(Trigger.ProcessingTime("0 seconds"))
      .start()
    input.addData(doc(1, longText, "en", 0))
    input.addData(doc(2, "too short", "en", 10))
    input.addData(doc(3, longText, "en", 20)) // dup of 1
    q.processAllAvailable()
    // walk recentProgress: batches may be split arbitrarily, totals hold
    val (nIn, nOut) = q.recentProgress.foldLeft((0L, 0L)) { (acc, p) =>
      val in = Option(p.observedMetrics.get("corpus_in"))
      val out = Option(p.observedMetrics.get("corpus_out"))
      (acc._1 + in.map(_.getLong(0)).getOrElse(0L),
        acc._2 + out.map(_.getLong(0)).getOrElse(0L))
    }
    q.stop()
    assert(nIn == 3L, s"3 docs entered, observed $nIn")
    assert(nOut == 1L, s"1 doc survived gate+dedup, observed $nOut")
  }

  test("prepareObserved surfaces the same metrics on a batch frame") {
    val docs = Seq(
      (1L, longText, "en"), (2L, "too short", "en"), (3L, longText, "en")
    ).toDF("doc_id", "text", "lang")
      .withColumn("ts", org.apache.spark.sql.functions.lit(
        java.sql.Timestamp.valueOf("2025-01-01 10:00:00")))
    val out = CorpusStream.prepareObserved(docs)
    out.collect() // any action populates observedMetrics
    val m = out.queryExecution.observedMetrics
    assert(m("corpus_in").getAs[Long]("n_in") == 3L)
    assert(m("corpus_in").getAs[Long]("bytes_in") > 0L)
    assert(m("corpus_out").getAs[Long]("n_out") == 1L)
  }
}
