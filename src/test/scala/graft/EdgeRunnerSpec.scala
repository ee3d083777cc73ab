package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.EdgeRunner

/** Smoke for the operational dispatcher: each mode end-to-end on file
  * sources (the sandbox-runnable `--in` kind). */
class EdgeRunnerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // every line '\n'-terminated: the graftlog source (correctly) treats
  // an unterminated final line as still being written and excludes it
  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(java.nio.file.Paths.get(dir, name),
      lines.map(_ + "\n").mkString.getBytes("UTF-8"))

  test("--mode batch loads OHLCV JSON into partitioned parquet") {
    val in = Files.createTempDirectory("edge_in").toString
    val out = Files.createTempDirectory("edge_out").toString
    writeLines(in, "bars.json", Seq(
      """{"symbol":"AAPL","open":1.0,"high":2.0,"low":0.5,"close":1.5,"volume":100.0,"timestamp":"2025-01-01 10:00:00"}""",
      """{"symbol":"MSFT","open":5.0,"high":6.0,"low":4.0,"close":5.5,"volume":200.0,"timestamp":"2025-01-01 10:01:00"}"""))
    val cfg = EdgeRunner.parse(Array("--mode", "batch", "--in", s"file:$in", "--out", out))
    assert(EdgeRunner.runBatch(spark, cfg) == 2L)
    val bars = spark.read.parquet(s"$out/stock_bars")
    assert(bars.count() == 2 && bars.columns.contains("close"))
    // partitioned by symbol for sink-side pruning
    assert(new java.io.File(s"$out/stock_bars/symbol=AAPL").exists())
  }

  test("--mode meta overwrites the company dimension") {
    val in = Files.createTempDirectory("edge_meta").toString
    val out = Files.createTempDirectory("edge_meta_out").toString
    writeLines(in, "meta.json", Seq(
      """{"symbol":"AAPL","name":"Apple","sector":"Tech","industry":"Hardware"}"""))
    val cfg = EdgeRunner.parse(Array("--mode", "meta", "--in", s"file:$in", "--out", out))
    assert(EdgeRunner.runMeta(spark, cfg) == 1L)
    // overwrite semantics: a second run must not append
    assert(EdgeRunner.runMeta(spark, cfg) == 1L)
    assert(spark.read.parquet(s"$out/company_data").count() == 1)
  }

  test("--mode stream runs the minute pipeline off a file source") {
    val in = Files.createTempDirectory("edge_stream").toString
    val out = Files.createTempDirectory("edge_stream_out").toString
    val ckpt = Files.createTempDirectory("edge_stream_ckpt").toString
    val m0 = 1735732800000L
    writeLines(in, "envelopes.json", Seq(
      s"""{"data": [{"p": 100.0, "s": "AAPL", "t": ${m0 + 1000}, "v": 10.0}]}""",
      s"""{"data": [{"p": 101.0, "s": "AAPL", "t": ${m0 + 61000}, "v": 10.0}]}""",
      s"""{"data": [{"p": 102.0, "s": "AAPL", "t": ${m0 + 600000}, "v": 10.0}]}"""))
    val cfg = EdgeRunner.parse(Array("--mode", "stream", "--in", s"file:$in",
      "--out", out, "--checkpoint", ckpt))
    val q = EdgeRunner.startStream(spark, cfg, Trigger.ProcessingTime("0 seconds"))
    q.processAllAvailable()
    q.stop()
    val bars = spark.read.parquet(s"$out/bars")
    assert(bars.count() >= 2, s"expected ≥2 closed bars, got ${bars.count()}")
    assert(spark.read.parquet(s"$out/metrics").columns.contains("is_anomaly"))
  }

  test("--mode corpus ingests documents with gate + dedup") {
    val in = Files.createTempDirectory("edge_corpus").toString
    val out = Files.createTempDirectory("edge_corpus_out").toString
    val ckpt = Files.createTempDirectory("edge_corpus_ckpt").toString
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    writeLines(in, "docs.json", Seq(
      s"""{"doc_id": 1, "text": "$text", "lang": "en", "ts": "2025-01-01 10:00:00"}""",
      s"""{"doc_id": 2, "text": "short", "lang": "en", "ts": "2025-01-01 10:00:10"}""",
      s"""{"doc_id": 3, "text": "$text", "lang": "en", "ts": "2025-01-01 10:00:20"}"""))
    val cfg = EdgeRunner.parse(Array("--mode", "corpus", "--in", s"file:$in",
      "--out", out, "--checkpoint", ckpt))
    val q = EdgeRunner.startCorpus(spark, cfg, Trigger.ProcessingTime("0 seconds"))
    q.processAllAvailable()
    q.stop()
    import org.apache.spark.sql.types._
    val landed = spark.read.schema(StructType(
      graft.streaming.CorpusStream.doc.fields :+ StructField("fp", StringType)))
      .parquet(out)
    assert(landed.count() == 1, "only the first quality doc survives")
  }

  test("--mode dedup keeps only docs that are new vs the known corpus") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val knownDir = Files.createTempDirectory("edge_known").toString + "/corpus"
    Seq((0L, base, "en", "web"),
        (1L, "ships and harbors at dawn in heavy fog for hours", "en", "books"))
      .toDF("doc_id", "text", "lang", "source").write.parquet(knownDir)
    val in = Files.createTempDirectory("edge_dedup_in").toString
    val out = Files.createTempDirectory("edge_dedup_out").toString
    writeLines(in, "batch.json", Seq(
      s"""{"doc_id":10,"text":"The  quick brown fox jumps over the lazy dog again and again today","lang":"en","source":"web"}""",
      s"""{"doc_id":11,"text":"$base tonight","lang":"en","source":"web"}""",
      """{"doc_id":12,"text":"rainfall statistics across four decades of measurements","lang":"de","source":"news"}""",
      """this line is not json and must not pollute the corpus"""))
    val cfg = EdgeRunner.parse(Array("--mode", "dedup", "--in", s"file:$in",
      "--out", out, "--known", knownDir))
    assert(EdgeRunner.runDedup(spark, cfg) == 1L)
    val kept = spark.read.parquet(s"$out/corpus_docs")
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(12L))
    // lang-partitioned for pruning on later reads
    assert(new java.io.File(s"$out/corpus_docs/lang=de").exists())
    // --known-keys: the persisted key-table path gives the same keeps
    // without re-reading corpus text
    val keysDir = Files.createTempDirectory("edge_keys").toString + "/keys"
    graft.operators.Dedup.knownKeys(spark.read.parquet(knownDir), "text")
      .write.parquet(keysDir)
    val out2 = Files.createTempDirectory("edge_dedup_out2").toString
    val cfg2 = EdgeRunner.parse(Array("--mode", "dedup", "--in", s"file:$in",
      "--out", out2, "--known-keys", keysDir))
    assert(EdgeRunner.runDedup(spark, cfg2) == 1L)
    assert(spark.read.parquet(s"$out2/corpus_docs")
      .select("doc_id").as[Long].collect().toSeq == Seq(12L))
  }

  test("--mode maintain closes the dedup loop: bootstrap, ingest, append, re-ingest") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val keysDir = Files.createTempDirectory("edge_maint_keys").toString + "/keys"
    // day 0 (bootstrap): maintain over the existing corpus creates the
    // key table — the corpus text is never read again after this
    val corpusIn = Files.createTempDirectory("edge_maint_corpus").toString
    writeLines(corpusIn, "corpus.json", Seq(
      s"""{"doc_id":0,"text":"$base","lang":"en","source":"web"}"""))
    val boot = EdgeRunner.parse(Array("--mode", "maintain",
      "--in", s"file:$corpusIn", "--known-keys", keysDir))
    assert(EdgeRunner.runMaintain(spark, boot) == 1L)
    // day 1: a fresh doc survives dedup against the keys
    val in1 = Files.createTempDirectory("edge_maint_in1").toString
    writeLines(in1, "b1.json", Seq(
      """{"doc_id":10,"text":"rainfall statistics across four decades of measurements","lang":"en","source":"news"}"""))
    val out1 = Files.createTempDirectory("edge_maint_out1").toString
    assert(EdgeRunner.runDedup(spark, EdgeRunner.parse(Array("--mode", "dedup",
      "--in", s"file:$in1", "--out", out1, "--known-keys", keysDir))) == 1L)
    // maintenance appends the survivor's keys
    assert(EdgeRunner.runMaintain(spark, EdgeRunner.parse(Array("--mode", "maintain",
      "--in", s"file:$in1", "--known-keys", keysDir))) == 1L)
    // day 2: a re-post of day 1's survivor AND of the bootstrap corpus
    // are both dropped; only the genuinely new doc lands
    val in2 = Files.createTempDirectory("edge_maint_in2").toString
    writeLines(in2, "b2.json", Seq(
      """{"doc_id":20,"text":"rainfall statistics across four decades of measurements","lang":"en","source":"web"}""",
      s"""{"doc_id":21,"text":"$base","lang":"en","source":"web"}""",
      """{"doc_id":22,"text":"entirely novel content about catalyst physical planning","lang":"en","source":"web"}"""))
    val out2 = Files.createTempDirectory("edge_maint_out2").toString
    assert(EdgeRunner.runDedup(spark, EdgeRunner.parse(Array("--mode", "dedup",
      "--in", s"file:$in2", "--out", out2, "--known-keys", keysDir))) == 1L)
    assert(spark.read.parquet(s"$out2/corpus_docs")
      .select("doc_id").as[Long].collect().toSeq == Seq(22L))
  }

  test("--mode maintain is replay-idempotent and consumes dedup's parquet output") {
    import spark.implicits._
    val keysDir = Files.createTempDirectory("edge_replay_keys").toString + "/keys"
    val corpusIn = Files.createTempDirectory("edge_replay_corpus").toString
    writeLines(corpusIn, "corpus.json", Seq(
      """{"doc_id":0,"text":"the quick brown fox jumps over the lazy dog again today","lang":"en","source":"web"}"""))
    assert(EdgeRunner.runMaintain(spark, EdgeRunner.parse(Array("--mode", "maintain",
      "--in", s"file:$corpusIn", "--known-keys", keysDir))) == 1L)
    // the crash-and-retry: same input, same derived ingest id — the
    // key dir must hold the batch's keys ONCE, not twice
    assert(EdgeRunner.runMaintain(spark, EdgeRunner.parse(Array("--mode", "maintain",
      "--in", s"file:$corpusIn", "--known-keys", keysDir))) == 1L)
    assert(spark.read.parquet(keysDir).count() == 1L,
      "retried maintain must replace its ingest partition, not append")
    // day 1: dedup lands survivors as parquet; maintain consumes THAT
    // parquet (keys of what LANDED), with an explicit ingest id
    val in1 = Files.createTempDirectory("edge_replay_in1").toString
    writeLines(in1, "b1.json", Seq(
      """{"doc_id":10,"text":"rainfall statistics across four decades of measurements","lang":"en","source":"news"}""",
      """{"doc_id":11,"text":"the quick brown fox jumps over the lazy dog again today","lang":"en","source":"web"}"""))
    val out1 = Files.createTempDirectory("edge_replay_out1").toString
    // the LANDING is replay-idempotent too: dedup run twice with the
    // same input lands the survivor once, not twice
    for (_ <- 1 to 2)
      assert(EdgeRunner.runDedup(spark, EdgeRunner.parse(Array("--mode", "dedup",
        "--in", s"file:$in1", "--out", out1, "--known-keys", keysDir,
        "--ingest-id", "day1"))) == 1L)
    assert(spark.read.parquet(s"$out1/corpus_docs").count() == 1L,
      "retried dedup must replace its ingest partition, not re-append docs")
    for (_ <- 1 to 2) // land + the retry; same id as the dedup, so the
      // maintain keys exactly the docs landed under day1
      assert(EdgeRunner.runMaintain(spark, EdgeRunner.parse(Array("--mode", "maintain",
        "--in", s"parquet:$out1/corpus_docs", "--known-keys", keysDir,
        "--ingest-id", "day1"))) == 1L)
    assert(spark.read.parquet(keysDir).count() == 2L)
    assert(spark.read.parquet(keysDir).select("ingest_id").distinct()
      .as[String].collect().toSet.contains("day1"))
    // day 2: re-posts of the corpus doc AND day 1's survivor both drop
    val in2 = Files.createTempDirectory("edge_replay_in2").toString
    writeLines(in2, "b2.json", Seq(
      """{"doc_id":20,"text":"rainfall statistics across four decades of measurements","lang":"en","source":"web"}""",
      """{"doc_id":21,"text":"the quick brown fox jumps over the lazy dog again today","lang":"en","source":"web"}""",
      """{"doc_id":22,"text":"entirely novel content about catalyst physical planning","lang":"en","source":"web"}"""))
    val out2 = Files.createTempDirectory("edge_replay_out2").toString
    assert(EdgeRunner.runDedup(spark, EdgeRunner.parse(Array("--mode", "dedup",
      "--in", s"file:$in2", "--out", out2, "--known-keys", keysDir))) == 1L)
    assert(spark.read.parquet(s"$out2/corpus_docs")
      .select("doc_id").as[Long].collect().toSeq == Seq(22L))
  }

  test("--mode neardup with --known-keys closes the stream->batch dedup loop") {
    import spark.implicits._
    val in = Files.createTempDirectory("edge_loop_log").toString
    val out = Files.createTempDirectory("edge_loop_out").toString
    val ckpt = Files.createTempDirectory("edge_loop_ckpt").toString
    val keysDir = Files.createTempDirectory("edge_loop_keys").toString + "/keys"
    val base = "the quick brown fox jumps over the lazy dog while " +
      "seventeen sleepy badgers watch from the mossy riverbank tonight"
    val other = "completely different subject matter entirely about " +
      "catalyst optimizer rules rewriting logical plans tonight"
    def doc(i: Int, text: String) =
      s"""{"doc_id":$i,"text":"$text","lang":"en","ts":"2025-01-01 10:0$i:00"}"""
    writeLines(in, "docs.log", Seq(doc(1, base), doc(2, other)))
    val savedProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    try {
      val q = EdgeRunner.startNearDup(spark, EdgeRunner.parse(Array(
          "--mode", "neardup", "--in", s"log:$in", "--out", out,
          "--checkpoint", ckpt, "--known-keys", keysDir)),
        Trigger.ProcessingTime("0 seconds"))
      val deadline = System.currentTimeMillis() + 60000
      def keyCount(): Long =
        try spark.read.parquet(keysDir).count() catch { case _: Exception => 0L }
      while (keyCount() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      q.stop()
      assert(keyCount() == 2L, "both admitted docs' keys must reach the key dir")
      assert(spark.read.parquet(out).select("doc_id")
        .as[Long].collect().toSet == Set(1L, 2L))
      // the loop closure: a BATCH ingest re-posting a stream-admitted
      // doc is dropped by --mode dedup against the same key dir
      val in2 = Files.createTempDirectory("edge_loop_in2").toString
      writeLines(in2, "b.json", Seq(
        s"""{"doc_id":10,"text":"$base","lang":"en","source":"web"}""",
        """{"doc_id":11,"text":"fresh words never landed anywhere before now","lang":"en","source":"web"}"""))
      val out2 = Files.createTempDirectory("edge_loop_out2").toString
      assert(EdgeRunner.runDedup(spark, EdgeRunner.parse(Array("--mode", "dedup",
        "--in", s"file:$in2", "--out", out2, "--known-keys", keysDir))) == 1L)
      assert(spark.read.parquet(s"$out2/corpus_docs")
        .select("doc_id").as[Long].collect().toSeq == Seq(11L))
      // the foreachBatch body is replay-idempotent: re-running a batch
      // with the same id replaces its partitions, never duplicates
      val landed = spark.read.parquet(out).filter(col("batch_id") === 0L)
        .select("doc_id", "text", "ts").persist()
      if (landed.count() > 0) {
        EdgeRunner.landAndMaintain(landed, 0L, out, keysDir)
        assert(keyCount() == 2L && spark.read.parquet(out).count() == 2L,
          "replaying batch 0 must not change either table")
      }
      landed.unpersist()
    } finally savedProvider match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("--mode compact folds old ingest partitions of the maintain key dir") {
    import spark.implicits._
    val keysDir = Files.createTempDirectory("edge_cpt_keys").toString + "/keys"
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again today",
      "rainfall statistics across four decades of measurements",
      "entirely novel content about catalyst physical planning")
    texts.zipWithIndex.foreach { case (t, i) =>
      val in = Files.createTempDirectory(s"edge_cpt_in$i").toString
      writeLines(in, "b.json",
        Seq(s"""{"doc_id":$i,"text":"$t","lang":"en","source":"web"}"""))
      assert(EdgeRunner.runMaintain(spark, EdgeRunner.parse(Array("--mode", "maintain",
        "--in", s"file:$in", "--known-keys", keysDir,
        "--ingest-id", s"day$i"))) == 1L)
    }
    EdgeRunner.runCompact(spark, EdgeRunner.parse(Array("--mode", "compact",
      "--in", "unused:", "--known-keys", keysDir, "--keep-last", "1")))
    // three ingests folded to base + the most recent (still replayable)
    assert(spark.read.parquet(keysDir).select("ingest_id").distinct()
      .as[String].collect().toSet == Set("base", "day2"))
    assert(spark.read.parquet(keysDir).count() == 3L)
    // dedup still drops re-posts of ALL compacted batches
    val in = Files.createTempDirectory("edge_cpt_repost").toString
    writeLines(in, "b.json", texts.zipWithIndex.map { case (t, i) =>
      s"""{"doc_id":${10 + i},"text":"$t","lang":"en","source":"web"}"""
    } :+ """{"doc_id":99,"text":"fresh words never landed anywhere before now","lang":"en","source":"web"}""")
    val out = Files.createTempDirectory("edge_cpt_out").toString
    assert(EdgeRunner.runDedup(spark, EdgeRunner.parse(Array("--mode", "dedup",
      "--in", s"file:$in", "--out", out, "--known-keys", keysDir))) == 1L)
    assert(spark.read.parquet(s"$out/corpus_docs")
      .select("doc_id").as[Long].collect().toSeq == Seq(99L))
  }

  test("--mode compact --partition-by folds the dedup corpus_docs landing, lang preserved") {
    import spark.implicits._
    val keysDir = Files.createTempDirectory("edge_cdl_keys").toString + "/keys"
    val out = Files.createTempDirectory("edge_cdl_out").toString
    // bootstrap the key dir (dedup reads it even on day 1)
    val in0 = Files.createTempDirectory("edge_cdl_in0").toString
    writeLines(in0, "b.json", Seq(
      """{"doc_id":0,"text":"the original corpus seed document for this loop","lang":"en","source":"web"}"""))
    assert(EdgeRunner.runMaintain(spark, EdgeRunner.parse(Array("--mode", "maintain",
      "--in", s"file:$in0", "--known-keys", keysDir, "--ingest-id", "day0"))) == 1L)
    for (d <- 1 to 2) {
      val in = Files.createTempDirectory(s"edge_cdl_in$d").toString
      writeLines(in, "b.json", Seq(
        s"""{"doc_id":$d,"text":"${if (d == 1) "rainfall statistics across four decades of measurements"
          else "vier jahrzehnte niederschlag statistik aus den bergen heute"}","lang":"${if (d == 1) "en" else "de"}","source":"web"}"""))
      assert(EdgeRunner.runDedup(spark, EdgeRunner.parse(Array("--mode", "dedup",
        "--in", s"file:$in", "--out", out, "--known-keys", keysDir,
        "--ingest-id", s"day$d"))) == 1L)
      EdgeRunner.runMaintain(spark, EdgeRunner.parse(Array("--mode", "maintain",
        "--in", s"parquet:$out/corpus_docs", "--known-keys", keysDir,
        "--ingest-id", s"day$d")))
    }
    val docsDir = s"$out/corpus_docs"
    val before = spark.read.parquet(docsDir)
      .select("doc_id", "lang").as[(Long, String)].collect().toSet
    EdgeRunner.runCompact(spark, EdgeRunner.parse(Array("--mode", "compact",
      "--in", "unused:", "--known-keys", docsDir,
      "--partition-by", "lang,ingest_id", "--keep-last", "1")))
    assert(spark.read.parquet(docsDir)
      .select("doc_id", "lang").as[(Long, String)].collect().toSet == before)
    assert(spark.read.parquet(docsDir).select("ingest_id").distinct()
      .as[String].collect().toSet == Set("base", "day2"))
    // lang stays the top-level pruning directory
    assert(new java.io.File(s"$docsDir/lang=en").exists() &&
      new java.io.File(s"$docsDir/lang=de").exists())
  }

  test("--mode audit flags an ingest that crashed between a family's two writes") {
    import spark.implicits._
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val name = "edge_audit_nd"
    try {
      graft.operators.Dedup.saveNearDupKeys(spark, name,
        corpus.filter(col("doc_id") % 3 === 0), "doc_id", "text")
      graft.operators.Dedup.appendNearDupKeys(spark, name,
        corpus.filter(col("doc_id") % 3 === 1), "doc_id", "text",
        ingestId = "day1")
      def audit() = EdgeRunner.runAudit(spark, EdgeRunner.parse(Array(
        "--mode", "audit", "--in", "unused:",
        "--table", s"${name}_ndband,${name}_ndsh")))
      assert(audit() == Seq.empty, "a healthy family audits clean")
      // the half-landed ingest: day2 reaches ONLY the band table (the
      // crash window between writeNearDupKeys' two writes) — simulated
      // by landing band-shaped rows under a fresh ingest id there
      graft.sources.Bucketing.writeBucketedIngest(spark,
        spark.table(s"${name}_ndband").drop("ingest_id").limit(5)
          .localCheckpoint(true),
        s"${name}_ndband", Seq("band_idx", "band_key"), 8, "day2")
      assert(audit() == Seq("day2"),
        "the band-table-only ingest must be flagged inconsistent")
    } finally for (t <- Seq(s"${name}_ndband", s"${name}_ndsh"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("--mode compact --table compacts a managed bucketed key table via the catalog spec") {
    import spark.implicits._
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val name = "edge_cpt_tbl"
    try {
      graft.operators.Dedup.saveNearDupKeys(spark, name,
        corpus.filter(col("doc_id") % 3 === 0), "doc_id", "text")
      for (d <- 1 to 2)
        graft.operators.Dedup.appendNearDupKeys(spark, name,
          corpus.filter(col("doc_id") % 3 === d), "doc_id", "text",
          ingestId = s"day$d")
      val before = spark.table(s"${name}_ndsh").count()
      val out = EdgeRunner.runCompact(spark, EdgeRunner.parse(Array(
        "--mode", "compact", "--in", "unused:",
        "--table", s"${name}_ndsh:doc_id", "--keep-last", "1")))
      assert(out.contains(s"${name}_ndsh"))
      assert(spark.table(s"${name}_ndsh").count() == before)
      assert(spark.table(s"${name}_ndsh").select("ingest_id").distinct()
        .as[String].collect().toSet == Set("base", "day2"))
      // the rewrite preserved the catalog's 8-bucket spec
      assert(spark.sql(s"DESCRIBE TABLE EXTENDED ${name}_ndsh")
        .filter(col("col_name") === "Num Buckets")
        .select("data_type").as[String].head().trim == "8")
    } finally for (t <- Seq(s"${name}_ndband", s"${name}_ndsh"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("--mode batch and stream run off the graftlog (log:) DSv2 source") {
    val in = Files.createTempDirectory("edge_log").toString
    val out = Files.createTempDirectory("edge_log_out").toString
    val ckpt = Files.createTempDirectory("edge_log_ckpt").toString
    writeLines(in, "bars.log", Seq(
      """{"symbol":"AAPL","open":1.0,"high":2.0,"low":0.5,"close":1.5,"volume":100.0,"timestamp":"2025-01-01 10:00:00"}"""))
    val bCfg = EdgeRunner.parse(Array("--mode", "batch", "--in", s"log:$in", "--out", out))
    assert(EdgeRunner.runBatch(spark, bCfg) == 1L)
    // the stream dispatcher reads the same directory as an unbounded
    // topic twin: per-file offsets, not a file-source re-listing
    val m0 = 1735732800000L
    val sIn = Files.createTempDirectory("edge_log_s").toString
    writeLines(sIn, "trades.log", Seq(
      s"""{"data": [{"p": 100.0, "s": "AAPL", "t": ${m0 + 1000}, "v": 10.0}]}""",
      s"""{"data": [{"p": 102.0, "s": "AAPL", "t": ${m0 + 600000}, "v": 10.0}]}"""))
    val sOut = Files.createTempDirectory("edge_log_s_out").toString
    val sCfg = EdgeRunner.parse(Array("--mode", "stream", "--in", s"log:$sIn",
      "--out", sOut, "--checkpoint", ckpt))
    val q = EdgeRunner.startStream(spark, sCfg, Trigger.ProcessingTime("0 seconds"))
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(s"$sOut/bars").count() >= 1)
  }

  test("--drain true processes the backlog with AvailableNow and self-terminates") {
    val m0 = 1735732800000L
    val in = Files.createTempDirectory("edge_drain").toString
    val out = Files.createTempDirectory("edge_drain_out").toString
    val ckpt = Files.createTempDirectory("edge_drain_ckpt").toString
    // two trades 10 min apart: the second batch's watermark flushes the
    // first minute's bar before the drain completes
    writeLines(in, "trades.log", Seq(
      s"""{"data": [{"p": 100.0, "s": "AAPL", "t": ${m0 + 1000}, "v": 10.0}]}""",
      s"""{"data": [{"p": 102.0, "s": "AAPL", "t": ${m0 + 600000}, "v": 10.0}]}"""))
    val cfg = EdgeRunner.parse(Array("--mode", "stream", "--in", s"log:$in",
      "--out", out, "--checkpoint", ckpt, "--drain", "true"))
    assert(cfg.drain)
    val q = EdgeRunner.startStream(spark, cfg,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    // AvailableNow must terminate on its own — no stop() needed
    assert(q.awaitTermination(60000), "drain query must self-terminate")
    assert(spark.read.parquet(s"$out/bars").count() >= 1)
  }

  test("--mode corpus ingests from the graftlog source with offsets") {
    import spark.implicits._
    val in = Files.createTempDirectory("edge_corpus_log").toString
    val out = Files.createTempDirectory("edge_corpus_log_out").toString
    val ckpt = Files.createTempDirectory("edge_corpus_log_ckpt").toString
    val doc = (i: Int) =>
      s"""{"doc_id":$i,"text":"${(0 until 12).map(w => s"tok$i$w").mkString(" ")}","lang":"en","ts":"2025-01-01 10:0$i:00"}"""
    writeLines(in, "docs.log", (0 until 5).map(doc))
    val cfg = EdgeRunner.parse(Array("--mode", "corpus", "--in", s"log:$in",
      "--out", out, "--checkpoint", ckpt))
    val q = EdgeRunner.startCorpus(spark, cfg, Trigger.ProcessingTime("0 seconds"))
    q.processAllAvailable()
    q.stop()
    import org.apache.spark.sql.types._
    val landed = spark.read.schema(StructType(
      graft.streaming.CorpusStream.doc.fields :+ StructField("fp", StringType)))
      .parquet(out)
    assert(landed.count() == 5, "all five distinct quality docs land")
  }

  test("--mode neardup suppresses near-duplicate docs from the graftlog stream") {
    val in = Files.createTempDirectory("edge_neardup_log").toString
    val out = Files.createTempDirectory("edge_neardup_out").toString
    val ckpt = Files.createTempDirectory("edge_neardup_ckpt").toString
    val base = "the quick brown fox jumps over the lazy dog while " +
      "seventeen sleepy badgers watch from the mossy riverbank " +
      "under a pale october moon and nothing else happens tonight"
    val nearDup = base.replace("nothing else", "nothing much")
    val distinct = "completely different subject matter entirely about " +
      "catalyst optimizer rules rewriting logical plans into physical " +
      "operators with whole stage code generation for columnar batches"
    def doc(i: Int, text: String) =
      s"""{"doc_id":$i,"text":"$text","lang":"en","ts":"2025-01-01 10:0$i:00"}"""
    writeLines(in, "docs.log",
      Seq(doc(1, base), doc(2, nearDup), doc(3, distinct)))
    val savedProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    try {
      // --bands 4 drives the multi-band path through the full graftlog
      // e2e; doc 2's signature agrees with doc 1's at band 0 (the
      // single-band variant of this test), so any-of-4 must suppress too
      val cfg = EdgeRunner.parse(Array("--mode", "neardup", "--in", s"log:$in",
        "--out", out, "--checkpoint", ckpt, "--sim-threshold", "0.7",
        "--bands", "4"))
      assert(cfg.simThreshold == 0.7 && cfg.ttlMin == 10L && cfg.bands == 4)
      val q = EdgeRunner.startNearDup(spark, cfg,
        Trigger.ProcessingTime("0 seconds"))
      // processing-time TTL housekeeping never quiesces (TtlState
      // scaladoc) — poll the sink, don't wait on processAllAvailable
      val deadline = System.currentTimeMillis() + 60000
      def landedCount(): Long =
        try spark.read.parquet(out).count() catch { case _: Exception => 0L }
      while (landedCount() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      Thread.sleep(1000) // settle: a late wrong admission would land here
      q.stop()
      val ids = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 3L), s"near-dup doc 2 must be suppressed: $ids")
    } finally savedProvider match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("--mode neardup --drain terminates once the backlog drains (no empty-batch spin)") {
    val in = Files.createTempDirectory("edge_nddrain_log").toString
    val out = Files.createTempDirectory("edge_nddrain_out").toString
    val ckpt = Files.createTempDirectory("edge_nddrain_ckpt").toString
    val base = "the quick brown fox jumps over the lazy dog while " +
      "seventeen sleepy badgers watch from the mossy riverbank tonight"
    def doc(i: Int, text: String) =
      s"""{"doc_id":$i,"text":"$text","lang":"en","ts":"2025-01-01 10:0$i:00"}"""
    writeLines(in, "docs.log",
      Seq(doc(1, base), doc(2, base.replace("tonight", "at dusk")),
        doc(3, "completely different content about catalyst rules tonight")))
    val savedProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    val savedNoData = spark.conf.getOption(
      "spark.sql.streaming.noDataMicroBatches.enabled")
    try {
      // transformWithState under processing-time TTL answers
      // shouldRunAnotherBatch=true unconditionally; before the fix an
      // AvailableNow drain would spin EMPTY micro-batches forever
      // (700+ observed on a 5k-doc drain), each a full RocksDB
      // checkpoint upload — awaitTermination never returned
      val q = EdgeRunner.startNearDup(spark, EdgeRunner.parse(Array(
          "--mode", "neardup", "--in", s"log:$in", "--out", out,
          "--checkpoint", ckpt, "--drain", "true")),
        Trigger.AvailableNow())
      // the no-data-batch override is scoped to the drained QUERY (the
      // stream snapshots session conf at start): the session value is
      // restored before startNearDup returns, so a later steady-state
      // ProcessingTime stream on this session keeps the default
      assert(spark.conf.getOption(
        "spark.sql.streaming.noDataMicroBatches.enabled") == savedNoData,
        "startNearDup must restore the session's no-data-batch setting")
      assert(q.awaitTermination(120000),
        "an AvailableNow drain must STOP once the backlog is consumed")
      val ids = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 3L), s"suppression must still hold: $ids")
      // and it stopped promptly: no pile of empty offsets past the data
      val nOffsets = new java.io.File(s"$ckpt/offsets")
        .listFiles().count(f => f.getName.forall(_.isDigit))
      assert(nOffsets <= 5, s"empty-batch spin: $nOffsets offset files")
    } finally {
      savedProvider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
      // the drain fix sets this on the SESSION (CLI semantics: one
      // process per run); restore it for the shared test session
      savedNoData match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.noDataMicroBatches.enabled", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.noDataMicroBatches.enabled")
      }
    }
  }

  test("stream mode resumes from its checkpoint without duplicating bars") {
    val in = Files.createTempDirectory("edge_resume").toString
    val out = Files.createTempDirectory("edge_resume_out").toString
    val ckpt = Files.createTempDirectory("edge_resume_ckpt").toString
    val m0 = 1735732800000L
    def env(p: Double, t: Long) =
      s"""{"data": [{"p": $p, "s": "AAPL", "t": $t, "v": 1.0}]}"""
    val cfg = EdgeRunner.parse(Array("--mode", "stream", "--in", s"file:$in",
      "--out", out, "--checkpoint", ckpt))
    // first run: one closed bar (watermark pushed by the +10min event)
    writeLines(in, "a.json", Seq(env(100.0, m0 + 1000), env(101.0, m0 + 600000)))
    val q1 = EdgeRunner.startStream(spark, cfg, Trigger.ProcessingTime("0 seconds"))
    q1.processAllAvailable(); q1.stop()
    val afterFirst = spark.read.parquet(s"$out/bars").count()
    assert(afterFirst >= 1)
    // second run, SAME checkpoint: only the new file may contribute
    writeLines(in, "b.json", Seq(env(102.0, m0 + 660000), env(103.0, m0 + 1200000)))
    val q2 = EdgeRunner.startStream(spark, cfg, Trigger.ProcessingTime("0 seconds"))
    q2.processAllAvailable(); q2.stop()
    val bars = spark.read.parquet(s"$out/bars")
    // the first run's bars appear exactly once (no reprocessing of a.json)
    assert(bars.groupBy("timestamp", "symbol").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() == 0,
      "restart must not duplicate closed bars")
    assert(bars.count() > afterFirst, "restart must process the new file")
  }

  test("--mode zorder clusters a parquet table on the Morton key") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val in = java.nio.file.Files.createTempDirectory("z_in").toString
    val out = java.nio.file.Files.createTempDirectory("z_out").toString
    Seq.fill(5000)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      .toDF("x", "y").write.mode("overwrite").parquet(in)
    EdgeRunner.run(spark, EdgeRunner.parse(Array(
      "--mode", "zorder", "--in", s"file:$in", "--out", out,
      "--dims", "x,y", "--bits", "8", "--files", "8")))
    val back = spark.read.parquet(out)
    assert(back.count() == 5000)
    assert(back.columns.toSet == Set("x", "y")) // zkey dropped from output
    // every output file holds a bounded bbox in BOTH dims
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 8)
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(org.apache.spark.sql.functions.min("y"),
          org.apache.spark.sql.functions.max("y"))
        .as[(Long, Long)].head()
      r._2 - r._1
    }
    assert(spans.map(_.toDouble).sum / spans.length < 200.0,
      s"z-ordered y-spans must be bounded, got ${spans.toSeq}")
    // the mode also writes the skipping manifest: pruned range reads work
    val pruned = graft.operators.Layout.readPruned(spark, out, "y", 0L, 31L)
    assert(pruned.count() ==
      spark.read.parquet(out).where("y BETWEEN 0 AND 31").count())
  }

  test("--mode zorder --ingest-id lands an incremental z-clustered partition") {
    import spark.implicits._
    val src = Files.createTempDirectory("edge_zinc_src").toString + "/batch"
    val out = Files.createTempDirectory("edge_zinc_out").toString + "/t"
    (0 until 2000).map(i => (i.toLong, (i * 37 % 500).toLong, (i * 91 % 500).toLong))
      .toDF("id", "x", "y").write.parquet(src)
    // twice: the incremental layout op is replay-idempotent like the
    // rest of the maintenance family
    for (_ <- 1 to 2)
      EdgeRunner.run(spark, EdgeRunner.parse(Array("--mode", "zorder",
        "--in", s"file:$src", "--out", out, "--dims", "x,y",
        "--bits", "9", "--files", "4", "--ingest-id", "day1")))
    assert(new java.io.File(s"$out/ingest_id=day1").exists())
    assert(spark.read.parquet(out).count() == 2000L)
    // manifest rows = this ingest's files; pruned read is exact
    assert(spark.read.parquet(s"$out/${graft.operators.Layout.ManifestDir}")
      .count() == 4L)
    val pruned = graft.operators.Layout.readPruned(spark, out, "x", 50L, 120L)
      .select("id").as[Long].collect().sorted.toSeq
    val full = spark.read.parquet(out)
      .where(col("x") >= 50L && col("x") <= 120L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(pruned == full && pruned.nonEmpty)
  }

  test("--mode classify scores documents and partitions by the keep flag") {
    val in = Files.createTempDirectory("edge_cls_in").toString
    val out = Files.createTempDirectory("edge_cls_out").toString
    import spark.implicits._
    Seq((1L, "the quick brown fox jumps over the dog"),
        (2L, "alpha beta gamma delta"),
        (3L, "one"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    EdgeRunner.run(spark, EdgeRunner.parse(
      Array("--mode", "classify", "--in", s"file:$in", "--out", out)))
    val got = spark.read.parquet(s"$out/classified")
    assert(got.count() == 3)
    // landed rows must carry the same scores as the library path, and
    // keep must partition on score > 0
    val lib = graft.operators.TextAnalysis
      .hashedLinearScore(spark.read.parquet(in), "doc_id", "text")
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    // keep comes back as a PARTITION column — cast pins its type
    // regardless of partition-value inference
    val landed = got.select(col("doc_id"), col("score"),
        col("keep").cast("boolean"))
      .as[(Long, Long, Boolean)].collect()
    assert(landed.forall { case (id, sc, k) => lib(id) == sc && k == (sc > 0) })
  }

  test("--mode audit --repair heals a MANAGED near-dup family from the landed docs") {
    import spark.implicits._
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val name = "edge_heal_nd"
    val docsDir = Files.createTempDirectory("edge_heal_docs").toString + "/corpus_docs"
    val day = "2026-08-10"
    try {
      val boot = corpus.filter(col("doc_id") % 3 === 0)
      graft.operators.Dedup.saveNearDupKeys(spark, name, boot, "doc_id", "text")
      // the bootstrap corpus lives in the landing too (a real
      // pipeline's landing holds everything ever kept), so the audit
      // sees `base` in every member
      graft.sources.Connectors.overwritePartitions(
        boot.withColumn("ingest_id",
          org.apache.spark.sql.functions.lit("base")), docsDir, Seq("ingest_id"))
      // day1: docs land in the ingest-partitioned corpus landing AND
      // both key tables get the ingest...
      val day1 = corpus.filter(col("doc_id") % 3 === 1)
      graft.sources.Connectors.overwritePartitions(
        day1.withColumn("ingest_id",
          org.apache.spark.sql.functions.lit(day)), docsDir, Seq("ingest_id"))
      graft.operators.Dedup.appendNearDupKeys(spark, name, day1,
        "doc_id", "text", ingestId = day)
      // ...then the crash window is simulated by dropping the SECOND
      // table's partition (appendNearDupKeys writes _ndband, then
      // _ndsh — a crash between them leaves exactly this state)
      spark.sql(s"ALTER TABLE ${name}_ndsh DROP IF EXISTS " +
        s"PARTITION (ingest_id='$day')")
      val members = s"parquet:$docsDir,${name}_ndband,${name}_ndsh"
      def audit() = EdgeRunner.runAudit(spark, EdgeRunner.parse(Array(
        "--mode", "audit", "--in", "unused:", "--table", members)))
      assert(audit() == Seq(day), "the half-landed ingest must be flagged")
      val shBefore = spark.table(s"${name}_ndsh").count()
      // heal: family inferred from the member suffixes, batch read
      // back from the landing's ingest partition, both tables
      // re-appended idempotently
      val (healed, manual) = EdgeRunner.runRepair(spark, EdgeRunner.parse(Array(
        "--mode", "audit", "--in", s"parquet:$docsDir",
        "--table", members, "--repair", "true")), Seq(day))
      assert(healed == Seq(day) && manual.isEmpty)
      assert(audit() == Seq.empty, "audit must be clean after the heal")
      // the healed shingle rows are exactly the batch's keys, and the
      // surviving band half was replaced with identical rows
      assert(spark.table(s"${name}_ndsh").count() == shBefore + day1.count())
      val expected = graft.operators.Dedup
        .nearDupKeys(day1, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
      assert(spark.table(s"${name}_ndsh")
        .filter(col("ingest_id") === day)
        .select("doc_id").as[Long].collect().toSet == expected)
    } finally for (t <- Seq(s"${name}_ndband", s"${name}_ndsh"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("maintenance lifecycle e2e: bootstrap, ingests, replay, audit, crash, repair, compact, recall loop") {
    import spark.implicits._
    // the whole daily story the maintenance family supports, composed
    // the way an operator would actually run it — each op is spec'd
    // alone elsewhere; THIS is the composition check, with
    // row-exactness asserted at every stage
    val root = Files.createTempDirectory("edge_life").toString
    val out = s"$root/data"
    val docsDir = s"$out/corpus_docs"
    val keysDir = s"$root/keys"
    val texts = Map(
      "A" -> "the quick brown fox jumps over the lazy dog again today",
      "B" -> "rainfall statistics across four decades of measurements",
      "C" -> "entirely novel content about catalyst physical planning",
      "D" -> "vier jahrzehnte niederschlag statistik aus den bergen heute",
      "E" -> "seventeen sleepy badgers watch from the mossy riverbank",
      "F" -> "broadcast joins beat shuffles when one side is tiny",
      "G" -> "dynamic partition overwrite makes retried ingests idempotent",
      "H" -> "bucketed tables keep their sort order across compactions",
      "I" -> "watermarks bound state growth in streaming aggregations")
    def dayFile(day: Int, docs: Seq[(Int, String)]): String = {
      val dir = Files.createTempDirectory(s"edge_life_in$day").toString
      writeLines(dir, "b.json", docs.map { case (id, key) =>
        s"""{"doc_id":$id,"text":"${texts(key)}","lang":"en","source":"web"}"""
      })
      dir
    }
    def id(day: Int) = f"2026-08-$day%02d"
    def dedupArgs(day: Int, in: String, extra: String*): Array[String] =
      Array("--mode", "dedup", "--in", s"file:$in", "--out", out,
        "--ingest-id", id(day)) ++ extra
    def dedup(day: Int, in: String): Long =
      EdgeRunner.runDedup(spark, EdgeRunner.parse(
        dedupArgs(day, in, "--known-keys", keysDir)))
    def maintain(day: Int): Long =
      EdgeRunner.runMaintain(spark, EdgeRunner.parse(Array("--mode", "maintain",
        "--in", s"parquet:$docsDir", "--known-keys", keysDir,
        "--ingest-id", id(day))))
    def audit(): Seq[String] =
      EdgeRunner.runAudit(spark, EdgeRunner.parse(Array("--mode", "audit",
        "--in", "unused:", "--table", s"parquet:$docsDir,parquet:$keysDir")))
    def landedIds(): Set[Long] = spark.read.parquet(docsDir)
      .select("doc_id").as[Long].collect().toSet
    def keyRows(): Long = spark.read.parquet(keysDir).count()

    // day 1 bootstrap: dedup against an explicitly EMPTY known corpus
    // (an absent key dir must stay a loud failure, not an implicit
    // bootstrap), then key what landed
    val emptyKnown = s"$root/empty_known"
    Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(emptyKnown)
    val in1 = dayFile(1, Seq(1 -> "A", 2 -> "B", 3 -> "C"))
    assert(EdgeRunner.runDedup(spark, EdgeRunner.parse(
      dedupArgs(1, in1, "--known", emptyKnown))) == 3L)
    assert(maintain(1) == 3L)
    // day 2, CRASH-AND-RETRIED at each stage: a dedup retried before
    // maintain replaces its own landing partition (same survivors —
    // its keys aren't landed yet); a retried maintain replaces its key
    // partition; and a FULL-day replay after completion is a no-op —
    // the day's own keys now suppress its content (kept = 0) while
    // landing and keys stay byte-identical
    val in2 = dayFile(2, Seq(4 -> "D", 5 -> "E"))
    assert(dedup(2, in2) == 2L)
    assert(dedup(2, in2) == 2L, "pre-maintain dedup retry sees the same survivors")
    assert(maintain(2) == 2L)
    assert(maintain(2) == 2L, "maintain retry replaces its partition")
    assert(dedup(2, in2) == 0L, "post-maintain replay is suppressed by own keys")
    assert(landedIds() == Set(1L, 2L, 3L, 4L, 5L) && keyRows() == 5L,
      "replayed day must not duplicate docs or keys")
    // day 3: a re-post of day 1 content drops, the novel doc lands
    val in3 = dayFile(3, Seq(6 -> "A", 7 -> "F"))
    assert(dedup(3, in3) == 1L)
    assert(maintain(3) == 1L)
    assert(landedIds() == Set(1L, 2L, 3L, 4L, 5L, 7L))
    assert(audit() == Seq.empty, "healthy family must audit clean")

    // day 4 CRASH between the family's two writes: docs land, the
    // maintain never runs — the audit must notice what no retry heals
    val in4 = dayFile(4, Seq(8 -> "G", 9 -> "H"))
    assert(dedup(4, in4) == 2L)
    assert(audit() == Seq(id(4)), "half-landed ingest must be flagged")
    // the one-stop dashboard (--mode status) attributes the same crash
    // to the family without hand-composing the audit invocation
    val manifest = Files.createTempFile("life_status", ".manifest")
    Files.write(manifest, java.util.Arrays.asList(
      s"corpus: parquet:$docsDir,parquet:$keysDir"))
    def statusRows(): Seq[(String, String, String)] =
      EdgeRunner.runStatus(spark, EdgeRunner.parse(Array(
        "--mode", "status", "--in", "unused:",
        "--manifest", manifest.toString)))
    assert(statusRows().contains(("corpus", id(4), "inconsistent")),
      "dashboard must attribute the half-landed ingest")
    assert(statusRows().count(_._3 == "inconsistent") == 1)
    // ...and --repair heals it from the landed docs partition alone
    EdgeRunner.run(spark, EdgeRunner.parse(Array("--mode", "audit",
      "--in", s"parquet:$docsDir", "--table",
      s"parquet:$docsDir,parquet:$keysDir", "--known-keys", keysDir,
      "--repair", "true")))
    assert(audit() == Seq.empty, "audit must be clean after --repair")
    assert(statusRows().forall(_._3 != "inconsistent"),
      "dashboard must read clean after --repair")
    assert(keyRows() == 8L)
    // the healed keys are SEMANTICALLY right: day 5's re-post of day-4
    // content is dropped by the repaired key table
    val in5 = dayFile(5, Seq(10 -> "G", 11 -> "I"))
    assert(dedup(5, in5) == 1L)
    assert(maintain(5) == 1L)
    assert(landedIds() == Set(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L, 11L))
    assert(audit() == Seq.empty)

    // compact the key dir, keep-last honoring WRITE time (date ids
    // sort before "base"; retention must still keep day 5)
    val beforeKeys = spark.read.parquet(keysDir)
      .select("__norm_key").as[String].collect().toSet
    EdgeRunner.runCompact(spark, EdgeRunner.parse(Array("--mode", "compact",
      "--in", "unused:", "--known-keys", keysDir, "--keep-last", "1")))
    assert(spark.read.parquet(keysDir).select("ingest_id").distinct()
      .as[String].collect().toSet == Set("base", id(5)),
      "newest ingest survives compaction; base absorbs the rest")
    assert(spark.read.parquet(keysDir).select("__norm_key")
      .as[String].collect().toSet == beforeKeys && keyRows() == 9L)
    // the kept ingest is STILL replayable post-compaction
    assert(maintain(5) == 1L)
    assert(keyRows() == 9L, "post-compact replay of the kept id must not append")
    // and the compacted keys still suppress re-posts of EVERY batch
    val in6 = dayFile(6, Seq(20 -> "A", 21 -> "D", 22 -> "G", 23 -> "I"))
    assert(dedup(6, in6) == 0L)
    // compaction is a FAMILY operation: folding only the key dir
    // diverges the members' ingest-partition sets and the audit
    // (correctly) flags every folded id — compact the landing with the
    // same retention and the family is consistent again
    EdgeRunner.runCompact(spark, EdgeRunner.parse(Array("--mode", "compact",
      "--in", "unused:", "--known-keys", docsDir,
      "--partition-by", "lang,ingest_id", "--keep-last", "1")))
    assert(audit() == Seq.empty,
      "family compacted with the same retention must audit clean")
    assert(landedIds() == Set(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L, 11L))

    // a deletion request against the landing: doc 8 (now folded into
    // the base partition) vanishes from the corpus, the content
    // FINGERPRINT is retained by design — so a re-post of the
    // forgotten text is still suppressed (the content must not come
    // back via another upload), and the family still audits clean
    // (the base partition survives with its other docs; forgetting an
    // ingest's ONLY doc would drop that docs partition and the audit
    // would — correctly — flag the keys-only id for key compaction)
    EdgeRunner.run(spark, EdgeRunner.parse(Array("--mode", "forget",
      "--ids", "8", "--in", s"parquet:$docsDir",
      "--partition-by", "lang,ingest_id")))
    assert(!landedIds().contains(8L), "forgotten doc must leave the landing")
    val in7 = dayFile(7, Seq(30 -> "G"))
    assert(dedup(7, in7) == 0L,
      "re-post of forgotten content must stay suppressed (fingerprints retained)")
    assert(audit() == Seq.empty)

    // the ANN wing of the same cadence: bootstrap index -> ingest
    // append -> recall-check OK -> drifted append -> RETRAIN ->
    // --mode retrain -> OK at the original nProbe
    val rnd = new scala.util.Random(29)
    def gauss(n: Int, sd: Double) = Seq.fill(n)(rnd.nextGaussian() * sd)
    val name = "life_ivf"
    try {
      for (t <- Seq(s"${name}_centroids", s"${name}_assignments"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
      val modes = (0 until 20).map(i => (i.toLong,
        (if (i % 2 == 0) 10.0 else -10.0) +: gauss(7, 0.1)))
      graft.operators.Similarity.saveIvfIndex(spark,
        graft.operators.Similarity.ivfIndex(modes.toDF("id", "vec"),
          nCentroids = 2, iters = 3), name)
      // day ingest: more of the same modes — healthy append
      val more = (100 until 120).map(i => (i.toLong,
        (if (i % 2 == 0) 10.0 else -10.0) +: gauss(7, 0.1)))
      graft.operators.Similarity.appendToIvfIndex(spark, name,
        more.toDF("id", "vec"), ingestId = id(5))
      def recall() = EdgeRunner.runRecallCheck(spark, EdgeRunner.parse(Array(
        "--mode", "recall-check", "--in", "unused:", "--index", name,
        "--k", "2", "--nprobe", "1", "--sample", "200")))
      assert(recall().recall == 1.0, "healthy append must keep recall")
      // drifted day: boundary-straddling twin pairs (the RecallSpec
      // geometry) — verdict flips
      val drift = (0 until 15).flatMap { i =>
        val w = gauss(6, 1.0)
        Seq((300L + 2 * i, Seq(0.1, 5.0) ++ w),
          (301L + 2 * i, Seq(-0.1, 5.0) ++ w))
      }
      graft.operators.Similarity.appendToIvfIndex(spark, name,
        drift.toDF("id", "vec"), ingestId = id(6))
      assert(recall().retrain, "boundary-straddling drift must trip RETRAIN")
      // ACT on the verdict through the CLI; verdict flips back
      EdgeRunner.run(spark, EdgeRunner.parse(Array("--mode", "retrain",
        "--in", "unused:", "--index", name, "--centroids", "3")))
      assert(!recall().retrain, "retrain must restore recall at the same nProbe")
    } finally for (t <- Seq(s"${name}_centroids", s"${name}_assignments"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("parse rejects bad modes and missing inputs") {
    intercept[RuntimeException](EdgeRunner.parse(Array("--mode", "nope", "--in", "x")))
    intercept[RuntimeException](EdgeRunner.parse(Array("--mode", "batch")))
    val cfg = EdgeRunner.parse(Array("--mode", "stream", "--in", "file:/x"))
    intercept[IllegalArgumentException](EdgeRunner.startStream(spark, cfg))
    // a flag missing its value must fail loudly, not silently re-pair
    intercept[IllegalArgumentException](
      EdgeRunner.parse(Array("--mode", "batch", "--in", "--out", "/tmp/x")))
    intercept[IllegalArgumentException](
      EdgeRunner.parse(Array("--mode", "batch", "--in")))
  }

  test("stream->retrieval loop closure: landAndMaintain appends lexical + IVF members per batch, committed, replay-idempotent") {
    import spark.implicits._
    import graft.operators.{Similarity, TextAnalysis}
    import graft.sources.FamilyCommit
    val out = Files.createTempDirectory("edge_loopc_out").toString
    val keysDir = Files.createTempDirectory("edge_loopc_keys").toString + "/keys"
    val lex = "edge_slex"; val ivfN = "edge_sivf"; val lexOpen = "edge_slex_open"
    val tables = Seq(s"${lex}_post", s"${lex}_lexstats", s"${lex}_commits",
      s"${lexOpen}_post", s"${lexOpen}_lexstats",
      s"${ivfN}_centroids", s"${ivfN}_assignments", s"${ivfN}_commits")
    try {
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      // bootstrap the retrieval families over a seed corpus; markers
      // ENFORCED for lex/ivf (base committed), lexOpen stays legacy-open
      val seed = Seq(
        (1L, "alpha beta gamma delta shared corpus tokens"),
        (2L, "totally different seed document about rainfall"))
        .toDF("doc_id", "text")
      TextAnalysis.saveLexicalIndex(spark, lex, seed, "doc_id", "text")
      FamilyCommit.commit(spark, lex, "base")
      TextAnalysis.saveLexicalIndex(spark, lexOpen, seed, "doc_id", "text")
      val seedVecs = Seq((1L, Seq(8.0, 0.0, 0.0, 0.0)),
        (2L, Seq(-8.0, 0.0, 0.0, 0.0))).toDF("id", "vec")
      Similarity.saveIvfIndex(spark,
        Similarity.ivfIndex(seedVecs, nCentroids = 2, iters = 2), ivfN)
      FamilyCommit.commit(spark, ivfN, "base")

      // a micro-batch of stream survivors, embeddings riding
      val ts = java.sql.Timestamp.valueOf("2025-01-01 10:00:00")
      val batch = Seq(
        (10L, "zeppelin quartz mamba streaming unique words", ts,
          Seq(7.5, 0.5, 0.0, 0.0)),
        (11L, "entirely other streaming content about quartz", ts,
          Seq(-7.5, 0.5, 0.0, 0.0)))
        .toDF("doc_id", "text", "ts", "vec").persist()
      EdgeRunner.landAndMaintain(batch, 7L, out, keysDir,
        lexPrefix = Some(lex), ivfName = Some(ivfN))

      // retrievable via the PERSISTED lexical probe immediately
      val qterms = Seq((1L, "zeppelin"), (1L, "quartz")).toDF("query_id", "term")
      def bm25Docs(): Set[Long] =
        TextAnalysis.bm25FromTables(spark, lex, qterms, topN = 10)
          .select("doc_id").as[Long].collect().toSet
      val hits = bm25Docs()
      assert(hits.contains(10L) && hits.contains(11L),
        s"stream-landed docs must be BM25-retrievable after the batch: $hits")
      // ...and via the gated ANN probe
      val probed = Similarity.ivfTopK(
        Seq((99L, Seq(7.5, 0.5, 0.0, 0.0))).toDF("id", "vec"),
        Similarity.loadIvfIndex(spark, ivfN), k = 1, nProbe = 1)
        .select("neighbor_id").as[Long].head()
      assert(probed == 10L, s"stream vector must be the nearest neighbor: $probed")
      // one marker per family, under the batch's padded ingest id
      val ing = "stream000000000007"
      assert(FamilyCommit.committedIds(spark, lex).exists(_.contains(ing)))
      assert(FamilyCommit.committedIds(spark, ivfN).exists(_.contains(ing)))
      // a legacy-open family is NEVER flipped to enforced by the sink
      EdgeRunner.landAndMaintain(batch, 8L, out, keysDir,
        lexPrefix = Some(lexOpen))
      assert(!FamilyCommit.enabled(spark, lexOpen),
        "the stream sink must not create a _commits table for an open family")
      assert(TextAnalysis.bm25FromTables(spark, lexOpen, qterms, topN = 10)
        .select("doc_id").as[Long].collect().toSet.contains(10L))

      // REPLAY: the same batch id replaces its own partitions — rows,
      // postings, assignments and the bm25 answer all unchanged
      val postBefore = spark.table(s"${lex}_post").count()
      val assignBefore = spark.table(s"${ivfN}_assignments").count()
      EdgeRunner.landAndMaintain(batch, 7L, out, keysDir,
        lexPrefix = Some(lex), ivfName = Some(ivfN))
      assert(spark.table(s"${lex}_post").count() == postBefore)
      assert(spark.table(s"${ivfN}_assignments").count() == assignBefore)
      assert(bm25Docs() == hits)
      batch.unpersist()
    } finally tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
