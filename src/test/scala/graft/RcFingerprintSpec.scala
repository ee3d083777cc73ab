package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Forget}
import graft.sources.FamilyCommit

/** The strict-erasure exact-dedup variant: refcounted content
  * fingerprints (`{name}_normrc`). Forget decrements; a fingerprint
  * whose last holder is forgotten leaves the live set immediately
  * (re-posts ADMITTED — the opposite of the default `_norm` contract,
  * by choice) while one still carried by another doc stays suppressed;
  * compaction physically erases dead keys; every write is
  * replay-idempotent. */
class RcFingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val a = "alpha content shared by two documents in this corpus"
  private val b = "beta content held by exactly one document here"
  private val c = "gamma content also held once in the corpus body"
  private val novel = "entirely new content never seen by the family before"

  private def live(name: String): Set[String] =
    Dedup.liveFingerprints(spark, name).as[String].collect().toSet

  /** Driver-side twin of [[graft.functions.TextOps.fingerprint]]. */
  private def fp(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.toLowerCase.trim.replaceAll("\\s+", " ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def keptIds(name: String, batch: Seq[(Long, String)]): Set[Long] =
    Dedup.exactKeepFromRcTable(spark, batch.toDF("doc_id", "text"),
      name, "doc_id", "text").select("doc_id").as[Long].collect().toSet

  private def drop(name: String): Unit =
    for (t <- Seq(s"${name}_normrc", s"${name}_commits"))
      spark.sql(s"DROP TABLE IF EXISTS $t")

  test("forget decrements: fp retained while another doc holds it, gone with the last holder; re-post pinned both ways") {
    val name = "rcspec_core"
    try {
      val corpus = Seq((1L, a), (2L, a), (3L, b), (4L, c)).toDF("doc_id", "text")
      Dedup.saveRcFingerprints(spark, name, corpus, "text")
      assert(live(name).size == 3) // a, b, c — a counted once, rc 2
      // admission: known content suppressed, novel admitted
      assert(keptIds(name, Seq((10L, a), (11L, novel))) == Set(11L))

      // forget doc 1 — content `a` still held by doc 2
      val n1 = Forget.forgetFingerprints(spark, name,
        corpus.filter(col("doc_id") === 1L), "text", "req1")
      assert(n1 == 1L)
      assert(live(name).size == 3) // rc(a) = 2 - 1 = 1: still live
      assert(keptIds(name, Seq((10L, a))) == Set.empty[Long]) // still suppressed

      // forget doc 2 — the LAST holder of `a`
      Forget.forgetFingerprints(spark, name,
        corpus.filter(col("doc_id") === 2L), "text", "req2")
      assert(live(name).size == 2) // a is dead
      // strict-erasure re-post behavior: the content is admitted again
      assert(keptIds(name, Seq((10L, a), (12L, b))) == Set(10L))
    } finally drop(name)
  }

  test("append == rebuild; append replay is idempotent") {
    val name = "rcspec_append"
    val name2 = "rcspec_rebuild"
    try {
      val base = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      val batch = Seq((3L, a), (4L, c)).toDF("doc_id", "text")
      Dedup.saveRcFingerprints(spark, name, base, "text")
      Dedup.appendRcFingerprints(spark, name, batch, "text", "day1")
      Dedup.saveRcFingerprints(spark, name2, base.unionByName(batch), "text")
      def totals(n: String): Map[String, Long] =
        spark.table(s"${n}_normrc").groupBy("__norm_key")
          .agg(sum("rc").as("rc")).as[(String, Long)].collect().toMap
      assert(totals(name) == totals(name2))
      assert(totals(name)(fp(a)) == 2L)
      // replay: the same ingest id overwrites its own partition
      Dedup.appendRcFingerprints(spark, name, batch, "text", "day1")
      assert(totals(name) == totals(name2))
    } finally { drop(name); drop(name2) }
  }

  test("forget replay is idempotent; a retry after the landing delete is a no-op") {
    val name = "rcspec_replay"
    try {
      val corpus = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      Dedup.saveRcFingerprints(spark, name, corpus, "text")
      val victims = corpus.filter(col("doc_id") === 1L)
      Forget.forgetFingerprints(spark, name, victims, "text", "reqX")
      val after = spark.table(s"${name}_normrc")
        .collect().map(_.toSeq.toList).toSet
      // identical request id → identical ledger partition
      Forget.forgetFingerprints(spark, name, victims, "text", "reqX")
      assert(spark.table(s"${name}_normrc")
        .collect().map(_.toSeq.toList).toSet == after)
      // retry AFTER the landing delete: victims are gone — zero
      // matched rows, dynamic overwrite writes nothing, ledger intact
      Forget.forgetFingerprints(spark, name,
        corpus.filter(lit(false)), "text", "reqX")
      assert(spark.table(s"${name}_normrc")
        .collect().map(_.toSeq.toList).toSet == after)
      assert(live(name).size == 1)
    } finally drop(name)
  }

  test("compaction physically erases dead keys — including via a kept negative ledger — and preserves live totals") {
    val name = "rcspec_compact"
    try {
      Dedup.saveRcFingerprints(spark, name,
        Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text"), "text")
      Dedup.appendRcFingerprints(spark, name,
        Seq((4L, c)).toDF("doc_id", "text"), "text", "day1")
      // kill `b` (last holder) via a forget ledger
      Forget.forgetFingerprints(spark, name,
        Seq((3L, b)).toDF("doc_id", "text"), "text", "reqB")
      val fpB = fp(b)
      assert(!live(name).contains(fpB))
      // keepLast = 1 keeps the newest partition (the forget ledger):
      // the key must STILL be erased — a per-partition filter would
      // drop only the negative row and resurrect it
      Dedup.compactRcFingerprints(spark, name, keepLast = 1)
      val raw = spark.table(s"${name}_normrc")
        .select("__norm_key", "rc").as[(String, Long)].collect().toSeq
      assert(!raw.exists(_._1 == fpB)) // physically gone, every partition
      assert(!live(name).contains(fpB))
      val totals = raw.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(totals(fp(a)) == 2L)
      assert(totals(fp(c)) == 1L)
      // full fold: everything in base, one row per live key
      Dedup.compactRcFingerprints(spark, name)
      assert(spark.table(s"${name}_normrc").count() == 2L)
      assert(live(name).size == 2)
    } finally drop(name)
  }

  test("commit markers gate the family; the forget ledger commits its own marker") {
    val name = "rcspec_commits"
    try {
      Dedup.saveRcFingerprints(spark, name,
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "text")
      FamilyCommit.commit(spark, name, "base") // opt in
      // an UNCOMMITTED append is invisible to the live set
      Dedup.appendRcFingerprints(spark, name,
        Seq((3L, c)).toDF("doc_id", "text"), "text", "day1")
      assert(live(name).size == 2)
      FamilyCommit.commit(spark, name, "day1")
      assert(live(name).size == 3)
      // the forget ledger lands WITH its marker (single-member family)
      Forget.forgetFingerprints(spark, name,
        Seq((2L, b)).toDF("doc_id", "text"), "text", "reqM")
      assert(live(name).size == 2)
    } finally drop(name)
  }

  test("model check: any interleaving of append/forget/compact preserves the reference live set") {
    // reference model: docId -> content for alive docs; live fp =
    // contents with a positive holder count. Ops drawn from a small
    // content alphabet so refcounts collide across ingests.
    val alphabet = Vector(a, b, c, novel,
      "fifth distinct content string for the model alphabet here",
      "sixth distinct content string rounding out the alphabet pool")
    for (seed <- Seq(11, 23, 47)) {
      val name = s"rcspec_model$seed"
      try {
        val rnd = new scala.util.Random(seed)
        var nextId = 0L
        var docs = Map.empty[Long, String] // alive docs
        def modelLive(): Set[String] =
          docs.values.groupBy(identity).keySet.map(fp)
        def freshBatch(): Seq[(Long, String)] = {
          val n = 1 + rnd.nextInt(4)
          (0 until n).map { _ =>
            nextId += 1
            nextId -> alphabet(rnd.nextInt(alphabet.size))
          }
        }
        val boot = freshBatch()
        docs ++= boot
        Dedup.saveRcFingerprints(spark, name, boot.toDF("doc_id", "text"), "text")
        for (op <- 0 until 8) {
          rnd.nextInt(3) match {
            case 0 => // append a fresh ingest
              val batch = freshBatch()
              docs ++= batch
              Dedup.appendRcFingerprints(spark, name,
                batch.toDF("doc_id", "text"), "text", s"i$op")
            case 1 => // forget a random subset (possibly stale ids)
              val pool = docs.keys.toSeq.sorted ++ Seq(-1L)
              val ids = rnd.shuffle(pool).take(1 + rnd.nextInt(3))
              val victims = docs.filter { case (id, _) => ids.contains(id) }
              Forget.forgetFingerprints(spark, name,
                victims.toSeq.toDF("doc_id", "text"), "text", s"r$op")
              docs --= victims.keys
            case 2 => // compact at a random retention
              Dedup.compactRcFingerprints(spark, name, rnd.nextInt(2))
          }
          assert(live(name) == modelLive(),
            s"seed=$seed op=$op: live set diverged from the model")
        }
      } finally drop(name)
    }
  }

  test("CLI lifecycle: maintain bootstraps then appends the rc family; compact erases what forget killed") {
    val name = "rcspec_life"
    val tmp = java.nio.file.Files.createTempDirectory("rc_life").toString
    val keysDir = s"$tmp/keys"
    try {
      // day 0: bootstrap from the base corpus
      val day0 = s"$tmp/day0"
      Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
        .write.parquet(day0)
      def maintainDay0(): Unit = graft.tools.EdgeRunner.runMaintain(spark,
        graft.tools.EdgeRunner.parse(
          Array("--mode", "maintain", "--in", s"parquet:$day0",
            "--known-keys", keysDir, "--ingest-id", "day0",
            "--fingerprints", name, "--rc-bootstrap", "true")))
      // the bootstrap is EXPLICIT: the implicit append path on a
      // missing family must fail loudly (a current-batch-only
      // bootstrap would leave prior holders uncounted)
      val noBoot = intercept[IllegalArgumentException] {
        graft.tools.EdgeRunner.runMaintain(spark,
          graft.tools.EdgeRunner.parse(
            Array("--mode", "maintain", "--in", s"parquet:$day0",
              "--known-keys", keysDir, "--ingest-id", "day0",
              "--fingerprints", name)))
      }
      assert(noBoot.getMessage.contains("--rc-bootstrap"))
      maintainDay0()
      assert(live(name).size == 2)
      // a crashed-and-retried BOOTSTRAP must not double-count: the
      // retry lands under the same replay key, so dynamic overwrite
      // replaces its own partition
      maintainDay0()
      assert(spark.table(s"${name}_normrc").groupBy("__norm_key")
        .agg(sum("rc").as("rc")).as[(String, Long)].collect().toMap
        .values.toSeq.sorted == Seq(1L, 2L),
        "bootstrap retry must not inflate refcounts")
      // day 1: per-ingest ledger append
      val day1 = s"$tmp/day1"
      Seq((4L, c)).toDF("doc_id", "text").write.parquet(day1)
      graft.tools.EdgeRunner.runMaintain(spark, graft.tools.EdgeRunner.parse(
        Array("--mode", "maintain", "--in", s"parquet:$day1",
          "--known-keys", keysDir, "--ingest-id", "day1",
          "--fingerprints", name)))
      assert(live(name).size == 3)
      // --rc-bootstrap on an ESTABLISHED family must refuse: a
      // full-landing recount would double every appended holder
      val reBoot = intercept[IllegalArgumentException] {
        graft.tools.EdgeRunner.runMaintain(spark,
          graft.tools.EdgeRunner.parse(
            Array("--mode", "maintain", "--in", s"parquet:$day1",
              "--known-keys", keysDir, "--ingest-id", "day2",
              "--fingerprints", name, "--rc-bootstrap", "true")))
      }
      assert(reBoot.getMessage.contains("established"))
      // forget b's last holder, then compact: the dead key leaves disk
      Forget.forgetFingerprints(spark, name,
        Seq((3L, b)).toDF("doc_id", "text"), "text", "reqL")
      graft.tools.EdgeRunner.runCompact(spark, graft.tools.EdgeRunner.parse(
        Array("--mode", "compact", "--in", "unused:",
          "--fingerprints", name, "--keep-last", "0")))
      assert(live(name) == Set(fp(a), fp(c)))
      assert(!spark.table(s"${name}_normrc").select("__norm_key")
        .as[String].collect().contains(fp(b)))
    } finally {
      drop(name)
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("CLI: a prior crashed landing swap is recovered BEFORE the decrement reads victims") {
    import org.apache.hadoop.fs.Path
    val name = "rcspec_swap"
    val tmp = java.nio.file.Files.createTempDirectory("rc_swap").toString
    val docsDir = s"$tmp/landing"
    try {
      val corpus = Seq((1L, a, "en"), (2L, b, "en"), (3L, c, "fr"))
        .toDF("doc_id", "text", "lang")
      corpus.withColumn("ingest_id", lit("base"))
        .write.mode("overwrite").partitionBy("lang", "ingest_id")
        .parquet(docsDir)
      Dedup.saveRcFingerprints(spark, name, corpus, "text")
      // fabricate a PRIOR forget's crash between its renames: the
      // partition's complete copy sits staged as __forgetting, the
      // live dir is gone — a victim read taken before recovery would
      // see no texts and the decrement would be lost forever (the
      // retry finds the docs already deleted: zero rows, no heal)
      val base = new Path(docsDir)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val qBase = fs.makeQualified(base)
      val part = fs.globStatus(new Path(qBase, "*/ingest_id=base"))
        .map(_.getPath).find(_.toString.contains("lang=en")).get
      val side = new Path(
        new Path(qBase.getParent, "_" + qBase.getName + "__forget"),
        part.toString.stripPrefix(qBase.toString).stripPrefix("/")
          + "__forgetting")
      fs.mkdirs(side.getParent)
      assert(fs.rename(part, side))
      // the staged partition is invisible; only the fr doc reads
      assert(spark.read.parquet(docsDir).select("doc_id")
        .as[Long].collect().toSet == Set(3L))
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "forget", "--ids", "2", "--in", s"parquet:$docsDir",
        "--partition-by", "lang,ingest_id", "--fingerprints", name,
        "--ingest-id", "req-swap")))
      // the recovery preamble restored the partition FIRST, so the
      // victim's text was read and b's last holder decremented
      assert(live(name) == Set(fp(a), fp(c)),
        "decrement must see victims hidden by a crashed prior swap")
      assert(spark.read.parquet(docsDir).select("doc_id")
        .as[Long].collect().toSet == Set(1L, 3L))
    } finally {
      drop(name)
      val p = new Path(tmp)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("CLI: --mode forget --fingerprints decrements before the landing delete; rerun is a no-op") {
    val name = "rcspec_cli"
    val docsDir = java.nio.file.Files.createTempDirectory("rc_cli")
      .toString + "/corpus_docs"
    try {
      val corpus = Seq((1L, a, "en"), (2L, a, "en"), (3L, b, "en"))
        .toDF("doc_id", "text", "lang")
      graft.sources.Connectors.overwritePartitions(
        corpus.withColumn("ingest_id", lit("base")),
        docsDir, Seq("lang", "ingest_id"))
      Dedup.saveRcFingerprints(spark, name, corpus, "text")
      def runOnce(): Unit = graft.tools.EdgeRunner.run(spark,
        graft.tools.EdgeRunner.parse(Array(
          "--mode", "forget", "--ids", "2,3",
          "--in", s"parquet:$docsDir",
          "--partition-by", "lang,ingest_id",
          "--fingerprints", name, "--ingest-id", "req-cli")))
      runOnce()
      assert(spark.read.parquet(docsDir).select("doc_id")
        .as[Long].collect().toSet == Set(1L))
      // a still held by doc 1; b's last holder forgotten
      assert(live(name) == Set(fp(a)))
      val snapshot = spark.table(s"${name}_normrc")
        .collect().map(_.toSeq.toList).toSet
      runOnce() // replay: victims already gone — everything unchanged
      assert(spark.table(s"${name}_normrc")
        .collect().map(_.toSeq.toList).toSet == snapshot)
      assert(live(name) == Set(fp(a)))
    } finally {
      drop(name)
      val p = new org.apache.hadoop.fs.Path(docsDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }

  test("CLI: --rc-bootstrap counts the FULL landing, so forgetting one old holder keeps still-held content live") {
    val name = "rcspec_boot"
    val tmp = java.nio.file.Files.createTempDirectory("rc_boot").toString
    val docsDir = s"$tmp/landing"
    val keysDir = s"$tmp/keys"
    try {
      // a SHARED landing with two PRIOR ingests already on disk —
      // the family is enabled late, after the corpus exists. Content
      // `a` is held by docs in BOTH prior ingests.
      graft.sources.Connectors.overwritePartitions(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text")
          .withColumn("ingest_id", lit("old0")), docsDir, Seq("ingest_id"))
      graft.sources.Connectors.overwritePartitions(
        Seq((3L, a)).toDF("doc_id", "text")
          .withColumn("ingest_id", lit("old1")), docsDir, Seq("ingest_id"))
      graft.tools.EdgeRunner.runMaintain(spark, graft.tools.EdgeRunner.parse(
        Array("--mode", "maintain", "--in", s"parquet:$docsDir",
          "--known-keys", keysDir, "--ingest-id", "old1",
          "--fingerprints", name, "--rc-bootstrap", "true")))
      // every prior holder counted: rc(a) = 2, not the scoped batch's 1
      assert(spark.table(s"${name}_normrc").groupBy("__norm_key")
        .agg(sum("rc").as("rc")).as[(String, Long)].collect().toMap
        .apply(fp(a)) == 2L)
      // forgetting the old1 holder leaves `a` live (old0's copy holds it)
      Forget.forgetFingerprints(spark, name,
        Seq((3L, a)).toDF("doc_id", "text"), "text", "reqB")
      assert(live(name) == Set(fp(a), fp(b)),
        "still-held content must survive forgetting one old holder")
      // COVERED-SET guard: the bootstrap already counted old0's
      // holders — a later plain append for old0 (e.g. backfilling the
      // key dir for a pre-bootstrap day with --fingerprints riding the
      // standard flags) would land them a SECOND time (rc inflation,
      // content that must erase staying live) and must refuse
      val dbl = intercept[IllegalArgumentException] {
        graft.tools.EdgeRunner.runMaintain(spark, graft.tools.EdgeRunner.parse(
          Array("--mode", "maintain", "--in", s"parquet:$docsDir",
            "--known-keys", keysDir, "--ingest-id", "old0",
            "--fingerprints", name)))
      }
      assert(dbl.getMessage.contains("already counted"), dbl.getMessage)
      // a genuinely NEW ingest still appends normally
      graft.sources.Connectors.overwritePartitions(
        Seq((9L, novel)).toDF("doc_id", "text")
          .withColumn("ingest_id", lit("new2")), docsDir, Seq("ingest_id"))
      graft.tools.EdgeRunner.runMaintain(spark, graft.tools.EdgeRunner.parse(
        Array("--mode", "maintain", "--in", s"parquet:$docsDir",
          "--known-keys", keysDir, "--ingest-id", "new2",
          "--fingerprints", name)))
      assert(live(name) == Set(fp(a), fp(b), fp(novel)))
    } finally {
      drop(name)
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("CLI: two distinct forget requests over the SAME id set land distinct ledger partitions") {
    val name = "rcspec_reqid"
    val tmp = java.nio.file.Files.createTempDirectory("rc_reqid").toString
    val docsDir = s"$tmp/corpus_docs"
    try {
      // doc 2 shares content `a` with doc 1; ids are reused across
      // re-posts (URL-hash ids) so a later request can carry the SAME
      // id set as an earlier one
      graft.sources.Connectors.overwritePartitions(
        Seq((1L, a, "en"), (2L, a, "en")).toDF("doc_id", "text", "lang")
          .withColumn("ingest_id", lit("base")),
        docsDir, Seq("lang", "ingest_id"))
      Dedup.saveRcFingerprints(spark, name,
        Seq((1L, a), (2L, a)).toDF("doc_id", "text"), "text")
      def forget(req: String): Unit = graft.tools.EdgeRunner.run(spark,
        graft.tools.EdgeRunner.parse(Array(
          "--mode", "forget", "--ids", "2", "--in", s"parquet:$docsDir",
          "--partition-by", "lang,ingest_id",
          "--fingerprints", name, "--ingest-id", req)))
      forget("req-2026-01") // rc(a): 2 → 1
      // doc 2 RE-POSTED with the same id and content, landed + appended
      graft.sources.Connectors.overwritePartitions(
        Seq((2L, a, "en")).toDF("doc_id", "text", "lang")
          .withColumn("ingest_id", lit("repost")),
        docsDir, Seq("lang", "ingest_id"))
      Dedup.appendRcFingerprints(spark, name,
        Seq((2L, a)).toDF("doc_id", "text"), "text", "repost") // 1 → 2
      forget("req-2026-02") // 2 → 1 — MUST NOT overwrite req-2026-01's rows
      assert(spark.table(s"${name}_normrc").groupBy("__norm_key")
        .agg(sum("rc").as("rc")).as[(String, Long)].collect().toMap
        .apply(fp(a)) == 1L,
        "a distinct request over the same id set must add its own " +
          "negative ledger rows, not replace the first request's")
      // and the same request RETRIED replays into its own partition
      forget("req-2026-02")
      assert(spark.table(s"${name}_normrc").groupBy("__norm_key")
        .agg(sum("rc").as("rc")).as[(String, Long)].collect().toMap
        .apply(fp(a)) == 1L, "a retry must stay a no-op")
    } finally {
      drop(name)
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("composed liveFingerprints keeps rows whose ingest_id is NULL") {
    // three-valued logic regression: under coFamilies the ledger is
    // split into forget / non-forget legs; a NULL ingest_id made BOTH
    // startsWith filters evaluate to NULL, silently vanishing the row
    // from the composed path while the single-family path kept it
    val name = "rcspec_nullpart"
    try {
      Seq((fp(a), 1L, Option("base")), (fp(b), 1L, Option.empty[String]))
        .toDF("__norm_key", "rc", "ingest_id")
        .write.mode("overwrite").saveAsTable(s"${name}_normrc")
      val single = live(name)
      assert(single == Set(fp(a), fp(b)))
      val composed = Dedup.liveFingerprints(spark, name,
        coFamilies = Seq(s"${name}_other")).as[String].collect().toSet
      assert(composed == single,
        "a NULL-ingest_id row must land on the non-forget leg of the " +
          "composed path, not vanish from both")
    } finally drop(name)
  }

  test("CLI: a pre-migration ids-only ledger partition is refused under a new-style id, reused under --ingest-id legacy") {
    val name = "rcspec_legacy"
    val tmp = java.nio.file.Files.createTempDirectory("rc_legacy").toString
    val docsDir = s"$tmp/corpus_docs"
    def md5_16(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    try {
      graft.sources.Connectors.overwritePartitions(
        Seq((1L, a, "en"), (2L, a, "en")).toDF("doc_id", "text", "lang")
          .withColumn("ingest_id", lit("base")),
        docsDir, Seq("lang", "ingest_id"))
      Dedup.saveRcFingerprints(spark, name,
        Seq((1L, a), (2L, a)).toDF("doc_id", "text"), "text")
      // simulate the PRE-migration request: ledger partition keyed by
      // the sorted id set alone (it crashed before the landing delete,
      // which is why an operator would retry it now)
      val legacyReq = md5_16("2")
      Forget.forgetFingerprints(spark, name,
        Seq((2L, a)).toDF("doc_id", "text"), "text", legacyReq) // rc(a): 2→1
      def rcOf(k: String): Long = spark.table(s"${name}_normrc")
        .groupBy("__norm_key").agg(sum("rc").as("rc"))
        .as[(String, Long)].collect().toMap.getOrElse(k, 0L)
      assert(rcOf(fp(a)) == 1L)
      def forget(req: String): Unit = graft.tools.EdgeRunner.run(spark,
        graft.tools.EdgeRunner.parse(Array(
          "--mode", "forget", "--ids", "2", "--in", s"parquet:$docsDir",
          "--partition-by", "lang,ingest_id",
          "--fingerprints", name, "--ingest-id", req)))
      // a retry under a new-style id would double-decrement the same
      // holders (over-erasure) — refused with migration instructions
      val e = intercept[IllegalArgumentException] { forget("req-retry") }
      assert(e.getMessage.contains("pre-migration") &&
        e.getMessage.contains("legacy"), e.getMessage)
      assert(rcOf(fp(a)) == 1L, "the refused request must not write")
      // the documented retry path: reuse the ids-only partition —
      // dynamic overwrite replays the same rows, rc unchanged
      forget("legacy")
      assert(rcOf(fp(a)) == 1L, "a legacy retry must replay idempotently")
      // a genuinely NEW request over re-posted ids proceeds under the
      // acknowledged `new:` prefix and lands its own partition
      graft.sources.Connectors.overwritePartitions(
        Seq((2L, a, "en")).toDF("doc_id", "text", "lang")
          .withColumn("ingest_id", lit("repost")),
        docsDir, Seq("lang", "ingest_id"))
      Dedup.appendRcFingerprints(spark, name,
        Seq((2L, a)).toDF("doc_id", "text"), "text", "repost") // 1→2
      forget("new:req-2026-07")
      assert(rcOf(fp(a)) == 1L,
        "the acknowledged new request must decrement the re-posted holder")
      assert(spark.table(s"${name}_normrc")
        .select(col("ingest_id").cast("string")).distinct()
        .as[String].collect().count(_.startsWith("forget-")) == 2,
        "legacy and new requests must hold distinct ledger partitions")
    } finally {
      drop(name)
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
