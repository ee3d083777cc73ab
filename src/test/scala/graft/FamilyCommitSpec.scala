package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.sources.{Bucketing, FamilyCommit}

/** Per-ingest family commit markers: a half-landed (or merely
  * uncommitted) ingest is INVISIBLE to family readers until the
  * marker lands — closing the read-side race the audit→repair loop
  * can only fix after the fact — and the audit classifies uncommitted
  * ingests as in-flight vs crashed by write age. */
class FamilyCommitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w1 = "the quick brown fox jumps over the lazy dog tonight"
  private val w2 = "completely different words fill this second document body here"
  private val w3 = "a third unique text that matches nothing in the corpus"

  test("uncommitted ingest is invisible to near-dup reads; commit makes it seen; replay of the marker is idempotent") {
    val name = "fcspec_nd"
    try {
      val corpus = Seq((1L, w1), (2L, w2)).toDF("doc_id", "text")
      Dedup.saveNearDupKeys(spark, name, corpus, "doc_id", "text")
      // opt in: first marker covers the bootstrap
      FamilyCommit.commit(spark, name, "base")

      // a batch lands FULLY but its marker hasn't been written yet
      // (the window between the last member write and the commit —
      // or a crash right before the commit)
      val batch = Seq((100L, w3)).toDF("doc_id", "text")
      Dedup.appendNearDupKeys(spark, name, batch, "doc_id", "text",
        ingestId = "2026-08-14")
      val probe = Seq((200L, w3.replace("third", "thirdish")))
        .toDF("doc_id", "text")
      def pairs(): Set[(Long, Long)] =
        Dedup.jaccardPairsBetweenFromTables(spark, probe, name,
            "doc_id", "text", threshold = 0.5)
          .select("doc_new", "doc_old").as[(Long, Long)].collect().toSet
      // the corpus (base) stays visible; the uncommitted ingest is not
      assert(pairs() == Set.empty[(Long, Long)])

      FamilyCommit.commit(spark, name, "2026-08-14")
      assert(pairs() == Set((200L, 100L)))
      // marker replay (retried commit) changes nothing
      FamilyCommit.commit(spark, name, "2026-08-14")
      assert(pairs() == Set((200L, 100L)))
      assert(spark.table(s"${name}_commits").count() == 2L)
    } finally for (t <- Seq(s"${name}_ndband", s"${name}_ndsh", s"${name}_commits"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("exact-dup keep path honors commit visibility") {
    val name = "fcspec_exact"
    try {
      Dedup.saveIncrementalKeys(spark, name,
        Seq((1L, w1)).toDF("doc_id", "text"), "text")
      FamilyCommit.commit(spark, name, "base")
      Dedup.appendIncrementalKeys(spark, name,
        Seq((100L, w3)).toDF("doc_id", "text"), "text", ingestId = "d1")
      val repost = Seq((900L, w3)).toDF("doc_id", "text")
      def keptIds(): Set[Long] =
        Dedup.incrementalKeepFromTables(spark, repost, name, "doc_id", "text")
          .select("doc_id").as[Long].collect().toSet
      // the re-posted content's keys are uncommitted -> NOT suppressed
      assert(keptIds() == Set(900L))
      FamilyCommit.commit(spark, name, "d1")
      assert(keptIds() == Set.empty[Long])
    } finally for (t <- Seq(s"${name}_norm", s"${name}_bands", s"${name}_commits"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("compactMarkers folds old marker partitions; committed ids survive the fold") {
    val name = "fcspec_cmp"
    try {
      for (id <- Seq("base", "2026-08-01", "2026-08-02", "2026-08-03"))
        FamilyCommit.commit(spark, name, id)
      assert(spark.table(s"${name}_commits").count() == 4L)
      FamilyCommit.compactMarkers(spark, name, keepLast = 1)
      // partitions folded to base + the newest marker; the COMMITTED
      // set is unchanged (ids live in the data column, not just the
      // partition value — folding must not revoke commits)
      assert(spark.table(s"${name}_commits")
        .select(col("ingest_id").cast("string")).distinct()
        .as[String].collect().toSet == Set("base", "2026-08-03"))
      assert(FamilyCommit.committedIds(spark, name).get ==
        Set("base", "2026-08-01", "2026-08-02", "2026-08-03"))
      // a replayed commit of a folded id is harmless: distinct ids
      FamilyCommit.commit(spark, name, "2026-08-01")
      assert(FamilyCommit.committedIds(spark, name).get ==
        Set("base", "2026-08-01", "2026-08-02", "2026-08-03"))
    } finally spark.sql(s"DROP TABLE IF EXISTS ${name}_commits")
  }

  test("audit classifies: committed / in-flight / crashed / broken; CLI flags only the repairable ones; repair re-commits") {
    val name = "fcspec_audit"
    try {
      val corpus = Seq((1L, w1), (2L, w2)).toDF("doc_id", "text")
      Dedup.saveNearDupKeys(spark, name, corpus, "doc_id", "text")
      FamilyCommit.commit(spark, name, "base")
      // committed + consistent
      Dedup.appendNearDupKeys(spark, name, Seq((10L, w3)).toDF("doc_id", "text"),
        "doc_id", "text", ingestId = "okday")
      FamilyCommit.commit(spark, name, "okday")
      // uncommitted + fresh -> in-flight (a writer mid-family)
      Dedup.appendNearDupKeys(spark, name,
        Seq((20L, w1.replace("dog", "cat"))).toDF("doc_id", "text"),
        "doc_id", "text", ingestId = "liveday")
      // uncommitted + HALF-landed + old -> crashed
      Dedup.appendNearDupKeys(spark, name,
        Seq((30L, w2.replace("words", "verbs"))).toDF("doc_id", "text"),
        "doc_id", "text", ingestId = "deadday")
      spark.sql(s"ALTER TABLE ${name}_ndsh DROP PARTITION (ingest_id='deadday')")
      val loc = new org.apache.hadoop.fs.Path(
        Bucketing.tableLocation(spark, s"${name}_ndband"), "ingest_id=deadday")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.setTimes(loc, System.currentTimeMillis() - 3600000L, -1)
      // committed but a member lost a partition -> broken
      Dedup.appendNearDupKeys(spark, name,
        Seq((40L, w3.replace("text", "prose"))).toDF("doc_id", "text"),
        "doc_id", "text", ingestId = "brokeday")
      FamilyCommit.commit(spark, name, "brokeday")
      spark.sql(s"ALTER TABLE ${name}_ndsh DROP PARTITION (ingest_id='brokeday')")

      val members = Seq(s"${name}_ndband", s"${name}_ndsh")
      val st = FamilyCommit.status(spark, members, name, graceMs = 60000L)
        .select(col("ingest_id").cast("string"), col("status"))
        .as[(String, String)].collect().toMap
      assert(st == Map("base" -> "committed", "okday" -> "committed",
        "liveday" -> "in-flight", "deadday" -> "crashed",
        "brokeday" -> "broken"))

      // CLI audit returns exactly the repairable set (in-flight spared)
      val bad = graft.tools.EdgeRunner.runAudit(spark,
        graft.tools.EdgeRunner.parse(Array("--mode", "audit", "--in", "unused:",
          "--table", members.mkString(","), "--commits", name,
          "--grace-sec", "60")))
      assert(bad == Seq("brokeday", "deadday"))

      // heal from the landed docs; the repair re-commits, so the next
      // audit shows both healed ingests committed+consistent
      val docsDir = java.nio.file.Files.createTempDirectory("fc_docs").toString
      for ((id, doc) <- Seq(
        ("deadday", (30L, w2.replace("words", "verbs"))),
        ("brokeday", (40L, w3.replace("text", "prose")))))
        Seq(doc).toDF("doc_id", "text").withColumn("ingest_id", lit(id))
          .write.mode("append").partitionBy("ingest_id").parquet(docsDir)
      val (healed, manual) = graft.tools.EdgeRunner.runRepair(spark,
        graft.tools.EdgeRunner.parse(Array("--mode", "audit", "--in",
          s"parquet:$docsDir", "--table", members.mkString(","),
          "--commits", name, "--grace-sec", "60", "--repair", "true")),
        bad)
      assert(healed.toSet == Set("deadday", "brokeday") && manual.isEmpty)
      val st2 = FamilyCommit.status(spark, members, name, graceMs = 60000L)
        .select(col("ingest_id").cast("string"), col("status"))
        .as[(String, String)].collect().toMap
      assert(st2("deadday") == "committed" && st2("brokeday") == "committed")
    } finally for (t <- Seq(s"${name}_ndband", s"${name}_ndsh", s"${name}_commits"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
