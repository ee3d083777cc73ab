package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, Similarity, TextAnalysis}
import graft.sources.FamilyCommit
import graft.tools.EdgeRunner

/** CROSS-family atomic ingest visibility
  * ([[graft.sources.FamilyCommit.visibleAcross]]): one logical ingest
  * commits per-family markers sequentially, and composed readers span
  * families — hybrid retrieval fuses the lexical and vector legs, the
  * stream sink lands lexical then IVF. A reader between two family
  * commits must see the ingest in NEITHER leg; visibility is atomic at
  * the LAST marker. */
class CrossFamilySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def drop(tables: Seq[String]): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("visibleAcross gates on the INTERSECTION of committed sets; legacy-open families contribute no filter") {
    val f1 = "xfam_a"; val f2 = "xfam_b"; val f3 = "xfam_open"
    try {
      drop(Seq(s"${f1}_commits", s"${f2}_commits"))
      val member = Seq(("r1", "base"), ("r2", "i1"), ("r3", "i2"))
        .toDF("v", "ingest_id")
      def seen(prefixes: Seq[String]): Set[String] =
        FamilyCommit.visibleAcross(spark, member, prefixes)
          .select("v").as[String].collect().toSet
      // all legacy-open: pass-through, committedAcross undefined
      assert(seen(Seq(f1, f2, f3)) == Set("r1", "r2", "r3"))
      assert(FamilyCommit.committedAcross(spark, Seq(f1, f2, f3)).isEmpty)
      // f1 commits i1 and i2; f2 commits only i1 — the composed read
      // trusts the intersection {i1} (+ base, always visible)
      FamilyCommit.commit(spark, f1, "i1")
      FamilyCommit.commit(spark, f1, "i2")
      FamilyCommit.commit(spark, f2, "i1")
      assert(seen(Seq(f1)) == Set("r1", "r2", "r3"))
      assert(seen(Seq(f1, f2)) == Set("r1", "r2"))
      assert(FamilyCommit.committedAcross(spark, Seq(f1, f2))
        .contains(Set("i1")))
      // a legacy-open family mixed in changes nothing
      assert(seen(Seq(f1, f2, f3)) == Set("r1", "r2"))
      // the last marker lands -> atomic visibility
      FamilyCommit.commit(spark, f2, "i2")
      assert(seen(Seq(f1, f2)) == Set("r1", "r2", "r3"))
    } finally drop(Seq(s"${f1}_commits", s"${f2}_commits"))
  }

  test("hybrid retrieval: an ingest committed in the lexical family only is invisible to BOTH fused legs until the IVF marker lands") {
    val lex = "xfam_lex"; val ivf = "xfam_ivf"
    val tables = Seq(s"${lex}_post", s"${lex}_lexstats", s"${lex}_commits",
      s"${ivf}_centroids", s"${ivf}_assignments", s"${ivf}_commits")
    try {
      drop(tables)
      // bootstrap both retrieval families, markers enforced
      val seed = Seq(
        (1L, "alpha beta gamma shared seed corpus words"),
        (2L, "unrelated rainfall document with other tokens"))
        .toDF("doc_id", "text")
      TextAnalysis.saveLexicalIndex(spark, lex, seed, "doc_id", "text")
      FamilyCommit.commit(spark, lex, "base")
      Similarity.saveIvfIndex(spark,
        Similarity.ivfIndex(Seq((1L, Seq(8.0, 0.0, 0.0, 0.0)),
          (2L, Seq(-8.0, 0.0, 0.0, 0.0))).toDF("id", "vec"),
          nCentroids = 2, iters = 2), ivf)
      FamilyCommit.commit(spark, ivf, "base")

      // one logical ingest lands in both families; only lexical commits
      // (the crash window between the two sequential markers)
      val batchDocs = Seq((10L, "zeppelin quartz mamba unique streaming words"))
        .toDF("doc_id", "text")
      TextAnalysis.appendLexicalIndex(spark, lex, batchDocs,
        "doc_id", "text", ingestId = "day1")
      FamilyCommit.commit(spark, lex, "day1")
      Similarity.appendToIvfIndex(spark, ivf,
        Seq((10L, Seq(7.5, 0.5, 0.0, 0.0))).toDF("id", "vec"), "day1")

      val qterms = Seq((99L, "zeppelin"), (99L, "quartz"))
        .toDF("query_id", "term")
      val qvec = Seq((99L, Seq(7.5, 0.5, 0.0, 0.0))).toDF("id", "vec")
      def legs(): (Set[Long], Set[Long], Set[Long]) = {
        val lleg = TextAnalysis.bm25FromTables(spark, lex, qterms,
          topN = 10, coFamilies = Seq(ivf))
          .select(col("query_id"), col("doc_id").as("neighbor_id"), col("rn"))
        val vleg = Similarity.ivfTopK(qvec,
          Similarity.loadIvfIndex(spark, ivf, coFamilies = Seq(lex)),
          k = 10, nProbe = 2)
          .select("query_id", "neighbor_id", "rn")
        (lleg.select("neighbor_id").as[Long].collect().toSet,
          vleg.select("neighbor_id").as[Long].collect().toSet,
          Relational.rrfFuse(Seq(vleg, lleg), k = 10)
            .select("neighbor_id").as[Long].collect().toSet)
      }
      val (l0, v0, f0) = legs()
      assert(!l0.contains(10L) && !v0.contains(10L) && !f0.contains(10L),
        s"half-committed ingest leaked into a fused leg: lex=$l0 vec=$v0 fused=$f0")
      // per-family SINGLE-leg readers still honor their own contract:
      // the lexical family alone (its marker landed) does serve day1
      assert(TextAnalysis.bm25FromTables(spark, lex, qterms, topN = 10)
        .select("doc_id").as[Long].collect().toSet.contains(10L))

      // the LAST marker lands -> the ingest enters BOTH legs atomically
      FamilyCommit.commit(spark, ivf, "day1")
      val (l1, v1, f1) = legs()
      assert(l1.contains(10L) && v1.contains(10L) && f1.contains(10L),
        s"committed ingest missing from a fused leg: lex=$l1 vec=$v1 fused=$f1")
    } finally drop(tables)
  }

  test("strict-erasure composed admission: an rc ingest committed ahead of the nd family is judged against the PREVIOUS corpus in the rc leg too") {
    import graft.operators.Dedup
    val rc = "xfam_rc"; val nd = "xfam_nd"
    val tables = Seq(s"${rc}_normrc", s"${rc}_commits",
      s"${nd}_ndband", s"${nd}_ndsh", s"${nd}_commits")
    try {
      drop(tables)
      val base = Seq((1L, "alpha beta gamma shared seed corpus words"))
        .toDF("doc_id", "text")
      Dedup.saveRcFingerprints(spark, rc, base, "text")
      FamilyCommit.commit(spark, rc, "base")
      Dedup.saveNearDupKeys(spark, nd, base, "doc_id", "text")
      FamilyCommit.commit(spark, nd, "base")
      // one logical ingest lands in both families; only rc commits
      val day = Seq((2L, "zeppelin quartz mamba unique streaming words"))
        .toDF("doc_id", "text")
      Dedup.appendRcFingerprints(spark, rc, day, "text", "day1")
      FamilyCommit.commit(spark, rc, "day1")
      Dedup.appendNearDupKeys(spark, nd, day, "doc_id", "text",
        ingestId = "day1") // no marker — the crash window
      // composed admission gates the rc leg on BOTH families: a
      // re-post of day1's content is still ADMITTED (judged against
      // the previous corpus, like the nd leg sees it)
      val repost = Seq((3L, "zeppelin quartz mamba unique streaming words"))
        .toDF("doc_id", "text")
      assert(Dedup.exactKeepFromRcTable(spark, repost, rc,
          "doc_id", "text", coFamilies = Seq(nd))
        .count() == 1L, "half-committed ingest must not suppress in one leg only")
      // rc leg ALONE honors its own marker (single-family contract)
      assert(Dedup.exactKeepFromRcTable(spark, repost, rc,
        "doc_id", "text").count() == 0L)
      // the last marker lands -> both legs see day1 atomically
      FamilyCommit.commit(spark, nd, "day1")
      assert(Dedup.exactKeepFromRcTable(spark, repost, rc,
        "doc_id", "text", coFamilies = Seq(nd)).count() == 0L)
      // STRICT ERASURE ON THE COMPOSED PATH: forget-* ledger
      // partitions are FAMILY-LOCAL ids (the deletion request lands
      // only in the rc family, its marker committed only there) — the
      // cross-family gate must EXEMPT them, or the coFamily's
      // committed set (which never holds forget-* ids) would hide
      // every decrement forever and a forgotten fingerprint would
      // stay live until a compaction folds it into base
      graft.operators.Forget.forgetFingerprints(spark, rc,
        day, "text", "reqZ")
      assert(Dedup.exactKeepFromRcTable(spark, repost, rc,
          "doc_id", "text", coFamilies = Seq(nd)).count() == 1L,
        "a forgotten fingerprint must leave the composed live set too")
    } finally drop(tables)
  }

  test("stream e2e: crash between the lexical and IVF commits leaves the batch out of composed reads; the replay heals without duplication") {
    val lex = "xfam_slex"; val ivf = "xfam_sivf"
    val tables = Seq(s"${lex}_post", s"${lex}_lexstats", s"${lex}_commits",
      s"${ivf}_centroids", s"${ivf}_assignments", s"${ivf}_commits")
    val out = Files.createTempDirectory("xfam_out").toString
    val keysDir = Files.createTempDirectory("xfam_keys").toString + "/keys"
    try {
      drop(tables)
      val seed = Seq((1L, "alpha beta gamma shared seed corpus words"))
        .toDF("doc_id", "text")
      TextAnalysis.saveLexicalIndex(spark, lex, seed, "doc_id", "text")
      FamilyCommit.commit(spark, lex, "base")
      Similarity.saveIvfIndex(spark,
        Similarity.ivfIndex(Seq((1L, Seq(8.0, 0.0, 0.0, 0.0)),
          (2L, Seq(-8.0, 0.0, 0.0, 0.0))).toDF("id", "vec"),
          nCentroids = 2, iters = 2), ivf)
      FamilyCommit.commit(spark, ivf, "base")

      val ts = java.sql.Timestamp.valueOf("2025-01-01 10:00:00")
      val batch = Seq(
        (10L, "zeppelin quartz mamba unique streaming words", ts,
          Seq(7.5, 0.5, 0.0, 0.0)))
        .toDF("doc_id", "text", "ts", "vec")
      val ing = "stream000000000003"
      // CRASH SIMULATION: landAndMaintain's exact member sequence, cut
      // between the lexical commit and the IVF commit (the IVF member
      // write already landed — the widest half-committed window)
      graft.sources.Connectors.overwritePartitions(
        batch.withColumn("batch_id", lit(3L)), out, Seq("batch_id"))
      graft.sources.Connectors.overwritePartitions(
        graft.operators.Dedup.knownKeys(batch, "text")
          .withColumn("ingest_id", lit(ing)), keysDir, Seq("ingest_id"))
      TextAnalysis.appendLexicalIndex(spark, lex, batch,
        "doc_id", "text", ingestId = ing)
      FamilyCommit.commit(spark, lex, ing)
      Similarity.appendToIvfIndex(spark, ivf,
        batch.select(col("doc_id").as("id"), col("vec")), ing)
      // -- crash here: no IVF marker --

      val qterms = Seq((99L, "zeppelin")).toDF("query_id", "term")
      val qvec = Seq((99L, Seq(7.5, 0.5, 0.0, 0.0))).toDF("id", "vec")
      def composedSees(): (Boolean, Boolean) = (
        TextAnalysis.bm25FromTables(spark, lex, qterms, topN = 10,
          coFamilies = Seq(ivf))
          .select("doc_id").as[Long].collect().toSet.contains(10L),
        Similarity.ivfTopK(qvec,
          Similarity.loadIvfIndex(spark, ivf, coFamilies = Seq(lex)),
          k = 10, nProbe = 2)
          .select("neighbor_id").as[Long].collect().toSet.contains(10L))
      assert(composedSees() == ((false, false)),
        "the crash window must hide the batch from BOTH composed legs")

      // RECOVERY is the stream replay itself: the same micro-batch
      // re-runs through the real sink body — idempotent overwrites,
      // markers re-land in order, the batch becomes visible everywhere
      val postBefore = spark.table(s"${lex}_post").count()
      val assignBefore = spark.table(s"${ivf}_assignments").count()
      EdgeRunner.landAndMaintain(batch, 3L, out, keysDir,
        lexPrefix = Some(lex), ivfName = Some(ivf))
      assert(composedSees() == ((true, true)),
        "after the replay lands the last marker, both legs must serve the batch")
      assert(spark.table(s"${lex}_post").count() == postBefore &&
        spark.table(s"${ivf}_assignments").count() == assignBefore,
        "the healing replay must replace its own partitions, not append")
      assert(spark.read.parquet(out).filter(col("doc_id") === 10L).count() == 1L)
    } finally {
      drop(tables)
      for (d <- Seq(out, keysDir)) {
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
  }
}
