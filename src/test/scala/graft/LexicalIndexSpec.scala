package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** The persisted BM25 posting family (`_post`/`_lexstats`): probing
  * the tables is row-identical to the inline corpus derivation,
  * appends are rebuild-equivalent and replay-idempotent, and the
  * per-query probe never touches document text (plan-locked, bucket-
  * pruned). */
class LexicalIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.select("query_id", "doc_id", "score", "n_matched", "rn")
      .collect().map(_.toSeq.toList).toSet

  test("table probe == inline derivation on real docs; no text scan; bucket-pruned") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") >= 10)
    val qterms = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 3)
      .filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("term"))
      .localCheckpoint(true)
    val name = "lexspec_idx"
    try {
      TextAnalysis.saveLexicalIndex(spark, name, corpus, "doc_id", "text")
      val inline = TextAnalysis.bm25PerQuery(corpus, "doc_id", "text",
        qterms, topN = 20)
      val probe = TextAnalysis.bm25FromTables(spark, name, qterms, topN = 20)
      assert(rows(probe) == rows(inline))
      assert(rows(probe).nonEmpty)

      // plan lock: the probe reads the posting table with a pruned
      // bucket set and NEVER scans the documents parquet
      val plan = probe.queryExecution.executedPlan.toString
      assert(!plan.contains("documents"),
        s"the index probe must not scan document text:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"the term IN filter must prune posting buckets:\n$plan")
      // the stats read is a sum over the tiny _lexstats table, checked
      // by equivalence above (nDocs/sumDl identical to the inline agg)

      // the per-term df aggregation rides the bucket layout: grouping
      // the term-bucketed scan by term plans with NO exchange (the
      // scaladoc's exchange-free claim, locked)
      val qTermsList = qterms.select("term").distinct()
        .as[String].collect().toSeq
      val dftPlan = spark.table(s"${name}_post")
        .filter(col("term").isin(qTermsList: _*))
        .groupBy("term").agg(count(lit(1)))
        .queryExecution.executedPlan.toString
      assert(!dftPlan.contains("ShuffleExchange"),
        s"df aggregation must be exchange-free on the bucket layout:\n$dftPlan")
    } finally for (t <- Seq(s"${name}_post", s"${name}_lexstats"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("append == rebuild; replay-idempotent; stats rows sum across ingests") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= 10)
    val old = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 3)
    val qterms = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 3)
      .filter(col("doc_id") < 200)
      .select(col("doc_id").as("query_id"), col("term"))
      .localCheckpoint(true)
    val inc = "lexspec_inc"
    val full = "lexspec_full"
    try {
      TextAnalysis.saveLexicalIndex(spark, inc, old, "doc_id", "text")
      TextAnalysis.appendLexicalIndex(spark, inc, batch, "doc_id", "text",
        ingestId = "2026-08-14")
      TextAnalysis.saveLexicalIndex(spark, full, docs, "doc_id", "text")
      val probeInc = TextAnalysis.bm25FromTables(spark, inc, qterms, topN = 10)
      val probeFull = TextAnalysis.bm25FromTables(spark, full, qterms, topN = 10)
      assert(rows(probeInc) == rows(probeFull))
      assert(rows(probeInc).nonEmpty)

      // replay: the retried ingest replaces its own partition
      val before = spark.table(s"${inc}_post").count()
      TextAnalysis.appendLexicalIndex(spark, inc, batch, "doc_id", "text",
        ingestId = "2026-08-14")
      assert(spark.table(s"${inc}_post").count() == before)
      assert(rows(TextAnalysis.bm25FromTables(spark, inc, qterms, topN = 10))
        == rows(probeFull))

      // corpus scalars are the SUM of per-ingest contribution rows
      val Seq((n1, s1)) = spark.table(s"${inc}_lexstats")
        .agg(sum("n_docs"), sum("sum_dl")).as[(Long, Long)].collect().toSeq
      val Seq((n2, s2)) = spark.table(s"${full}_lexstats")
        .agg(sum("n_docs"), sum("sum_dl")).as[(Long, Long)].collect().toSeq
      assert((n1, s1) == (n2, s2))
      assert(spark.table(s"${inc}_lexstats").count() == 2L)

      // the family is audit-visible like every maintained family
      val audit = graft.sources.Bucketing.auditIngests(spark,
        Seq(s"${inc}_post", s"${inc}_lexstats"))
      assert(audit.filter(!col("consistent")).count() == 0)
    } finally for (t <- Seq(s"${inc}_post", s"${inc}_lexstats",
      s"${full}_post", s"${full}_lexstats"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("forget from the lexical family == rebuild without the ids; stats shrink with the corpus; purge flavor too") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= 10)
    val qterms = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 3)
      .filter(col("doc_id") < 200)
      .select(col("doc_id").as("query_id"), col("term"))
      .localCheckpoint(true)
    val ids = Seq(11L, 23L, 42L)
    val live = "lexspec_fgt"
    val ref = "lexspec_ref"
    try {
      TextAnalysis.saveLexicalIndex(spark, live, docs, "doc_id", "text")
      // the forgotten ids' postings vanish AND the corpus scalars are
      // recomputed — probe rows must be IDENTICAL to an index built
      // over the reduced corpus (idf/df/length norms all shift)
      val n = graft.operators.Forget.forgetFromLexicalIndex(spark, live, ids)
      assert(n > 0L)
      TextAnalysis.saveLexicalIndex(spark, ref,
        docs.filter(!col("doc_id").isin(ids: _*)), "doc_id", "text")
      assert(rows(TextAnalysis.bm25FromTables(spark, live, qterms, topN = 10))
        == rows(TextAnalysis.bm25FromTables(spark, ref, qterms, topN = 10)))
      assert(spark.table(s"${live}_post")
        .filter(col("doc_id").isin(ids: _*)).count() == 0)
      import spark.implicits._
      val Seq((nl, sl)) = spark.table(s"${live}_lexstats")
        .agg(sum("n_docs"), sum("sum_dl")).as[(Long, Long)].collect().toSeq
      val Seq((nr, sr)) = spark.table(s"${ref}_lexstats")
        .agg(sum("n_docs"), sum("sum_dl")).as[(Long, Long)].collect().toSeq
      assert((nl, sl) == (nr, sr), "corpus scalars must shrink with the corpus")
      // idempotent
      assert(graft.operators.Forget.forgetFromLexicalIndex(spark, live, ids) == 0L)

      // bulk flavor: purge another id set at the compaction cadence —
      // same rebuild equivalence through the fold path
      val ids2 = Seq(57L, 88L)
      graft.operators.Forget.purgeLexicalIndex(spark, live,
        ids2.toDF("doc_id"), keepLast = 1)
      TextAnalysis.saveLexicalIndex(spark, ref,
        docs.filter(!col("doc_id").isin(ids ++ ids2: _*)), "doc_id", "text")
      assert(rows(TextAnalysis.bm25FromTables(spark, live, qterms, topN = 10))
        == rows(TextAnalysis.bm25FromTables(spark, ref, qterms, topN = 10)))
    } finally for (t <- Seq(s"${live}_post", s"${live}_lexstats",
      s"${ref}_post", s"${ref}_lexstats"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("CLI lexical lifecycle: bootstrap + append with markers; audit classifies and --repair heals a half-landed ingest") {
    import spark.implicits._
    val name = "lexspec_cli"
    val ref = "lexspec_cliref"
    val root = java.nio.file.Files.createTempDirectory("lexcli").toString
    val oldDocs = Seq((1L, "alpha beta gamma"), (2L, "alpha delta"),
      (3L, "beta beta gamma"))
    val day9 = Seq((10L, "alpha alpha beta"), (11L, "gamma delta epsilon"))
    val day10 = Seq((20L, "epsilon alpha"), (21L, "beta delta"))
    val qterms = Seq((1L, "alpha"), (1L, "beta"), (2L, "gamma"),
      (2L, "delta"), (3L, "epsilon")).toDF("query_id", "term")
    def probe(p: String) = rows(TextAnalysis.bm25FromTables(spark, p, qterms, 10))
    def freshRef(docs: Seq[(Long, String)]): Set[Seq[Any]] = {
      for (t <- Seq(s"${ref}_post", s"${ref}_lexstats"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
      TextAnalysis.saveLexicalIndex(spark, ref,
        docs.toDF("doc_id", "text"), "doc_id", "text")
      probe(ref)
    }
    try {
      oldDocs.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$root/old")
      (day9.map(d => (d._1, d._2, "day9")) ++
          day10.map(d => (d._1, d._2, "day10")))
        .toDF("doc_id", "text", "ingest_id")
        .write.mode("overwrite").partitionBy("ingest_id")
        .parquet(s"$root/landing")
      // bootstrap + commit: the family enforces visibility from birth
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "lexical", "--in", s"parquet:$root/old",
        "--lex", name, "--commits", name)))
      assert(graft.sources.FamilyCommit.enabled(spark, name))
      assert(probe(name) == freshRef(oldDocs))
      // committed append through the dispatcher, scoped to its ingest
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "lexical", "--in", s"parquet:$root/landing",
        "--lex", name, "--ingest-id", "day9", "--commits", name)))
      assert(probe(name) == freshRef(oldDocs ++ day9))

      // crash case: day10's postings land, the stats write is lost,
      // no marker — the probe must keep scoring the committed corpus
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "lexical", "--in", s"parquet:$root/landing",
        "--lex", name, "--ingest-id", "day10")))
      spark.sql(s"ALTER TABLE ${name}_lexstats DROP PARTITION (ingest_id='day10')")
      assert(probe(name) == freshRef(oldDocs ++ day9))
      // the marker-aware audit calls it crashed (grace 0), repair
      // re-appends BOTH members from the landing and re-commits
      val members = Seq(s"${name}_post", s"${name}_lexstats")
      val bad = graft.tools.EdgeRunner.runAudit(spark,
        graft.tools.EdgeRunner.parse(Array("--mode", "audit", "--in", "unused:",
          "--table", members.mkString(","), "--commits", name,
          "--grace-sec", "0")))
      assert(bad == Seq("day10"))
      val (healed, manual) = graft.tools.EdgeRunner.runRepair(spark,
        graft.tools.EdgeRunner.parse(Array("--mode", "audit",
          "--in", s"parquet:$root/landing",
          "--table", members.mkString(","), "--repair", "true")), bad)
      assert(healed == Seq("day10") && manual.isEmpty)
      assert(probe(name) == freshRef(oldDocs ++ day9 ++ day10))
    } finally for (t <- Seq(s"${name}_post", s"${name}_lexstats",
      s"${name}_commits", s"${ref}_post", s"${ref}_lexstats"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("commit-visibility: an uncommitted lexical ingest is invisible to the probe") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= 10)
    val old = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 3)
    val qterms = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 3)
      .filter(col("doc_id") < 200)
      .select(col("doc_id").as("query_id"), col("term"))
      .localCheckpoint(true)
    val name = "lexspec_cv"
    try {
      TextAnalysis.saveLexicalIndex(spark, name, old, "doc_id", "text")
      graft.sources.FamilyCommit.commit(spark, name, "base")
      val before = rows(TextAnalysis.bm25FromTables(spark, name, qterms, 10))
      // the append lands BOTH members but its marker hasn't — the
      // probe must score exactly the committed corpus (a posting set
      // mixed with a mismatched scalar set would be silently wrong)
      TextAnalysis.appendLexicalIndex(spark, name, batch, "doc_id", "text",
        ingestId = "2026-08-15")
      assert(rows(TextAnalysis.bm25FromTables(spark, name, qterms, 10)) == before)
      graft.sources.FamilyCommit.commit(spark, name, "2026-08-15")
      val after = rows(TextAnalysis.bm25FromTables(spark, name, qterms, 10))
      assert(after != before, "committed ingest must become visible")
    } finally for (t <- Seq(s"${name}_post", s"${name}_lexstats",
      s"${name}_commits"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
