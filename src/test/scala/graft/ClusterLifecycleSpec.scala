package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Forget}

/** The cluster-assignment artifact as a MAINTAINED family member
  * (`<name>_clusters` alongside `_ndband`/`_ndsh`): bootstrap →
  * per-ingest incremental fold (≡ from-scratch rebuild, bridged
  * clusters relabeled in place, replay-idempotent, retention mtime
  * preserved) → deletion propagation (membership rows vanish, anchored
  * clusters relabel to the surviving min member, <2-member clusters
  * dissolve, canonical selection re-resolves) → CLI lifecycle. */
class ClusterLifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Hand-built shingle geometry (3-gram sets, all counts exact):
  //   S  = 10 shared tokens (8 shingles), A/B/U = 5-token own blocks.
  //   doc2  = S++A (13 shingles)   doc10 = S++B (13 shingles)
  //   j(2,10) = 8/18 = 0.444 < 0.5          -> separate clusters
  //   doc1  = doc2 last word changed: j(1,2)  = 12/14 = 0.857
  //   doc11 = doc10 last word changed: j(11,10) = 12/14
  //   doc5  = S++A++B (18 shingles): j(5,2) = 13/18 = 0.722,
  //           j(5,10) = 11/20 = 0.55        -> 5 BRIDGES the clusters
  //   doc30 = U, doc31 = U variant           -> fresh batch-only cluster
  //   doc40 = unrelated singleton            -> never in the table
  private val S = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val A = "one two three four five"
  private val B = "six seven eight nine ten"
  private val U = "red orange yellow green blue indigo violet umber sable wheat"
  private val corpus = Seq(
    (1L, s"$S one two three four fivex"),
    (2L, s"$S $A"),
    (10L, s"$S $B"),
    (11L, s"$S six seven eight nine tenx"),
    (20L, "lonely words that match nothing else in this corpus at all"))
  private val batch = Seq(
    (5L, s"$S $A $B"),
    (30L, U),
    (31L, "red orange yellow green blue indigo violet umber sable wheatx"),
    (40L, "another unrelated singleton document with no duplicate twin"))

  private def assignments(name: String): Map[Long, Long] =
    spark.table(s"${name}_clusters").select("doc_id", "cluster_id")
      .as[(Long, Long)].collect().toMap

  test("cluster family: bootstrap -> incremental fold == rebuild; merge relabels in place; replay-idempotent; mtime preserved") {
    val name = "clspec_nd"
    try {
      val old = corpus.toDF("doc_id", "text")
      val delta = batch.toDF("doc_id", "text")
      Dedup.saveNearDupKeys(spark, name, old, "doc_id", "text")
      Dedup.saveClusterAssignments(spark, name,
        Dedup.clusters(Dedup.jaccardPairs(old, "doc_id", "text", threshold = 0.5)
          .select("doc_a", "doc_b")))
      assert(assignments(name) ==
        Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))

      // age the base partition so the mtime-preservation assert is real
      val loc = new org.apache.hadoop.fs.Path(
        graft.sources.Bucketing.tableLocation(spark, s"${name}_clusters"),
        "ingest_id=base")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val aged = System.currentTimeMillis() - 9999000L
      fs.setTimes(loc, aged, -1)

      // the family's key append + the cluster fold, one ingest id
      Dedup.appendNearDupKeys(spark, name, delta, "doc_id", "text",
        ingestId = "2026-08-13")
      Dedup.appendClusterAssignments(spark, name, delta, "doc_id", "text",
        threshold = 0.5, ingestId = "2026-08-13")

      // == from-scratch rebuild over the full corpus: doc 5 bridged
      // {1,2} and {10,11} into one min-label component; 30/31 are a
      // fresh cluster; singletons 20/40 never appear
      val expected = Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 10L -> 1L,
        11L -> 1L, 30L -> 30L, 31L -> 30L)
      assert(assignments(name) == expected)
      val rebuild = Dedup.clusters(
        Dedup.jaccardPairs(old.unionByName(delta), "doc_id", "text",
            threshold = 0.5).select("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(rebuild == expected, s"fixture drifted from rebuild: $rebuild")

      // partition placement: batch rows under the ingest id, relabeled
      // old rows still in base (rewritten in place, not migrated)
      val byIngest = spark.table(s"${name}_clusters")
        .groupBy(col("ingest_id").cast("string").as("ing"))
        .agg(collect_set(col("doc_id")).as("ids"))
        .as[(String, Seq[Long])].collect().toMap
      assert(byIngest("base").toSet == Set(1L, 2L, 10L, 11L))
      assert(byIngest("2026-08-13").toSet == Set(5L, 30L, 31L))

      // the in-place relabel did NOT freshen the base partition:
      // compaction retention orders by write time
      assert(fs.getFileStatus(loc).getModificationTime == aged,
        "merge relabel must preserve the partition's pre-rewrite mtime")

      // replay: the same ingest folds to the identical table
      Dedup.appendClusterAssignments(spark, name, delta, "doc_id", "text",
        threshold = 0.5, ingestId = "2026-08-13")
      assert(assignments(name) == expected)

      // bucket layout survives the relabel rewrite: doc_id self-join
      // plans exchange-free
      val prevAb = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val t = spark.table(s"${name}_clusters").select("doc_id", "cluster_id")
        val plan = t.join(t.select(col("doc_id")), "doc_id")
          .queryExecution.executedPlan.toString
        assert(!plan.contains("ShuffleExchange"),
          s"bucket join must stay exchange-free after the fold:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAb)

      // audit sees all THREE family members consistently landed
      val audit = graft.sources.Bucketing.auditIngests(spark,
        Seq(s"${name}_ndband", s"${name}_ndsh", s"${name}_clusters"))
      assert(audit.filter(!col("consistent")).count() == 0)

      // the generic ingest compaction applies to the cluster member
      // like any bucketed family table: assignments identical, newest
      // ingest kept replayable, reads still exchange-free
      graft.sources.Bucketing.compactIngests(spark, s"${name}_clusters",
        Seq("doc_id"), graft.sources.Bucketing.bucketsOf(spark,
          s"${name}_clusters"), keepLast = 1)
      assert(assignments(name) == expected)
      assert(spark.table(s"${name}_clusters")
        .select(col("ingest_id").cast("string")).distinct()
        .as[String].collect().toSet == Set("base", "2026-08-13"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val t = spark.table(s"${name}_clusters").select("doc_id", "cluster_id")
        val plan2 = t.join(t.select(col("doc_id")), "doc_id")
          .queryExecution.executedPlan.toString
        assert(!plan2.contains("ShuffleExchange"))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAb)
    } finally for (t <- Seq(s"${name}_ndband", s"${name}_ndsh", s"${name}_clusters"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("forget reaches the cluster member: anchored cluster relabels, 2-member cluster dissolves, canonical re-selects, CLI composes") {
    val name = "clspec_forget"
    try {
      val old = corpus.toDF("doc_id", "text")
      val delta = batch.toDF("doc_id", "text")
      Dedup.saveNearDupKeys(spark, name, old, "doc_id", "text")
      Dedup.saveClusterAssignments(spark, name,
        Dedup.clusters(Dedup.jaccardPairs(old, "doc_id", "text", threshold = 0.5)
          .select("doc_a", "doc_b")))
      Dedup.appendNearDupKeys(spark, name, delta, "doc_id", "text",
        ingestId = "2026-08-13")
      Dedup.appendClusterAssignments(spark, name, delta, "doc_id", "text",
        threshold = 0.5, ingestId = "2026-08-13")
      // {1,2,5,10,11} -> 1 ; {30,31} -> 30

      // d14 keeper rule before: cluster 1's canonical is doc 5 (20
      // tokens, the longest member)
      def keeperOf(cid: Long): Long = {
        val docs = old.unionByName(delta)
          .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
        spark.table(s"${name}_clusters").join(docs, "doc_id")
          .filter(col("cluster_id") === cid)
          .orderBy(col("n_tok").desc, col("doc_id")).limit(1)
          .select("doc_id").as[Long].head()
      }
      assert(keeperOf(1L) == 5L)

      // forget the ANCHOR doc 1 (the cluster's label) and the longest
      // member 5 (its canonical) in one request
      val n1 = Forget.forgetFromClusters(spark, s"${name}_clusters", Seq(1L, 5L))
      assert(n1 == 2L)
      // survivors relabel to the new min member 2; canonical
      // re-selection now ties the three surviving 15-token members
      // and the doc_id tiebreak picks 2
      assert(assignments(name) ==
        Map(2L -> 2L, 10L -> 2L, 11L -> 2L, 30L -> 30L, 31L -> 30L))
      assert(keeperOf(2L) == 2L)

      // dissolving: forgetting 30 leaves 31 alone -> both rows gone
      val n2 = Forget.forgetFromClusters(spark, s"${name}_clusters", Seq(30L))
      assert(n2 == 2L)
      assert(assignments(name) == Map(2L -> 2L, 10L -> 2L, 11L -> 2L))
      // idempotent
      assert(Forget.forgetFromClusters(spark, s"${name}_clusters",
        Seq(1L, 5L, 30L)) == 0L)

      // d17-style duplication counts drop with the membership
      val dupDocs = spark.table(s"${name}_clusters").count()
      assert(dupDocs == 3L)

      // CLI: --mode forget --table <family> reaches the cluster member
      // automatically (no separate flag to forget to pass)
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "forget", "--ids", "11", "--in", "unused:",
        "--table", name)))
      assert(assignments(name) == Map(2L -> 2L, 10L -> 2L))
      assert(spark.table(s"${name}_ndsh").filter(col("doc_id") === 11L).count() == 0)
    } finally for (t <- Seq(s"${name}_ndband", s"${name}_ndsh", s"${name}_clusters"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("crash mid-relabel: the durable edit log re-heals a component half-moved to the merged label") {
    val name = "clspec_wal"
    try {
      val old = corpus.toDF("doc_id", "text")
      Dedup.saveNearDupKeys(spark, name, old, "doc_id", "text")
      Dedup.saveClusterAssignments(spark, name,
        Dedup.clusters(Dedup.jaccardPairs(old, "doc_id", "text", threshold = 0.5)
          .select("doc_a", "doc_b")))
      // grow cluster {10,11} across a SECOND partition: doc 12 is doc
      // 10 with the last word changed (j = 12/14), landed under dayA
      val dayA = Seq((12L, s"$S six seven eight nine tenq"))
        .toDF("doc_id", "text")
      Dedup.appendNearDupKeys(spark, name, dayA, "doc_id", "text",
        ingestId = "dayA")
      Dedup.appendClusterAssignments(spark, name, dayA, "doc_id", "text",
        threshold = 0.5, ingestId = "dayA")
      assert(assignments(name) ==
        Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))

      // dayB's doc 5 bridges clusters 1 and 10 -> everything relabels
      // to 1, across BOTH the base and dayA partitions
      val dayB = Seq((5L, s"$S $A $B")).toDF("doc_id", "text")
      Dedup.appendNearDupKeys(spark, name, dayB, "doc_id", "text",
        ingestId = "dayB")

      // SIMULATED CRASH inside the dayB fold, reproducing the exact
      // state the fold's edit log exists for: the log is written, the
      // BASE partition (holding the delta-incident endpoints 2 and 10)
      // is already relabeled, the dayA partition (doc 12) is NOT, and
      // the batch partition never landed. Without the log, a retry
      // recomputes touched roots from CURRENT labels — no delta
      // endpoint carries label 10 anymore, so doc 12 would keep the
      // stale label FOREVER (one component split across two ids).
      val tbl = s"${name}_clusters"
      val edits = Seq((10L, Option(1L)), (11L, Option(1L)), (12L, Option(1L)))
        .toDF("doc_id", "new_cid")
      graft.sources.RelabelLog.begin(spark, tbl, edits)
      val buckets = graft.sources.Bucketing.bucketsOf(spark, tbl)
      val baseRelabeled = spark.table(tbl)
        .filter(col("ingest_id").cast("string") === "base")
        .withColumn("cluster_id",
          when(col("doc_id").isin(10L, 11L), 1L).otherwise(col("cluster_id")))
        .select("doc_id", "cluster_id")
        .localCheckpoint(true)
      graft.sources.Bucketing.writeBucketedIngest(spark, baseRelabeled, tbl,
        Seq("doc_id"), buckets, ingestId = "base")
      spark.catalog.refreshTable(tbl)
      // the hazardous half-applied state is real: component split,
      // stale half no longer reachable from any delta endpoint's label
      assert(assignments(name) ==
        Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 10L))

      // the RETRY (same batch, same ingest id) replays the log in its
      // preamble, THEN folds — reaching the exact rebuild state
      Dedup.appendClusterAssignments(spark, name, dayB, "doc_id", "text",
        threshold = 0.5, ingestId = "dayB")
      val expected = Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 10L -> 1L,
        11L -> 1L, 12L -> 1L)
      assert(assignments(name) == expected)
      val rebuild = Dedup.clusters(
        Dedup.jaccardPairs(old.unionByName(dayA).unionByName(dayB),
            "doc_id", "text", threshold = 0.5).select("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(rebuild == expected, s"fixture drifted from rebuild: $rebuild")
      // the log is consumed — nothing pending
      assert(!graft.sources.RelabelLog.recover(spark, tbl))
      // and a further replay of the fold changes nothing
      Dedup.appendClusterAssignments(spark, name, dayB, "doc_id", "text",
        threshold = 0.5, ingestId = "dayB")
      assert(assignments(name) == expected)
    } finally for (t <- Seq(s"${name}_ndband", s"${name}_ndsh", s"${name}_clusters"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("CLI cluster lifecycle: bootstrap then per-ingest fold through the dispatcher") {
    val name = "clspec_cli"
    val dir = java.nio.file.Files.createTempDirectory("clspec").toString
    try {
      corpus.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/old")
      // shared-landing shape for the append: the batch under its own
      // ingest_id partition, scoped by --ingest-id
      batch.toDF("doc_id", "text").withColumn("ingest_id", lit("day7"))
        .write.mode("overwrite").partitionBy("ingest_id")
        .parquet(s"$dir/landing")
      Dedup.saveNearDupKeys(spark, name,
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "cluster", "--in", s"parquet:$dir/old",
        "--table", name, "--sim-threshold", "0.5")))
      assert(assignments(name) == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "cluster", "--in", s"parquet:$dir/landing",
        "--table", name, "--sim-threshold", "0.5", "--ingest-id", "day7",
        "--commits", name)))
      assert(assignments(name) == Map(1L -> 1L, 2L -> 1L, 5L -> 1L,
        10L -> 1L, 11L -> 1L, 30L -> 30L, 31L -> 30L))
      // --commits marked the fold: the audit can tell a completed
      // (possibly edgeless, partition-less) fold from a crashed one
      assert(graft.sources.FamilyCommit.committedIds(spark, name)
        .exists(_.contains("day7")))
      // the bootstrap PINNED the threshold on the table: a later fold
      // at a different cutoff would silently break rebuild-equivalence,
      // so the dispatcher refuses it loudly
      val e = intercept[IllegalArgumentException] {
        graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
          "--mode", "cluster", "--in", s"parquet:$dir/landing",
          "--table", name, "--sim-threshold", "0.7", "--ingest-id", "day8")))
      }
      assert(e.getMessage.contains("sim-threshold 0.5"), e.getMessage)
      // the pinned value keeps working (replay of day7: no-op fold)
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "cluster", "--in", s"parquet:$dir/landing",
        "--table", name, "--sim-threshold", "0.5", "--ingest-id", "day7")))
      assert(assignments(name) == Map(1L -> 1L, 2L -> 1L, 5L -> 1L,
        10L -> 1L, 11L -> 1L, 30L -> 30L, 31L -> 30L))
      // the pin SURVIVES compaction: the rename-based swap recreates
      // the table, and an uncopied TBLPROPERTY would silently disarm
      // the drift detector right when the store is oldest
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "compact", "--in", "unused:",
        "--table", s"${name}_clusters:doc_id", "--keep-last", "0")))
      val e2 = intercept[IllegalArgumentException] {
        graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
          "--mode", "cluster", "--in", s"parquet:$dir/landing",
          "--table", name, "--sim-threshold", "0.7", "--ingest-id", "day9")))
      }
      assert(e2.getMessage.contains("sim-threshold 0.5"),
        s"pin must survive the compaction swap: ${e2.getMessage}")
    } finally for (t <- Seq(s"${name}_ndband", s"${name}_ndsh",
      s"${name}_clusters", s"${name}_commits"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
