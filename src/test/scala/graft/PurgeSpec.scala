package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Bulk purge (`--mode forget --source X`) at the compaction cadence:
  * the source vanishes from the landing AND every doc-keyed derived
  * store in one fold pass per store, bucket specs survive, cluster
  * contracts (min-member labels, ≥2 membership) are re-established
  * inside the fold, and the replay horizon's kept ingests stay
  * separate partitions. */
class PurgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the ClusterLifecycleSpec shingle geometry, with sources: purging
  // "badsrc" removes the {1,2,5,10,11} cluster's bridge (5) AND the
  // {10,11} wing — survivors {1,2} keep label 1; {30,31} is untouched
  private val S = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val A = "one two three four five"
  private val B = "six seven eight nine ten"
  private val U = "red orange yellow green blue indigo violet umber sable wheat"
  private val corpus = Seq(
    (1L, s"$S one two three four fivex", "keepme", "en"),
    (2L, s"$S $A", "keepme", "en"),
    (10L, s"$S $B", "badsrc", "en"),
    (11L, s"$S six seven eight nine tenx", "badsrc", "fr"),
    (20L, "lonely words that match nothing else in this corpus at all", "keepme", "en"))
  private val batch = Seq(
    (5L, s"$S $A $B", "badsrc", "en"),
    (30L, U, "keepme", "fr"),
    (31L, "red orange yellow green blue indigo violet umber sable wheatx", "keepme", "fr"),
    (40L, "another unrelated singleton document with no duplicate twin", "keepme", "en"))

  test("purge --source: one compaction pass per store, clusters re-contracted, horizon intact") {
    val name = "purgespec_nd"
    val dir = java.nio.file.Files.createTempDirectory("purgespec")
      .toString + "/landing"
    try {
      val cols = Seq("doc_id", "text", "source", "lang")
      val old = corpus.toDF(cols: _*)
      val delta = batch.toDF(cols: _*)
      graft.sources.Connectors.overwritePartitions(
        old.withColumn("ingest_id", lit("base")), dir, Seq("lang", "ingest_id"))
      graft.sources.Connectors.overwritePartitions(
        delta.withColumn("ingest_id", lit("2026-08-13")), dir,
        Seq("lang", "ingest_id"))
      Dedup.saveNearDupKeys(spark, name, old.select("doc_id", "text"),
        "doc_id", "text")
      Dedup.saveClusterAssignments(spark, name,
        Dedup.clusters(Dedup.jaccardPairs(old, "doc_id", "text",
          threshold = 0.5).select("doc_a", "doc_b")))
      Dedup.appendNearDupKeys(spark, name, delta.select("doc_id", "text"),
        "doc_id", "text", ingestId = "2026-08-13")
      Dedup.appendClusterAssignments(spark, name,
        delta.select("doc_id", "text"), "doc_id", "text",
        threshold = 0.5, ingestId = "2026-08-13")
      assert(spark.table(s"${name}_clusters").select("doc_id", "cluster_id")
        .as[(Long, Long)].collect().toMap ==
        Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 10L -> 1L, 11L -> 1L,
          30L -> 30L, 31L -> 30L))

      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "forget", "--source", "badsrc", "--in", s"parquet:$dir",
        "--partition-by", "lang,ingest_id", "--table", name)))

      // the landing: source gone, everything else intact, newest
      // ingest still its own partition (replay horizon)
      val landed = spark.read.parquet(dir)
      assert(landed.filter(col("source") === "badsrc").count() == 0)
      assert(landed.select("doc_id").as[Long].collect().toSet ==
        Set(1L, 2L, 20L, 30L, 31L, 40L))
      assert(landed.select(col("ingest_id").cast("string")).distinct()
        .as[String].collect().toSet == Set("base", "2026-08-13"))

      // derived stores: purged doc ids gone everywhere
      for (t <- Seq(s"${name}_ndsh", s"${name}_clusters"))
        assert(spark.table(t).filter(col("doc_id").isin(5L, 10L, 11L))
          .count() == 0, s"purged ids must vanish from $t")
      assert(spark.table(s"${name}_ndband")
        .filter(col("doc_id").isin(5L, 10L, 11L)).count() == 0)

      // the merged cluster relabeled to its surviving min member and
      // kept its >=2 contract; the untouched cluster is intact
      assert(spark.table(s"${name}_clusters").select("doc_id", "cluster_id")
        .as[(Long, Long)].collect().toMap ==
        Map(1L -> 1L, 2L -> 1L, 30L -> 30L, 31L -> 30L))

      // bucket layout survived the fold: exchange-free self-join
      val prevAb = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val t = spark.table(s"${name}_ndsh").select("doc_id")
        val plan = t.join(t.select(col("doc_id")), "doc_id")
          .queryExecution.executedPlan.toString
        assert(!plan.contains("ShuffleExchange"),
          s"bucket join must stay exchange-free after the purge:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAb)

      // idempotent: a re-run purges nothing further
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "forget", "--source", "badsrc", "--in", s"parquet:$dir",
        "--partition-by", "lang,ingest_id", "--table", name)))
      assert(spark.read.parquet(dir).count() == 6L)
      assert(spark.table(s"${name}_clusters").count() == 4L)
    } finally for (t <- Seq(s"${name}_ndband", s"${name}_ndsh", s"${name}_clusters"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
