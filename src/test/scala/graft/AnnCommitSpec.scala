package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.sources.FamilyCommit

/** Commit-marker visibility on the ANN posting families — the read-side
  * replay discipline extended to IVF/ADC: an append writes its member
  * tables SEQUENTIALLY (assignments, then ADC postings), so a probe or
  * a recall-monitor sample taken between the writes sees a half-landed
  * ingest. With a `{prefix}_commits` table, every probe-path read
  * (loadIvfIndex → ivfTopK / ivfRecallCheck, adcRecallCheck's posting
  * read, ensureAdcPostings' return) filters to committed ∪ base, so
  * the half-landed window is never READABLE — while writers (retrain,
  * appends) stay ungated and converge from the true on-disk state. */
class AnnCommitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gauss(rnd: scala.util.Random, n: Int, sd: Double): Seq[Double] =
    Seq.fill(n)(rnd.nextGaussian() * sd)

  test("uncommitted IVF/ADC ingest invisible to probes and recallAtK until its marker lands; writers stay ungated") {
    val rnd = new scala.util.Random(23)
    val dim = 8; val m = 2
    val base = (0 until 40).map(i =>
      (i.toLong, (if (i % 2 == 0) 8.0 else -8.0) +: gauss(rnd, dim - 1, 0.1)))
    val (ivfN, pqN) = ("anncommit_ivf", "anncommit_pq")
    val tables = Seq(s"${ivfN}_centroids", s"${ivfN}_assignments",
      s"${ivfN}_commits", s"${pqN}_codes", s"${pqN}_books", s"${pqN}_adc",
      s"${pqN}_commits")
    try {
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val ivf = Similarity.ivfIndex(base.toDF("id", "vec"), nCentroids = 2,
        iters = 3)
      Similarity.saveIvfIndex(spark, ivf, ivfN)
      val (codes, books) = Similarity.productQuantizeModel(
        base.toDF("id", "vec").select(col("id").as("vec_id"),
          col("vec").as("embedding")), m = m, k = 4, iters = 2, dim = dim)
      Similarity.savePqModel(spark, pqN, codes, books)
      Similarity.ensureAdcPostings(spark, pqN, ivf, codes, m = m)
      // switch BOTH families to enforced visibility (bootstrap commit)
      FamilyCommit.commit(spark, ivfN, "base")
      FamilyCommit.commit(spark, pqN, "base")
      val healthy = Similarity.adcRecallCheck(spark, ivfN, pqN, dim = dim,
        k = 3, nProbe = 1, shortlist = 64, sampleN = 64, minRecall = 0.9)
      assert(healthy.recall == 1.0 && !healthy.retrain)

      // day1 lands its FIRST member (assignments) — the half-landed
      // window the marker exists for: postings don't exist yet
      val day1 = (100 until 110).map(i =>
        (i.toLong, (if (i % 2 == 0) 8.0 else -8.0) +: gauss(rnd, dim - 1, 0.1)))
      Similarity.appendToIvfIndex(spark, ivfN, day1.toDF("id", "vec"),
        ingestId = "day1")

      // probes exclude the uncommitted ingest entirely
      val day1Ids = day1.map(_._1).toSet
      val model = Similarity.loadIvfIndex(spark, ivfN)
      assert(model.assignments.filter(col("id").isin(day1Ids.toSeq: _*))
        .count() == 0, "gated probe model must not see the uncommitted ingest")
      val probed = Similarity.ivfTopK(
        day1.take(2).toDF("id", "vec"), model, k = 3, nProbe = 2)
        .select("neighbor_id").as[Long].collect().toSet
      assert(probed.intersect(day1Ids).isEmpty,
        s"uncommitted vectors surfaced in top-k: ${probed.intersect(day1Ids)}")
      // ...and the monitor cannot sample the half-landed state: recall
      // is measured over the committed corpus only — no false RETRAIN
      val mid = Similarity.adcRecallCheck(spark, ivfN, pqN, dim = dim,
        k = 3, nProbe = 1, shortlist = 64, sampleN = 64, minRecall = 0.9)
      assert(mid.recall == 1.0 && !mid.retrain,
        s"half-landed append leaked into the monitor: ${mid.recall}")

      // second member lands; still uncommitted — still invisible
      Similarity.appendToAdcPostings(spark, ivfN, pqN,
        day1.toDF("id", "vec"), m = m, ingestId = "day1", dim = dim)
      assert(Similarity.loadIvfIndex(spark, ivfN).assignments
        .filter(col("id").isin(day1Ids.toSeq: _*)).count() == 0)
      val post = Similarity.adcRecallCheck(spark, ivfN, pqN, dim = dim,
        k = 3, nProbe = 1, shortlist = 64, sampleN = 64, minRecall = 0.9)
      assert(post.recall == 1.0 && !post.retrain)

      // markers land (after the family's LAST member write) — the
      // ingest becomes readable atomically per family
      FamilyCommit.commit(spark, ivfN, "day1")
      FamilyCommit.commit(spark, pqN, "day1")
      val after = Similarity.loadIvfIndex(spark, ivfN)
      assert(after.assignments.filter(col("id").isin(day1Ids.toSeq: _*))
        .count() == day1.size.toLong)
      val probedAfter = Similarity.ivfTopK(
        day1.take(2).toDF("id", "vec"), after, k = 1, nProbe = 2)
        .select("neighbor_id").as[Long].collect().toSet
      assert(probedAfter.subsetOf(day1Ids),
        "a committed vector must find itself at rank 1")
      val committed = Similarity.adcRecallCheck(spark, ivfN, pqN, dim = dim,
        k = 3, nProbe = 1, shortlist = 64, sampleN = 200, minRecall = 0.9)
      assert(committed.recall == 1.0 && !committed.retrain)

      // crash BETWEEN the two marker commits: the ingest is committed
      // in the IVF family only. The monitor's views are DOUBLE-gated —
      // an ingest counts only once committed in BOTH families — so the
      // half-committed state is invisible in full, never half-seen
      // (single-family gating would sample its vectors while their
      // postings stay invisible: a guaranteed spurious collapse and a
      // false RETRAIN that persists until repair)
      val day1b = (300 until 310).map(i =>
        (i.toLong, (if (i % 2 == 0) 8.0 else -8.0) +: gauss(rnd, dim - 1, 0.1)))
      Similarity.appendToIvfIndex(spark, ivfN, day1b.toDF("id", "vec"),
        ingestId = "day1b")
      Similarity.appendToAdcPostings(spark, ivfN, pqN,
        day1b.toDF("id", "vec"), m = m, ingestId = "day1b", dim = dim)
      FamilyCommit.commit(spark, ivfN, "day1b") // ...crash before the pq marker
      val half = Similarity.adcRecallCheck(spark, ivfN, pqN, dim = dim,
        k = 3, nProbe = 1, shortlist = 64, sampleN = 200, minRecall = 0.9)
      assert(half.recall == 1.0 && !half.retrain,
        s"half-committed ingest false-triggered the monitor: ${half.recall}")
      FamilyCommit.commit(spark, pqN, "day1b") // the retry completes it
      val both = Similarity.adcRecallCheck(spark, ivfN, pqN, dim = dim,
        k = 3, nProbe = 1, shortlist = 64, sampleN = 200, minRecall = 0.9)
      assert(both.recall == 1.0 && !both.retrain)

      // the gated read stays PARTITION-PRUNED: the visibility filter is
      // a literal IN on the partition column, pushed to PartitionFilters
      val plan = Similarity.loadIvfIndex(spark, ivfN).assignments
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") &&
        "PartitionFilters: \\[[^\\]]*ingest_id".r.findFirstIn(plan).isDefined,
        s"visibility filter must prune partitions:\n$plan")

      // WRITERS are ungated: a retrain run while day2 sits uncommitted
      // must carry day2's vectors into the rebuilt base (data must
      // never be dropped by a rebuild), after which they are visible
      // by construction
      val day2 = (200 until 206).map(i =>
        (i.toLong, (if (i % 2 == 0) 8.0 else -8.0) +: gauss(rnd, dim - 1, 0.1)))
      Similarity.appendToIvfIndex(spark, ivfN, day2.toDF("id", "vec"),
        ingestId = "day2")
      Similarity.retrainIvfIndex(spark, ivfN, nCentroids = 2, iters = 2)
      val rebuilt = Similarity.loadIvfIndex(spark, ivfN).assignments
      assert(rebuilt.filter(col("id").isin(day2.map(_._1): _*)).count()
        == day2.size.toLong,
        "retrain must fold uncommitted vectors into base, not drop them")
    } finally tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("--mode index CLI: append routes both members, --commits lands both markers after the last write") {
    val rnd = new scala.util.Random(29)
    val dim = 8; val m = 2
    val base = (0 until 30).map(i =>
      (i.toLong, (if (i % 2 == 0) 6.0 else -6.0) +: gauss(rnd, dim - 1, 0.1)))
    val day = (300 until 308).map(i =>
      (i.toLong, (if (i % 2 == 0) 6.0 else -6.0) +: gauss(rnd, dim - 1, 0.1)))
    val (ivfN, pqN) = ("anncli_ivf", "anncli_pq")
    val tables = Seq(s"${ivfN}_centroids", s"${ivfN}_assignments",
      s"${ivfN}_commits", s"${pqN}_codes", s"${pqN}_books", s"${pqN}_adc",
      s"${pqN}_commits")
    val dir = java.nio.file.Files.createTempDirectory("anncli").toString
    try {
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      base.toDF("id", "vec").write.mode("overwrite").parquet(s"$dir/base")
      day.toDF("id", "vec").withColumn("ingest_id", lit("day9"))
        .write.mode("overwrite").partitionBy("ingest_id")
        .parquet(s"$dir/landing")
      // bootstrap through the CLI (IVF-only by contract), PQ members
      // via the library, then commit both families' base
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "index", "--in", s"parquet:$dir/base",
        "--index", ivfN, "--centroids", "2", "--commits", ivfN)))
      assert(FamilyCommit.committedIds(spark, ivfN).exists(_.contains("base")))
      val ivf = Similarity.loadIvfIndex(spark, ivfN, gated = false)
      val (codes, books) = Similarity.productQuantizeModel(
        base.toDF("id", "vec").select(col("id").as("vec_id"),
          col("vec").as("embedding")), m = m, k = 4, iters = 2, dim = dim)
      Similarity.savePqModel(spark, pqN, codes, books)
      Similarity.ensureAdcPostings(spark, pqN, ivf, codes, m = m)
      FamilyCommit.commit(spark, pqN, "base")

      // the maintenance append: both members + both markers in one call
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "index", "--in", s"parquet:$dir/landing",
        "--index", ivfN, "--pq", pqN, "--dim", dim.toString,
        "--ingest-id", "day9", "--commits", ivfN)))
      assert(FamilyCommit.committedIds(spark, ivfN).exists(_.contains("day9")))
      assert(FamilyCommit.committedIds(spark, pqN).exists(_.contains("day9")))
      val dayIds = day.map(_._1)
      assert(Similarity.loadIvfIndex(spark, ivfN).assignments
        .filter(col("id").isin(dayIds: _*)).count() == day.size.toLong)
      assert(FamilyCommit.visible(spark, spark.table(s"${pqN}_adc"), pqN)
        .filter(col("neighbor_id").isin(dayIds: _*)).count() == day.size.toLong)
      // replay-idempotent: the same CLI append replaces its own partitions
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "index", "--in", s"parquet:$dir/landing",
        "--index", ivfN, "--pq", pqN, "--dim", dim.toString,
        "--ingest-id", "day9", "--commits", ivfN)))
      assert(spark.table(s"${ivfN}_assignments")
        .filter(col("id").isin(dayIds: _*)).count() == day.size.toLong)
    } finally tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
