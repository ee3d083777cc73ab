package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}
import graft.sources.{Bucketing, FamilyCommit}

/** `--mode status`: the manifest-driven deployment dashboard — every
  * declared family's per-ingest health (marker-aware where the family
  * enforces commits, consistency-audit fallback for legacy-open ones)
  * plus the ANN recall verdicts, in one invocation. */
class StatusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w1 = "the quick brown fox jumps over the lazy dog tonight"
  private val w2 = "completely different words fill this second document body here"
  private val w3 = "a third unique text that matches nothing in the corpus"

  test("one manifest, one table: crashed/in-flight/committed attributed per family; legacy fallback; recall verdict") {
    val nd = "stat_nd"
    val ex = "stat_ex"
    val lx = "stat_lx"
    val ivf = "stat_ivf"
    val manifest = java.nio.file.Files.createTempFile("status", ".manifest")
    try {
      // family 1 (markers): committed base, one in-flight, one crashed
      val corpus = Seq((1L, w1), (2L, w2)).toDF("doc_id", "text")
      Dedup.saveNearDupKeys(spark, nd, corpus, "doc_id", "text")
      FamilyCommit.commit(spark, nd, "base")
      Dedup.appendNearDupKeys(spark, nd,
        Seq((20L, w1.replace("dog", "cat"))).toDF("doc_id", "text"),
        "doc_id", "text", ingestId = "liveday") // uncommitted + fresh
      Dedup.appendNearDupKeys(spark, nd,
        Seq((30L, w2.replace("words", "verbs"))).toDF("doc_id", "text"),
        "doc_id", "text", ingestId = "deadday") // uncommitted + old
      val loc = new org.apache.hadoop.fs.Path(
        Bucketing.tableLocation(spark, s"${nd}_ndband"), "ingest_id=deadday")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.setTimes(loc, System.currentTimeMillis() - 3600000L, -1)
      val loc2 = new org.apache.hadoop.fs.Path(
        Bucketing.tableLocation(spark, s"${nd}_ndsh"), "ingest_id=deadday")
      fs.setTimes(loc2, System.currentTimeMillis() - 3600000L, -1)

      // family 2 (markers): all committed
      Dedup.saveIncrementalKeys(spark, ex, corpus, "text")
      FamilyCommit.commit(spark, ex, "base")
      Dedup.appendIncrementalKeys(spark, ex,
        Seq((10L, w3)).toDF("doc_id", "text"), "text", "okday")
      FamilyCommit.commit(spark, ex, "okday")

      // family 3 (legacy-open, no _commits): one consistent ingest,
      // one half-landed (only the _norm member) -> inconsistent
      Dedup.saveIncrementalKeys(spark, lx, corpus, "text")
      Bucketing.writeBucketedIngest(spark,
        Seq((w3.hashCode.toString + "fp")).toDF("__norm_key"),
        s"${lx}_norm", Seq("__norm_key"),
        Bucketing.bucketsOf(spark, s"${lx}_norm"), "halfday")

      // healthy IVF index for the recall line
      val rnd = new scala.util.Random(7)
      def gauss(n: Int) = Seq.fill(n)(rnd.nextGaussian() * 0.1)
      val vecs = (0 until 20).map(i => (i.toLong, (10.0 + rnd.nextGaussian() * 0.1) +: gauss(7))) ++
        (100 until 120).map(i => (i.toLong, (-10.0 + rnd.nextGaussian() * 0.1) +: gauss(7)))
      Similarity.saveIvfIndex(spark,
        Similarity.ivfIndex(vecs.toDF("id", "vec"), nCentroids = 2, iters = 3), ivf)

      java.nio.file.Files.write(manifest, java.util.Arrays.asList(
        "# deployment manifest",
        s"$nd: ${nd}_ndband,${nd}_ndsh",
        s"$ex: ${ex}_norm,${ex}_bands",
        "",
        s"$lx: ${lx}_norm,${lx}_bands",
        s"recall: index=$ivf k=2 nprobe=2 sample=50 min-recall=0.5"))

      val rows = graft.tools.EdgeRunner.runStatus(spark,
        graft.tools.EdgeRunner.parse(Array(
          "--mode", "status", "--in", "unused:",
          "--manifest", manifest.toString, "--grace-sec", "60")))
      val byKey = rows.map(r => (r._1, r._2) -> r._3).toMap
      assert(byKey((nd, "base")) == "committed")
      assert(byKey((nd, "liveday")) == "in-flight")
      assert(byKey((nd, "deadday")) == "crashed")
      assert(byKey((ex, "base")) == "committed")
      assert(byKey((ex, "okday")) == "committed")
      assert(byKey((lx, "base")) == "consistent (legacy-open)")
      assert(byKey((lx, "halfday")) == "inconsistent")
      val recallRow = byKey((s"recall:$ivf", "-"))
      assert(recallRow.startsWith("OK"), recallRow)
      assert(rows.size == 8)
    } finally {
      java.nio.file.Files.deleteIfExists(manifest)
      for (t <- Seq(s"${nd}_ndband", s"${nd}_ndsh", s"${nd}_commits",
        s"${ex}_norm", s"${ex}_bands", s"${ex}_commits",
        s"${lx}_norm", s"${lx}_bands",
        s"${ivf}_centroids", s"${ivf}_assignments"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("a broken deployment yields an error row, not a dead dashboard") {
    val ex = "stat_err_ok"
    val manifest = java.nio.file.Files.createTempFile("status_err", ".manifest")
    try {
      // one healthy family...
      Dedup.saveIncrementalKeys(spark, ex,
        Seq((1L, w1)).toDF("doc_id", "text"), "text")
      FamilyCommit.commit(spark, ex, "base")
      // ...listed ALONGSIDE a recall line whose index table was
      // dropped and a family whose member tables never existed — the
      // status tool exists to report exactly these, so it must emit
      // error rows and keep going, not die on the first one
      java.nio.file.Files.write(manifest, java.util.Arrays.asList(
        "recall: index=stat_err_gone k=2",
        s"stat_err_fam: stat_err_fam_norm,stat_err_fam_bands",
        s"$ex: ${ex}_norm,${ex}_bands"))
      val rows = graft.tools.EdgeRunner.runStatus(spark,
        graft.tools.EdgeRunner.parse(Array(
          "--mode", "status", "--in", "unused:",
          "--manifest", manifest.toString)))
      val byFam = rows.groupBy(_._1)
      assert(byFam("recall:stat_err_gone").head._3.startsWith("error:"))
      assert(byFam("stat_err_fam").head._3.startsWith("error:"))
      // the healthy family's rows survived the earlier failures
      assert(byFam(ex).map(r => (r._2, r._3)).contains(("base", "committed")))
    } finally {
      java.nio.file.Files.deleteIfExists(manifest)
      for (t <- Seq(s"${ex}_norm", s"${ex}_bands", s"${ex}_commits"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("drift manifest line: no-new-ingest OK; a skew-routed append flags RETRAIN? with the top cell's shift") {
    val ivf = "stat_drift_ivf"
    val manifest = java.nio.file.Files.createTempFile("status_drift", ".manifest")
    try {
      val rnd = new scala.util.Random(11)
      def gauss(n: Int) = Seq.fill(n)(rnd.nextGaussian() * 0.1)
      // base build: two tight clusters, 20 vectors each
      val base = (0 until 20).map(i =>
          (i.toLong, (10.0 + rnd.nextGaussian() * 0.1) +: gauss(7))) ++
        (100 until 120).map(i =>
          (i.toLong, (-10.0 + rnd.nextGaussian() * 0.1) +: gauss(7)))
      Similarity.saveIvfIndex(spark,
        Similarity.ivfIndex(base.toDF("id", "vec"), nCentroids = 2, iters = 3),
        ivf)
      java.nio.file.Files.write(manifest,
        java.util.Arrays.asList(s"drift: index=$ivf"))
      def driftRow() = graft.tools.EdgeRunner.runStatus(spark,
        graft.tools.EdgeRunner.parse(Array(
          "--mode", "status", "--in", "unused:",
          "--manifest", manifest.toString, "--grace-sec", "60"))).head
      val r1 = driftRow()
      assert(r1._1 == s"drift:$ivf" && r1._3 == "OK (no post-base ingest)", r1)
      // an append routing ENTIRELY into one cell: new-segment share
      // 100/0 vs the base's 50/50 — top-cell shift 0.5 >= floor
      val newVecs = (200 until 230).map(i =>
        (i.toLong, (10.0 + rnd.nextGaussian() * 0.1) +: gauss(7)))
      Similarity.appendToIvfIndex(spark, ivf, newVecs.toDF("id", "vec"), "day2")
      val r2 = driftRow()
      assert(r2._3.startsWith("RETRAIN?"), r2)
      assert(r2._3.contains("shift 0.500000"), r2)
    } finally {
      java.nio.file.Files.deleteIfExists(manifest)
      for (t <- Seq(s"${ivf}_centroids", s"${ivf}_assignments"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("drift line with NO base-ingest rows reports RETRAIN?, never a false OK") {
    // regression: occ_shift is NULL when the old segment is empty, and
    // getAs[Double] unboxes NULL to 0.0 — which read as 'OK shift
    // 0.000000' for an index whose ENTIRE mass is post-base
    val ivf = "stat_nobase_ivf"
    val manifest = java.nio.file.Files.createTempFile("status_nobase", ".manifest")
    try {
      // hand-built index: centroids + assignments landed ONLY under a
      // post-base ingest id (base vectors forgotten/compacted away
      // over the index's life)
      Seq((0, 0, 1.0), (0, 1, 0.0), (1, 0, 0.0), (1, 1, 1.0))
        .toDF("cid", "pos", "v")
        .write.mode("overwrite").format("parquet")
        .saveAsTable(s"${ivf}_centroids")
      graft.sources.Bucketing.writeBucketedIngest(spark,
        Seq((1L, Seq(1.0, 0.0), 0), (2L, Seq(0.0, 1.0), 1))
          .toDF("id", "vec", "cid"),
        s"${ivf}_assignments", Seq("cid"), buckets = 2,
        ingestId = "day9", overwrite = true)
      java.nio.file.Files.write(manifest,
        java.util.Arrays.asList(s"drift: index=$ivf"))
      val row = graft.tools.EdgeRunner.runStatus(spark,
        graft.tools.EdgeRunner.parse(Array(
          "--mode", "status", "--in", "unused:",
          "--manifest", manifest.toString, "--grace-sec", "60"))).head
      assert(row._1 == s"drift:$ivf" && row._3.startsWith("RETRAIN?") &&
        row._3.contains("no base-ingest rows"), row)
    } finally {
      java.nio.file.Files.deleteIfExists(manifest)
      for (t <- Seq(s"${ivf}_centroids", s"${ivf}_assignments"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("malformed manifest lines fail loudly") {
    val manifest = java.nio.file.Files.createTempFile("status_bad", ".manifest")
    try {
      java.nio.file.Files.write(manifest,
        java.util.Arrays.asList("justafamilywithnomembers"))
      val e = intercept[RuntimeException] {
        graft.tools.EdgeRunner.runStatus(spark,
          graft.tools.EdgeRunner.parse(Array(
            "--mode", "status", "--in", "unused:",
            "--manifest", manifest.toString)))
      }
      assert(e.getMessage.contains("malformed manifest line"))
    } finally java.nio.file.Files.deleteIfExists(manifest)
  }
}
