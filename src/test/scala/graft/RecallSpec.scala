package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** The ANN recall monitor — the measurement the append-maintenance
  * paths defer their re-train cadence to. The drift scenario is the
  * canonical IVF failure mode: appended vectors form a new mode that
  * STRADDLES a frozen-centroid decision boundary, so each lands in
  * whichever cell it leans toward and a low-nProbe probe sees only the
  * half that shares its cell. */
class RecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gauss(rnd: scala.util.Random, n: Int, sd: Double): Seq[Double] =
    Seq.fill(n)(rnd.nextGaussian() * sd)

  test("recallAtK: identical frames 1.0, disjoint 0.0, half overlap 0.5") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    assert(Similarity.recallAtK(exact, exact) == 1.0)
    val none = Seq((1L, 99L)).toDF("query_id", "neighbor_id")
    assert(Similarity.recallAtK(none, exact) == 0.0)
    val half = Seq((1L, 10L), (2L, 20L)).toDF("query_id", "neighbor_id")
    assert(Similarity.recallAtK(half, exact) == 0.5)
  }

  test("ivfRecallCheck: healthy index verdicts OK; a drifted append flips it to RETRAIN") {
    val rnd = new scala.util.Random(7)
    // two tight, well-separated modes: the frozen quantizer's world
    val clusterA = (0 until 20).map(i =>
      (i.toLong, (10.0 + rnd.nextGaussian() * 0.1) +: gauss(rnd, 7, 0.1)))
    val clusterB = (100 until 120).map(i =>
      (i.toLong, (-10.0 + rnd.nextGaussian() * 0.1) +: gauss(rnd, 7, 0.1)))
    val name = "recall_ivf"
    try {
      for (t <- Seq(s"${name}_centroids", s"${name}_assignments"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
      Similarity.saveIvfIndex(spark,
        Similarity.ivfIndex((clusterA ++ clusterB).toDF("id", "vec"),
          nCentroids = 2, iters = 3), name)
      val healthy = Similarity.ivfRecallCheck(spark, name,
        k = 2, nProbe = 1, sampleN = 200, minRecall = 0.9)
      assert(healthy.recall == 1.0,
        s"well-separated clusters under their own centroids: ${healthy.recall}")
      assert(!healthy.retrain)

      // the drifted day: a new mode at the MIDPOINT, dominant direction
      // orthogonal to the old axis, built as TWIN PAIRS that differ
      // only in the sign of a small dim-0 offset — each vector's
      // nearest neighbor (its twin, cosine ~1) deterministically routes
      // to the OPPOSITE frozen cell, so an nProbe=1 probe cannot see it
      // pair-identifying components are LARGE (sd 1.0) and HIGH-DIM
      // (6 of 8 dims: cross-pair signatures are near-orthogonal, so no
      // other vector can outrank the twin in cosine), while the small
      // dim-0 offset (±0.1) still decides the cell — ranking and
      // routing deliberately decoupled
      val drift = (0 until 15).flatMap { i =>
        val w = gauss(rnd, 6, 1.0)
        Seq((200L + 2 * i, Seq(0.1, 5.0) ++ w),
          (201L + 2 * i, Seq(-0.1, 5.0) ++ w))
      }
      Similarity.appendToIvfIndex(spark, name, drift.toDF("id", "vec"),
        ingestId = "drift-day")
      val drifted = Similarity.ivfRecallCheck(spark, name,
        k = 2, nProbe = 1, sampleN = 200, minRecall = 0.9)
      assert(drifted.recall < healthy.recall)
      assert(drifted.retrain,
        s"boundary-straddling mode must trip the verdict: ${drifted.recall}")
      // the monitor is measuring a ROUTING gap, not a broken probe:
      // widening nProbe to cover both straddled cells restores recall
      val widened = Similarity.ivfRecallCheck(spark, name,
        k = 2, nProbe = 2, sampleN = 200, minRecall = 0.9)
      assert(widened.recall == 1.0 && !widened.retrain)
      // ...and ACTING on the verdict fixes it at the original nProbe:
      // a 3-centroid re-train gives the drifted mode its own cell, so
      // each twin pair co-locates again
      Similarity.retrainIvfIndex(spark, name, nCentroids = 3, iters = 3)
      val retrained = Similarity.ivfRecallCheck(spark, name,
        k = 2, nProbe = 1, sampleN = 200, minRecall = 0.9)
      assert(retrained.recall > drifted.recall,
        s"retrain must recover recall: ${drifted.recall} -> ${retrained.recall}")
      assert(!retrained.retrain,
        s"verdict must flip back to OK after the retrain: ${retrained.recall}")
    } finally for (t <- Seq(s"${name}_centroids", s"${name}_assignments"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("adcRecallCheck monitors the IVF-ADC path (routing + encoding drift together)") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(13)
    val dim = 8; val m = 2
    // two tight modes: coarse routing and PQ encoding are both healthy
    val vecs = (0 until 40).map(i =>
      (i.toLong, (if (i % 2 == 0) 8.0 else -8.0) +: gauss(rnd, dim - 1, 0.1)))
    val (ivfN, pqN) = ("recall_adc", "recall_adc_pq")
    try {
      for (t <- Seq(s"${ivfN}_centroids", s"${ivfN}_assignments",
          s"${pqN}_codes", s"${pqN}_books", s"${pqN}_adc"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
      val ivf = Similarity.ivfIndex(vecs.toDF("id", "vec"), nCentroids = 2, iters = 3)
      Similarity.saveIvfIndex(spark, ivf, ivfN)
      val (codes, books) = Similarity.productQuantizeModel(
        vecs.toDF("id", "vec").select(col("id").as("vec_id"),
          col("vec").as("embedding")),
        m = m, k = 4, iters = 2, dim = dim)
      Similarity.savePqModel(spark, pqN, codes, books)
      Similarity.ensureAdcPostings(spark, pqN, ivf, codes, m = m)
      // generous shortlist: the exact rerank sees every cell member, so
      // a healthy quantizer pair must reproduce brute force exactly
      val r = Similarity.adcRecallCheck(spark, ivfN, pqN, dim = dim,
        k = 3, nProbe = 1, shortlist = 40, sampleN = 64, minRecall = 0.9)
      assert(r.recall == 1.0 && !r.retrain, s"healthy ADC stack: ${r.recall}")
      // the CLI face: --pq switches the check to this path
      val cfg = graft.tools.EdgeRunner.parse(Array(
        "--mode", "recall-check", "--in", "unused:", "--index", ivfN,
        "--pq", pqN, "--dim", dim.toString, "--k", "3", "--nprobe", "1",
        "--shortlist", "40"))
      assert(graft.tools.EdgeRunner.runRecallCheck(spark, cfg).recall == 1.0)
    } finally for (t <- Seq(s"${ivfN}_centroids", s"${ivfN}_assignments",
        s"${pqN}_codes", s"${pqN}_books", s"${pqN}_adc"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("retrainPqBooks: encoding drift flips the ADC verdict; re-encode restores it") {
    import org.apache.spark.sql.functions.col
    val dim = 8; val m = 2
    // the frozen-codebook world, EXACT by construction (no noise, so
    // every tie below is an exact tie and the whole scenario is
    // deterministic): two point-modes along dim 0; subspace 1
    // (dims 4-7) is identically ZERO, so its learned codebook is all
    // zero centroids — every subspace-1 LUT entry will be exactly 0
    val old = (0 until 40).map(i =>
      (i.toLong, (if (i % 2 == 0) 8.0 else -8.0) +: Seq.fill(dim - 1)(0.0)))
    val (ivfN, pqN) = ("retrain_adc", "retrain_adc_pq")
    val tables = Seq(s"${ivfN}_centroids", s"${ivfN}_assignments",
      s"${pqN}_codes", s"${pqN}_books", s"${pqN}_adc")
    try {
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val ivf = Similarity.ivfIndex(old.toDF("id", "vec"), nCentroids = 2, iters = 3)
      Similarity.saveIvfIndex(spark, ivf, ivfN)
      val (codes, books) = Similarity.productQuantizeModel(
        old.toDF("id", "vec").select(col("id").as("vec_id"),
          col("vec").as("embedding")),
        m = m, k = 8, iters = 2, dim = dim)
      Similarity.savePqModel(spark, pqN, codes, books)
      Similarity.ensureAdcPostings(spark, pqN, ivf, codes, m = m)
      def check() = Similarity.adcRecallCheck(spark, ivfN, pqN, dim = dim,
        k = 3, nProbe = 2, shortlist = 48, sampleN = 200, minRecall = 0.9)
      val healthy = check()
      assert(healthy.recall == 1.0 && !healthy.retrain,
        s"healthy stack must be exact: ${healthy.recall}")

      // the drifted day, ENCODING dimension only: 4 point-clusters of
      // 10 identical vectors in subspace 1 (orthogonal all-positive
      // prototypes 20·e_c — deliberately NOT antipodal pairs, so no
      // k-means merge can average them to a zero centroid), constant
      // (0,5,0,0) in subspace 0. Under the frozen all-zero subspace-1
      // codebook every LUT entry is EXACTLY 0 and every candidate's
      // approx score ties exactly, so the shortlist degenerates to the
      // neighbor_id tiebreak: ids 0..39 and the first drift cluster
      // fill it, the three high-id clusters deterministically fall out
      // of their own queries' shortlists (recall 150/240 = 0.625).
      // nProbe = 2 probes BOTH cells, so coarse routing cannot be the
      // failure source — the drift is isolated to the encoding
      val drift = (0 until 40).map { i =>
        val proto = Array.fill(4)(0.0); proto(i / 10) = 20.0
        (200L + i, Seq(0.0, 5.0, 0.0, 0.0) ++ proto.toSeq)
      }
      Similarity.appendToIvfIndex(spark, ivfN, drift.toDF("id", "vec"),
        ingestId = "drift-day")
      Similarity.appendToAdcPostings(spark, ivfN, pqN, drift.toDF("id", "vec"),
        m = m, ingestId = "drift-day", dim = dim)
      val drifted = check()
      assert(drifted.retrain,
        s"stale codebooks must trip the verdict: ${drifted.recall}")
      // proof the failure is the ENCODING: the plain-IVF probe at the
      // same nProbe (exact cosine inside probed cells, no codes) is
      // still perfect — routing is intact
      val plain = Similarity.ivfRecallCheck(spark, ivfN,
        k = 3, nProbe = 2, sampleN = 200, minRecall = 0.9)
      assert(plain.recall == 1.0, s"routing must be healthy: ${plain.recall}")

      // ACT: re-learn the books over everything held, re-encode ALL
      // postings; routing state untouched
      val centroidsBefore = spark.table(s"${ivfN}_centroids")
        .collect().map(_.toSeq.toList).toSet
      Similarity.retrainPqBooks(spark, ivfN, pqN, m = m, codebookK = 8,
        iters = 2, dim = dim)
      val after = check()
      assert(after.recall > drifted.recall && !after.retrain,
        s"re-encode must recover recall at the ORIGINAL nProbe/shortlist: " +
          s"${drifted.recall} -> ${after.recall}")
      assert(spark.table(s"${ivfN}_centroids")
        .collect().map(_.toSeq.toList).toSet == centroidsBefore,
        "an encoding retrain must not touch the coarse quantizer")
      // postings folded to one fresh base partition, every vector coded
      assert(spark.table(s"${pqN}_adc").select("ingest_id").distinct()
        .as[String].collect().toSeq == Seq("base"))
      assert(spark.table(s"${pqN}_adc").count() == 80)

      // the CLI face: --mode retrain --pq infers the model shape from
      // the persisted books and re-runs the same retrain end-to-end
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "retrain", "--in", "unused:", "--index", ivfN,
        "--pq", pqN, "--dim", dim.toString)))
      val cli = check()
      assert(!cli.retrain && Similarity.loadPqBooks(spark, pqN).length == m)
    } finally tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("EdgeRunner --mode recall-check surfaces the report") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 30).map(i =>
      (i.toLong, (if (i % 2 == 0) 8.0 else -8.0) +: gauss(rnd, 3, 0.1)))
    val name = "recall_edge"
    try {
      for (t <- Seq(s"${name}_centroids", s"${name}_assignments"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
      Similarity.saveIvfIndex(spark,
        Similarity.ivfIndex(vecs.toDF("id", "vec"), nCentroids = 2, iters = 3), name)
      val cfg = graft.tools.EdgeRunner.parse(Array(
        "--mode", "recall-check", "--in", "unused:", "--index", name,
        "--k", "3", "--nprobe", "1", "--sample", "64", "--min-recall", "0.9"))
      val r = graft.tools.EdgeRunner.runRecallCheck(spark, cfg)
      assert(r.recall == 1.0 && !r.retrain && r.k == 3 && r.nProbe == 1)
      // the CLI retrain face: rebuild in place, recall intact
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "retrain", "--in", "unused:", "--index", name,
        "--centroids", "2")))
      val after = graft.tools.EdgeRunner.runRecallCheck(spark, cfg)
      assert(after.recall == 1.0 && !after.retrain)
    } finally for (t <- Seq(s"${name}_centroids", s"${name}_assignments"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
