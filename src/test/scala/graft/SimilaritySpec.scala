package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorOps
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mmrRerank trades relevance for diversity; pure-relevance at lambda=1") {
    val queries = Seq((1L, Seq(1.0, 0.0))).toDF("id", "vec")
    val cands = Seq(
      (10L, Seq(1.0, 0.0)),   // exact match
      (11L, Seq(1.0, 0.0)),   // redundant duplicate of 10
      (12L, Seq(0.8, 0.6))).toDF("id", "vec") // diverse, lower rel
    def picks(lambda: Double): Seq[Long] =
      Similarity.mmrRerank(queries, cands, shortlist = 3, k = 2, lambda)
        .orderBy("mmr_rank").select("neighbor_id").as[Long].collect().toSeq
    // diversity-weighted: step 1 takes 10 (id tiebreak over its twin),
    // step 2 must SKIP the duplicate 11 for the diverse 12
    assert(picks(0.3) == Seq(10L, 12L))
    // pure relevance: the duplicate wins step 2
    assert(picks(1.0) == Seq(10L, 11L))
    // ranks are 1..k and scores non-increasing within a query
    val full = Similarity.mmrRerank(queries, cands, 3, 3, 0.5)
      .orderBy("mmr_rank")
      .select("mmr_rank", "score").as[(Long, Double)].collect().toSeq
    assert(full.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("mmrRerankShortlist composes with an IVF retriever; brute shortlist is the identity") {
    val rnd = new scala.util.Random(23)
    val dim = 16
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian() * 2))
    val cands = centers.zipWithIndex.flatMap { case (c, ci) =>
      (0 until 40).map { i =>
        (ci * 100 + i + 100).toLong -> c.map(x => x + rnd.nextGaussian() * 0.1).toSeq
      }
    }.toSeq.toDF("id", "vec")
    val qs = centers.zipWithIndex
      .map { case (c, i) => i.toLong -> c.toSeq }.toSeq.toDF("id", "vec")
    // plumbing identity: an explicit brute shortlist IS mmrRerank
    val viaBrute = Similarity.mmrRerankShortlist(
        Similarity.bruteForceTopK(qs, cands, 10), cands, k = 5, lambda = 0.5)
      .as[(Long, Long, Long, Double)].collect().toSet
    val direct = Similarity.mmrRerank(qs, cands, shortlist = 10, k = 5, lambda = 0.5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaBrute == direct)
    // the scale path: IVF shortlist feeding the same re-rank — recall
    // of the picked sets vs the exact-shortlist MMR stays high on
    // clustered data (the ivfTopK recall bound carries through MMR)
    val model = Similarity.ivfIndex(cands, nCentroids = 8, iters = 3)
    val viaIvf = Similarity.mmrRerankShortlist(
        Similarity.ivfTopK(qs, model, k = 10, nProbe = 3), cands, k = 5, lambda = 0.5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._3)).toSet
    val exactPicks = direct.map(r => (r._1, r._3))
    val recall = (exactPicks intersect viaIvf).size.toDouble / exactPicks.size
    assert(recall >= 0.8, s"IVF-shortlist MMR recall $recall too low")
  }

  test("vector ops: dot, norm, cosine on known vectors") {
    val df = Seq((Seq(1.0, 2.0), Seq(2.0, 3.0))).toDF("a", "b")
    val r = df.select(
      VectorOps.dot(col("a"), col("b")),
      VectorOps.norm(col("a")),
      VectorOps.cosine(col("a"), col("b"))).as[(Double, Double, Double)].head()
    assert(r._1 == 8.0)
    assert(math.abs(r._2 - math.sqrt(5.0)) < 1e-12)
    assert(math.abs(r._3 - 8.0 / math.sqrt(65.0)) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val q = Seq((0L, Seq(1.0, 0.0))).toDF("id", "vec")
    val c = Seq(
      (10L, Seq(1.0, 0.0)),   // cos 1
      (11L, Seq(1.0, 1.0)),   // cos ~.707
      (12L, Seq(0.0, 1.0)),   // cos 0
      (13L, Seq(2.0, 0.0))    // cos 1 (tie with 10, larger id)
    ).toDF("id", "vec")
    val got = Similarity.bruteForceTopK(q, c, 3)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    assert(got.map(_._2).toSeq == Seq(10L, 13L, 11L))
    assert(got(0)._3 == 1.0)
  }

  test("filteredTopK: filter is an equi-join key — never under-fills like post-filtering, returns fewer than k when the slice is small") {
    val q = Seq((0L, Seq(1.0, 0.0), "en"), (1L, Seq(0.0, 1.0), "de"))
      .toDF("id", "vec", "lang")
    val c = Seq(
      (10L, Seq(1.0, 0.0), "en"),   // en, cos 1 to q0
      (11L, Seq(1.0, 0.1), "de"),   // de: must NEVER reach q0
      (12L, Seq(0.9, 0.1), "en"),   // en
      (13L, Seq(0.0, 1.0), "de"),   // de, cos 1 to q1
      (14L, Seq(0.5, 0.5), "en")    // en
    ).toDF("id", "vec", "lang")
    val got = Similarity.filteredTopK(q, c, 2, "lang")
      .as[(Long, String, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5).map(_._3).toSeq).toMap
    // q0 sees only en candidates; the de vector at cos ~0.995 (11)
    // would have ranked 2nd in an UNFILTERED top-k — post-filtering
    // that shortlist would then drop it and under-fill
    assert(got(0L) == Seq(10L, 12L))
    // q1's slice has exactly 2 de candidates: k is honest, not padded
    assert(got(1L) == Seq(13L, 11L))
    val gotK1 = Similarity.filteredTopK(q, c.filter($"id" =!= 11L), 2, "lang")
      .filter($"query_id" === 1L).count()
    assert(gotK1 == 1L) // fewer qualifying than k -> fewer rows
  }

  test("ivfFilteredTopK: posting-list metadata gates the probe; labeled appends stay probeable") {
    val name = "simspec_ivfl"
    try {
      val corpus = Seq(
        (10L, Seq(1.0, 0.0), "en"),
        (11L, Seq(0.9, 0.1), "de"),
        (12L, Seq(0.8, 0.2), "en"),
        (13L, Seq(-1.0, 0.0), "en")).toDF("id", "vec", "lang")
      graft.operators.Similarity.saveIvfIndex(spark,
        graft.operators.Similarity.ivfIndex(corpus, nCentroids = 2, iters = 2,
          extraCols = Seq("lang")), name)
      val model = graft.operators.Similarity.loadIvfIndex(spark, name)
      val q = Seq((0L, Seq(1.0, 0.0), "en")).toDF("id", "vec", "lang")
      def got(): Seq[Long] = graft.operators.Similarity
        .ivfFilteredTopK(q, model, k = 3, nProbe = 2, filterCol = "lang")
        .orderBy("rn").select("neighbor_id").as[Long].collect().toSeq
      // de vector 11 (2nd-closest overall) is filtered at the posting
      assert(got() == Seq(10L, 12L, 13L))
      // labeled append: the new en vector enters the probed lists
      graft.operators.Similarity.appendToIvfIndex(spark, name,
        Seq((20L, Seq(1.0, 0.05), "en")).toDF("id", "vec", "lang"),
        ingestId = "d1", extraCols = Seq("lang"))
      val model2 = graft.operators.Similarity.loadIvfIndex(spark, name)
      val got2 = graft.operators.Similarity
        .ivfFilteredTopK(q, model2, k = 4, nProbe = 2, filterCol = "lang")
        .select("neighbor_id").as[Long].collect().toSet
      assert(got2 == Set(10L, 12L, 13L, 20L))
      // a RETRAIN must carry the posting metadata through the rebuild:
      // dropping it would break every later filtered probe and append
      val model3 = graft.operators.Similarity.retrainIvfIndex(spark, name,
        nCentroids = 2, iters = 2)
      assert(model3.assignments.columns.contains("lang"),
        "retrain must preserve the filter column")
      val got3 = graft.operators.Similarity
        .ivfFilteredTopK(q, model3, k = 4, nProbe = 2, filterCol = "lang")
        .select("neighbor_id").as[Long].collect().toSet
      assert(got3 == Set(10L, 12L, 13L, 20L))
    } finally for (t <- Seq(s"${name}_centroids", s"${name}_assignments"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("ivfCellStats and pqDistortion report dead capacity as zero rows") {
    import org.apache.spark.sql.functions.col
    // a hand-built model with an EMPTY cell 2: the report must emit it
    val assigns = Seq((10L, Seq(1.0, 0.0), 0), (11L, Seq(0.9, 0.1), 0),
      (12L, Seq(0.0, 1.0), 1)).toDF("id", "vec", "cid")
    val model = graft.operators.Similarity.IVFModel(
      Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0)), assigns)
    val cells = graft.operators.Similarity.ivfCellStats(model)
      .as[(Int, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(cells(2) == ((0L, 3L)), s"empty cell must appear with n_vecs=0: $cells")
    assert(cells(0) == ((2L, 1L)) && cells(1) == ((1L, 2L)))
    // PQ twin: code 1 of subspace 0 is never assigned — zero row
    val emb = Seq((10L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val codes = Seq((10L, 0L, 0L)).toDF("vec_id", "subspace", "code")
    val books = Array(Array(Array(1.0, 0.0), Array(-1.0, 0.0)))
    val rep = graft.operators.Similarity.pqDistortion(
        emb.select(col("vec_id"), col("embedding")), codes, books, dim = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(rep((0L, 1L)) == ((0L, 0.0)), s"dead code must appear: $rep")
    assert(rep((0L, 0L))._1 == 1L)
  }

  test("lshTopK achieves high recall vs brute force on clustered data") {
    val rnd = new scala.util.Random(7)
    val dim = 16
    def cluster(center: Array[Double], n: Int, from: Int) =
      (0 until n).map { i =>
        (from + i).toLong -> center.map(x => x + rnd.nextGaussian() * 0.05).toSeq
      }
    val c1 = Array.fill(dim)(rnd.nextGaussian())
    val c2 = Array.fill(dim)(rnd.nextGaussian())
    val all = cluster(c1, 30, 100) ++ cluster(c2, 30, 200)
    val cands = all.toDF("id", "vec")
    val qs = Seq(0L -> c1.toSeq, 1L -> c2.toSeq).toDF("id", "vec")
    val brute = Similarity.bruteForceTopK(qs, cands, 5)
      .as[(Long, Long, Double, Long)].collect().map(r => (r._1, r._2)).toSet
    val lsh = Similarity.lshTopK(qs, cands, 5, dim, tables = 4, bitsPerTable = 6)
      .as[(Long, Long, Double, Long)].collect().map(r => (r._1, r._2)).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall too low")
  }

  test("embeddingNearDupPairsLsh equals brute force on the test corpus (recall=1)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val brute = Similarity.embeddingNearDupPairs(emb, 0.45)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Similarity.embeddingNearDupPairsLsh(emb, 0.45, dim = 64)
      .as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty, "corpus must contain qualifying pairs")
    assert(lsh == brute, s"LSH missed ${(brute -- lsh).size}, extra ${(lsh -- brute).size}")
  }

  test("quantizedRerankTopK matches brute force when the shortlist is wide enough") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val qs = emb.filter(col("id") < 5)
    val cands = emb.filter(col("id") >= 5)
    val brute = Similarity.bruteForceTopK(qs, cands, 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    // shortlist = full corpus → stage 1 cannot drop a true top-5 row, so
    // the exact rerank must reproduce brute force rank-for-rank
    val n = cands.count().toInt
    val full = Similarity.quantizedRerankTopK(qs, cands, 5, shortlist = n)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(full == brute)
    // a 40-wide shortlist keeps recall high on real data (int8 error is
    // small relative to the cosine gaps at the top)
    val short = Similarity.quantizedRerankTopK(qs, cands, 5, shortlist = 40)
      .as[(Long, Long, Double, Long)].collect().map(r => (r._1, r._2)).toSet
    val recall = (brute.map(r => (r._1, r._2)) intersect short).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall too low")
  }

  test("l2normalize: unit norm in one pass, zero vector unchanged") {
    val df = Seq((1, Seq(3.0, 4.0)), (2, Seq(0.0, 0.0))).toDF("id", "v")
    val got = df.select(col("id"), VectorOps.l2normalize(col("v")).as("n"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(got(1) == Seq(0.6, 0.8))
    assert(got(2) == Seq(0.0, 0.0))
  }

  test("labelCentroids: exact mean per dimension") {
    val df = Seq(
      (1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 4.0f)), (2, Seq(10.0f, 20.0f))
    ).toDF("label", "embedding")
    val got = Similarity.labelCentroids(df)
      .as[(Int, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1, 0L)) == 2.0 && got((1, 1L)) == 3.0)
    assert(got((2, 0L)) == 10.0 && got((2, 1L)) == 20.0)
  }

  test("semanticDedup keeps the min-id keeper and drops only above-threshold members") {
    import spark.implicits._
    // two tight clusters: ids 0-2 near (1,0,...), ids 10-11 near (0,1,...)
    def v(base: Array[Double], eps: Double) = base.map(_ + eps)
    val a = Array.tabulate(8)(i => if (i == 0) 1.0 else 0.0)
    val b = Array.tabulate(8)(i => if (i == 1) 1.0 else 0.0)
    val vecs = Seq(
      (0L, v(a, 0.0)), (1L, v(a, 0.001)), (2L, v(a, 0.002)),
      (10L, v(b, 0.0)), (11L, v(b, 0.001)))
      .toDF("id", "vec")
    val model = graft.operators.Similarity.ivfIndex(vecs, nCentroids = 2, iters = 2)
    val out = graft.operators.Similarity.semanticDedup(model, threshold = 0.9)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    // keepers (min id per cluster) always survive; their near-identical
    // cluster-mates exceed cos 0.9 and are marked redundant
    assert(out(0L) && out(10L))
    assert(!out(1L) && !out(2L) && !out(11L))
  }

  test("semDedupCellStatsCapped: hot cells degrade to the keeper rule deterministically; balanced corpora match the uncapped report exactly") {
    import spark.implicits._
    // hand-built assignments: cell 0 HOT (6 members — three orthogonal
    // near-pairs, only one of them near the keeper), cell 1 cold,
    // cell 2 empty (the every-cell rule)
    def e(i: Int, eps: Double = 0.0): Seq[Double] =
      Seq.tabulate(4)(j => (if (j == i) 1.0 else 0.0) + (if (j == 3) eps else 0.0))
    val assigns = Seq(
      (0L, e(0), 0), (1L, e(0, 0.05), 0),   // near keeper: dropped both rules
      (2L, e(1), 0), (3L, e(1, 0.05), 0),   // near EACH OTHER, not keeper
      (4L, e(2), 0), (5L, e(2, 0.05), 0),   // near each other, not keeper
      (10L, e(0), 1), (11L, e(0, 0.05), 1), (12L, e(1), 1)
    ).toDF("id", "vec", "cid")
    val model = graft.operators.Similarity.IVFModel(
      Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0), Array(0, 0, 1.0, 0)),
      assigns)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("cid", "n_vecs", "n_dropped", "n_kept")
        .as[(Long, Long, Long, Long)].collect().toSet
    val uncapped = rows(graft.operators.Similarity
      .semDedupCellStats(model, threshold = 0.9))
    // all-pairs sees all three near-pairs in the hot cell
    assert(uncapped == Set((0L, 6L, 3L, 3L), (1L, 3L, 1L, 2L), (2L, 0L, 0L, 0L)),
      uncapped.toString)
    // cap at 4: cell 0 (6 members) degrades to keeper-vs-member —
    // bounded O(s) comparisons — so only the near-KEEPER member drops;
    // the near-pairs away from the keeper survive (the documented
    // degrade). Cold cells are bit-identical to the uncapped report.
    val capped = graft.operators.Similarity
      .semDedupCellStatsCapped(model, threshold = 0.9, maxCell = 4)
    assert(rows(capped) == Set((0L, 6L, 1L, 5L), (1L, 3L, 1L, 2L), (2L, 0L, 0L, 0L)),
      rows(capped).toString)
    val flags = capped.select("cid", "capped")
      .as[(Long, Boolean)].collect().toMap
    assert(flags == Map(0L -> true, 1L -> false, 2L -> false),
      s"only the hot cell may be marked capped: $flags")
    // a cap no cell reaches: the capped operator IS the uncapped one
    val wide = rows(graft.operators.Similarity
      .semDedupCellStatsCapped(model, threshold = 0.9, maxCell = 100))
    assert(wide == uncapped, s"balanced corpus must match: $wide")
  }

  test("pqRerankTopK recalls the bulk of brute-force top-5") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def v() = Array.fill(64)(rnd.nextGaussian())
    val corpus = Seq.tabulate(200)(i => (100L + i, v()))
    val queries = Seq.tabulate(5)(i => (i.toLong, v()))
    val cdf = corpus.toDF("id", "vec")
    val qdf = queries.toDF("id", "vec")
    val exact = graft.operators.Similarity.bruteForceTopK(qdf, cdf, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = graft.operators.Similarity.pqRerankTopK(qdf, cdf, k = 5,
        shortlist = 100)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.6, s"PQ shortlist recall too low: $recall")
  }

  test("randomProjection matches a per-dim dot against the same plane family") {
    import spark.implicits._
    val emb = Seq((0L, Array.fill(64)(0.5f), 0), (1L, Array.tabulate(64)(_.toFloat / 64f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity.randomProjection(emb, outDim = 4, dim = 64)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(got.size == 8)
    // re-derive plane 0..3 on the driver and fold left-to-right
    val planes = graft.operators.Similarity.portablePlanes(4, 64, salt = "rp:")
    val vecs = Map(0L -> Array.fill(64)(0.5f.toDouble),
      1L -> Array.tabulate(64)(_.toDouble / 64f.toDouble))
    for (((id, p), v) <- got) {
      var acc = 0.0
      for (d <- 0 until 64) acc += vecs(id)(d) * planes(p.toInt)(d)
      val want = BigDecimal(acc * math.sqrt(3.0 / 4.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(v - want) < 1e-12, s"($id,$p): got $v want $want")
    }
  }

  test("randomProjection roughly preserves pairwise distance ratios (J-L)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(20)(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat), 0))
    val emb = vecs.toDF("vec_id", "embedding", "label")
    val proj = graft.operators.Similarity.randomProjection(emb, outDim = 16, dim = 64)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3) }
    val orig = vecs.map { case (id, v, _) => id -> v.map(_.toDouble) }.toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // distortion bounded for the bulk of pairs (16 dims is coarse; J-L
    // guarantees concentration around 1.0, not a hard bound at this
    // dim count)
    val ratios = for {
      i <- 0L until 20L; j <- (i + 1) until 20L
    } yield d2(proj(i).toArray, proj(j).toArray) / d2(orig(i), orig(j))
    val within = ratios.count(r => r > 0.45 && r < 2.2)
    assert(within >= ratios.size * 8 / 10, s"only $within/${ratios.size} within band")
  }

  test("randomProjection plan has no shuffle") {
    import spark.implicits._
    val emb = Seq((0L, Array.fill(64)(0.1f), 0)).toDF("vec_id", "embedding", "label")
    val s = graft.operators.Similarity.randomProjection(emb, 4, 64)
      .queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s"projection must be map-only:\n$s")
  }

  test("knnClassify majority vote with deterministic tie-break") {
    import spark.implicits._
    // 2-d space: label-0 cluster near (1,0), label-1 cluster near (0,1)
    val corpus = Seq(
      (10L, Array(1.0, 0.0), 0), (11L, Array(0.9, 0.1), 0),
      (12L, Array(0.95, 0.05), 0),
      (20L, Array(0.0, 1.0), 1), (21L, Array(0.1, 0.9), 1),
      (22L, Array(0.05, 0.95), 1)).toDF("id", "vec", "label")
    val queries = Seq(
      (1L, Array(1.0, 0.02)),   // firmly in the label-0 cluster
      (2L, Array(0.02, 1.0))).toDF("id", "vec")
    // k=3: each query's 3 nearest are exactly its own cluster
    val got = Similarity.knnClassify(queries, corpus, 3)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((0, 3L)))
    assert(got(2L) == ((1, 3L)))
    assert(got.size == 2)
    // k=6 swallows the whole corpus -> 3 votes per label: the tie must
    // resolve deterministically to the SMALLER label
    val tie = Similarity.knnClassify(
        Seq((3L, Array(1.0, 1.0))).toDF("id", "vec"), corpus, 6)
      .as[(Long, Int, Long)].collect()
    assert(tie.toSeq == Seq((3L, 0, 3L)))
  }

  test("knnClassify k smaller than a cluster isolates the nearest labels") {
    import spark.implicits._
    val corpus = Seq(
      (10L, Array(1.0, 0.0), 7), (11L, Array(0.9, 0.1), 7),
      (20L, Array(-1.0, 0.0), 3)).toDF("id", "vec", "label")
    val queries = Seq((1L, Array(1.0, 0.0))).toDF("id", "vec")
    val got = Similarity.knnClassify(queries, corpus, 2)
      .as[(Long, Int, Long)].collect()
    assert(got.toSeq == Seq((1L, 7, 2L)))
  }

  test("knnClassifyIvf equals exact kNN when every cell is probed; agrees at nProbe=2") {
    import spark.implicits._
    // 3 well-separated label clusters of 8 vectors each in 8-d
    def cl(base: Int, axis: Int, label: Int) = (0 until 8).map { j =>
      val v = Array.fill(8)(0.01 * j)
      v(axis) = 1.0 + 0.02 * j
      (base + j.toLong, v, label)
    }
    val corpus = (cl(100, 0, 0) ++ cl(200, 3, 1) ++ cl(300, 6, 2))
      .toDF("id", "vec", "label")
    val queries = Seq(
      (1L, { val v = Array.fill(8)(0.0); v(0) = 1.0; v }),
      (2L, { val v = Array.fill(8)(0.0); v(3) = 1.0; v }),
      (3L, { val v = Array.fill(8)(0.0); v(6) = 1.0; v })).toDF("id", "vec")
    val model = Similarity.ivfIndex(corpus.select("id", "vec"),
      nCentroids = 6, iters = 3)
    val labels = corpus.select("id", "label")
    val exact = Similarity.knnClassify(queries, corpus, 5)
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    // nProbe = nCentroids probes every cell -> bit-identical to exact
    val full = Similarity.knnClassifyIvf(queries, model, labels, 5, 6)
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(full == exact, s"full-probe ANN must equal exact: $full vs $exact")
    // tight probe still lands every query in its own cluster's label
    val probed = Similarity.knnClassifyIvf(queries, model, labels, 5, 2)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(probed == Map(1L -> 0, 2L -> 1, 3L -> 2), s"probed=$probed")
  }
}
