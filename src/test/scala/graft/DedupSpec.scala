package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextOps
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  // near-dup: one word changed; distinct: different text entirely
  private val docs = Seq(
    (0L, base),
    (1L, base.replace("lazy", "sleepy")),
    (2L, "completely different content about spark query engines and shuffles here now"),
    (3L, base) // exact dup of 0
  ).toDF("doc_id", "text")

  test("normText collapses case and whitespace") {
    val got = Seq(("  A  B\tC ", 1)).toDF("t", "x")
      .select(TextOps.normText(col("t"))).as[String].head()
    assert(got == "a b c")
  }

  test("shingles builds n-grams and collapses short docs to one shingle") {
    val got = Seq(("w1 w2 w3 w4", 1), ("w1 w2", 2)).toDF("t", "id")
      .select(col("id"), TextOps.shingles(TextOps.tokens(col("t")), 3).as("sh"))
      .as[(Int, Seq[String])].collect().sortBy(_._1).map(_._2)
    assert(got(0) == Seq("w1 w2 w3", "w2 w3 w4"))
    assert(got(1) == Seq("w1 w2"))
  }

  test("exact jaccard: identical=1, disjoint=0") {
    val d = docs.select(col("doc_id"),
      array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sh"))
    val a = d.select(col("doc_id").as("ida"), col("sh").as("sha"))
    val b = d.select(col("doc_id").as("idb"), col("sh").as("shb"))
    val j = a.crossJoin(b).select(col("ida"), col("idb"),
      Dedup.jaccard(col("sha"), col("shb")).as("j")).as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((0L, 3L)) == 1.0)
    assert(j((0L, 2L)) == 0.0)
    assert(j((0L, 1L)) > 0.4 && j((0L, 1L)) < 1.0)
  }

  test("minhash est_jaccard tracks exact jaccard; LSH surfaces dup pairs") {
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        numHashes = 32, bands = 16)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // exact dup must be a candidate with est ~1
    assert(pairs((0L, 3L)) == 1.0)
    // near dup should be surfaced with high estimate
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) > 0.4)
    // unrelated doc 2 should not pair with anything
    assert(!pairs.keys.exists { case (x, y) => x == 2L || y == 2L })
  }

  test("portable minhash expression matches the composed md5 form") {
    val P = 1000000007L
    val composed = docs.select(col("doc_id"),
      transform(sequence(lit(0), lit(7)), i =>
        array_min(transform(TextOps.shingles(TextOps.tokens(col("text")), 3), s =>
          (conv(substring(md5(s), 1, 15), 16, 10).cast("long") % P
            + i.cast("long") * (conv(substring(md5(s), 17, 15), 16, 10).cast("long") % P)) % P)))
        .as("sig")).as[(Long, Seq[Long])].collect().toMap
    val native = graft.operators.Dedup.portableSignatures(docs, "doc_id", "text", 8)
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == composed)
  }

  test("contamination flags eval overlap by containment, not train size") {
    val train = Seq(
      (10L, base),                                       // exact copy of eval 0
      (11L, base.replace("lazy", "sleepy")),             // high overlap
      (12L, "completely different content about spark query engines and shuffles here now")
    ).toDF("doc_id", "text")
    val eval = Seq((0L, base)).toDF("doc_id", "text")
    val got = Dedup.contamination(train, eval, "doc_id", "text",
        shingleN = 3, minContainment = 0.3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((10L, 0L)) == 1.0, "exact copy must have containment 1")
    assert(got.contains((11L, 0L)) && got((11L, 0L)) < 1.0)
    assert(!got.keys.exists(_._1 == 12L), "unrelated doc must not be flagged")
  }

  test("jaccardPairs (LSH-routed) equals the full pairwise join on the test corpus") {
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val lsh = Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val sh = corpus.select(col("doc_id"),
      array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sh"))
    val full = sh.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
      .crossJoin(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), Dedup.jaccard(col("sha"), col("shb")).as("j"))
      .filter(col("j") >= 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(full.nonEmpty, "corpus must contain near-dups for this test to bite")
    assert(lsh == full, s"LSH missed ${(full -- lsh).size}, extra ${(lsh -- full).size}")
  }

  test("jaccardPairsBetween equals the full run restricted to cross-membership") {
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val isNew = (id: Long) => id % 10 == 0
    val between = Dedup.jaccardPairsBetween(
        corpus.filter(pmod(col("doc_id"), lit(10)) === 0),
        corpus.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // reference: full pairwise pairs with exactly one side "new",
    // re-oriented to (new, old)
    val full: Set[(Long, Long, Double)] =
      Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.5)
        .as[(Long, Long, Double)].collect().toSet
    val expected = full.flatMap { case (a, b, j) =>
      if (isNew(a) && !isNew(b)) Some((a, b, j))
      else if (!isNew(a) && isNew(b)) Some((b, a, j))
      else None
    }
    assert(expected.nonEmpty, "split must cut across some near-dup pair")
    assert(between == expected,
      s"missed ${(expected -- between).size}, extra ${(between -- expected).size}")
  }

  test("jaccardPairsBetweenFromTables (persisted key tables) equals the inline path") {
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val newB = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
    val old = corpus.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val name = "graft_test_ndkeys"
    try {
      Dedup.saveNearDupKeys(spark, name, old, "doc_id", "text")
      val fromTables = Dedup.jaccardPairsBetweenFromTables(
          spark, newB, name, "doc_id", "text", threshold = 0.5)
        .as[(Long, Long, Double)].collect().toSet
      val inline = Dedup.jaccardPairsBetween(
          newB, old, "doc_id", "text", threshold = 0.5)
        .as[(Long, Long, Double)].collect().toSet
      assert(inline.nonEmpty, "corpus must contain cross-membership near-dups")
      assert(fromTables == inline,
        s"missed ${(inline -- fromTables).size}, extra ${(fromTables -- inline).size}")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_ndband")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_ndsh")
    }
  }

  test("simhash: identical texts equal; near-dups within small hamming distance") {
    val sh = Dedup.simhashes(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sh(0L) == sh(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(1L)) <= 16)
    assert(hamming(sh(0L), sh(2L)) > 16)
  }

  test("clusters: connected components assign min reachable id") {
    // components: {1,2,3,4} via chain, {10,11}, {20} isolated pair-less
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("clusters: long chain converges via pointer jumping") {
    // diameter-20 chain — plain one-hop propagation would need 20
    // rounds; pointer jumping must close it within the default cap
    val pairs = (1L until 21L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(got.size == 21 && got.values.forall(_ == 1L))
  }

  test("CmsMerge of per-segment sketches is byte-identical to the whole-data sketch") {
    import org.apache.spark.sql.functions.expr
    val rows = (1L to 300L).map(i => (i % 3, i % 17)).toDF("seg", "item")
    val whole = rows
      .agg(expr("count_min_sketch(item, 0.01d, 0.9d, 7)").as("sk"))
      .collect().head.getAs[Array[Byte]](0)
    val merged = rows.groupBy("seg")
      .agg(expr("count_min_sketch(item, 0.01d, 0.9d, 7)").as("sk"))
      .agg(graft.functions.Aggregators.cmsMerge(col("sk")).as("sk"))
      .collect().head.getAs[Array[Byte]](0)
    // CMS counters are additive and dims/seed are shared, so the merge
    // is not approximately equal — it is the SAME sketch
    assert(java.util.Arrays.equals(whole, merged),
      "merged segment sketches must equal the whole-data sketch")
    for (item <- 0L to 16L)
      assert(graft.functions.Aggregators.cmsEstimate(merged, item) >=
        rows.filter(col("item") === item).count())
  }

  test("minhashUnion aggregator: cluster signature = elementwise min") {
    val sigs = Seq(
      (1L, Seq(5L, 9L, 3L)), (1L, Seq(2L, 10L, 4L)), (2L, Seq(7L, 7L, 7L))
    ).toDF("cluster_id", "sig")
    val got = sigs.groupBy("cluster_id")
      .agg(graft.functions.Aggregators.minhashUnion(3)(col("sig")).as("cs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(2L, 9L, 3L))
    assert(got(2L) == Seq(7L, 7L, 7L))
    // union property: aggregating real signatures equals elementwise min
    val docs = Seq((0L, base), (1L, base.replace("lazy", "sleepy"))).toDF("doc_id", "text")
    val docSigs = Dedup.signatures(docs, "doc_id", "text", 16)
      .as[(Long, Seq[Long])].collect().toMap
    val merged = docSigs(0L).zip(docSigs(1L)).map { case (a, b) => math.min(a, b) }
    val aggd = Dedup.signatures(docs, "doc_id", "text", 16)
      .withColumn("g", lit(1)).groupBy("g")
      .agg(graft.functions.Aggregators.minhashUnion(16)(col("sig")).as("cs"))
      .select("cs").as[Seq[Long]].head()
    assert(aggd == merged.toSeq)
  }

  test("exact dedup keeps min doc_id per normalized hash") {
    val kept = docs.groupBy(md5(TextOps.normText(col("text"))))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .select("keep_id", "n").as[(Long, Long)].collect().toMap
    assert(kept(0L) == 2L) // docs 0 and 3 collapse, keeper is 0
    assert(kept(1L) == 1L && kept(2L) == 1L)
  }

  test("incrementalKeep drops exact and near dups vs the corpus, keeps fresh docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val known = Seq(
      (0L, base),
      (1L, "completely different corpus content about ships and harbors at dawn")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "The  quick brown fox jumps over the lazy dog again and again today"), // exact after norm
      (11L, base + " tonight"),                                                    // near-dup
      (12L, "statistics on rainfall patterns across four decades of measurements")  // fresh
    ).toDF("doc_id", "text")
    val kept = graft.operators.Dedup
      .incrementalKeep(incoming, known, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(12L))
    // portable family agrees on the same corpus
    val keptP = graft.operators.Dedup
      .incrementalKeep(incoming, known, "doc_id", "text", portable = true)
      .select("doc_id").as[Long].collect().toSet
    assert(keptP == Set(12L))
    // an empty known corpus keeps everything
    val all = graft.operators.Dedup
      .incrementalKeep(incoming, known.limit(0), "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(all == Set(10L, 11L, 12L))
  }

  test("bucketed key tables give the same keeps as the inline path, exchange-free") {
    val known = docs.filter(col("doc_id") =!= 3L)
    val incoming = docs.select(col("doc_id") + 100L as "doc_id", col("text"))
    graft.operators.Dedup.saveIncrementalKeys(spark, "dedup_spec_keys",
      known, "text")
    val fromTables = graft.operators.Dedup
      .incrementalKeepFromTables(spark, incoming, "dedup_spec_keys", "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val inline = graft.operators.Dedup
      .incrementalKeep(incoming, known, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(fromTables == inline)
    // the point of the bucketed layout: the known side joins with no
    // Exchange — only the batch side shuffles
    val plan = graft.operators.Dedup
      .incrementalKeepFromTables(spark, incoming, "dedup_spec_keys", "doc_id", "text")
      .queryExecution.executedPlan
    val exchangesOverBands = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.child.collectLeaves().exists(_.toString.contains("dedup_spec_keys")) => e
    }
    assert(exchangesOverBands.isEmpty,
      s"known-key scans must not re-shuffle:\n$plan")
  }

  test("appendNearDupKeys: save(old) + append(delta) equals save(old ∪ delta)") {
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val newB = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
    val old = corpus.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    // a corpus landed in two ingests: the bulk, then a delta
    val bulk = old.filter(pmod(col("doc_id"), lit(10)) =!= 2)
    val delta = old.filter(pmod(col("doc_id"), lit(10)) === 2)
    val (inc, whole) = ("graft_test_ndinc", "graft_test_ndwhole")
    try {
      Dedup.saveNearDupKeys(spark, inc, bulk, "doc_id", "text")
      Dedup.appendNearDupKeys(spark, inc, delta, "doc_id", "text", ingestId = "i1")
      Dedup.saveNearDupKeys(spark, whole, old, "doc_id", "text")
      def pairs(name: String): Set[(Long, Long, Double)] =
        Dedup.jaccardPairsBetweenFromTables(
            spark, newB, name, "doc_id", "text", threshold = 0.5)
          .as[(Long, Long, Double)].collect().toSet
      val (got, want) = (pairs(inc), pairs(whole))
      assert(want.nonEmpty, "delta split must keep some near-dup pairs")
      assert(got == want,
        s"missed ${(want -- got).size}, extra ${(got -- want).size}")
      // the delta must actually contribute pairs, or append proved nothing
      Dedup.saveNearDupKeys(spark, inc, bulk, "doc_id", "text")
      assert(pairs(inc) != want, "delta docs must appear in some pair")
    } finally for (n <- Seq(inc, whole); t <- Seq("_ndband", "_ndsh"))
      spark.sql(s"DROP TABLE IF EXISTS $n$t")
  }

  test("appendIncrementalKeys: maintained tables keep exactly what a rebuild keeps") {
    val known = docs.filter(col("doc_id") =!= 3L)
    val incoming = docs.select(col("doc_id") + 100L as "doc_id", col("text"))
    val name = "dedup_spec_appkeys"
    try {
      // land doc 0's keys first, then maintain with docs 1,2's keys
      Dedup.saveIncrementalKeys(spark, name, known.filter(col("doc_id") === 0L), "text")
      Dedup.appendIncrementalKeys(spark, name, known.filter(col("doc_id") =!= 0L), "text", ingestId = "i1")
      val fromTables = Dedup
        .incrementalKeepFromTables(spark, incoming, name, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
      val inline = Dedup.incrementalKeep(incoming, known, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
      assert(fromTables == inline)
    } finally for (t <- Seq("_norm", "_bands"))
      spark.sql(s"DROP TABLE IF EXISTS $name$t")
  }

  test("incrementalClusters merges bridged old clusters to the smaller root") {
    // old clusters {1,2} (root 1) and {10,11} (root 10); batch doc 5
    // pairs with 2 AND 10 — everything must merge under root 1, and
    // the untouched cluster {20,21} must keep its label
    val oldClusters = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L)).toDF("doc_id", "cluster_id")
    val delta = Seq((5L, 2L), (5L, 10L)).toDF("doc_a", "doc_b")
    val got = graft.operators.Dedup.incrementalClusters(oldClusters, delta)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 5L, 10L, 11L).forall(got(_) == 1L),
      s"bridged components must share root 1: $got")
    assert(got(20L) == 20L && got(21L) == 20L)
  }

  test("incrementalClusters with an empty delta returns the old assignment unchanged") {
    val oldClusters = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = graft.operators.Dedup.incrementalClusters(oldClusters, empty)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("incrementalClusters over the delta pair set equals from-scratch clustering") {
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val newB = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
    val old = corpus.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val oldClusters = Dedup.clusters(
      Dedup.jaccardPairs(old, "doc_id", "text", threshold = 0.5)
        .select("doc_a", "doc_b"))
    val delta = Dedup.jaccardPairs(newB, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b")
      .union(Dedup.jaccardPairsBetween(newB, old, "doc_id", "text", threshold = 0.5)
        .select(col("doc_new").as("doc_a"), col("doc_old").as("doc_b")))
    val incremental = Dedup.incrementalClusters(oldClusters, delta)
      .as[(Long, Long)].collect().toSet
    val fromScratch = Dedup.clusters(
        Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.5)
          .select("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toSet
    assert(fromScratch.nonEmpty)
    assert(incremental == fromScratch,
      s"missed ${(fromScratch -- incremental).size}, extra ${(incremental -- fromScratch).size}")
  }

  test("substringDupStats: dup positions, span merge, split, short docs") {
    // k=3 fixture, hand-computed:
    //  0: "a b c" / "b c d" shared with doc 1 -> positions {0,1}, one span
    //  1: same grams at positions {1,2}
    //  2: within-doc repetition -> every position dup, one whole-doc span
    //  3: shorter than k -> all zeros
    //  4: "a b c" at positions 0 and 8 -> gap > k, TWO spans
    val corpus = Seq(
      (0L, "a b c d e f"),
      (1L, "x a b c d y"),
      (2L, "p q r p q r p q"),
      (3L, "u v"),
      (4L, "a b c z1 z2 z3 z4 z5 a b c")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupStats(corpus, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 6L, 4L, 2L, 1L, 4L, 4.0 / 6)))
    assert(got(1L) == ((1L, 6L, 4L, 2L, 1L, 4L, 4.0 / 6)))
    assert(got(2L) == ((2L, 8L, 6L, 6L, 1L, 8L, 1.0)))
    assert(got(3L) == ((3L, 2L, 0L, 0L, 0L, 0L, 0.0)))
    assert(got(4L) == ((4L, 11L, 9L, 2L, 2L, 6L, 6.0 / 11)))
  }

  test("substringDedupRewrite: keep-first by corpus order, span removal, cleaned text exact") {
    // k=3 fixture: "a b c" occurs in doc 1 (pos 0) and doc 2 (pos 2) —
    // corpus-order first is doc 1, so only doc 2's copy is removed;
    // doc 3 is one gram repeated (5 occurrences of "m m m") — keep
    // the first window's start, the marked tail [1..6] drops whole
    val corpus = Seq(
      (1L, "a b c x y z"),
      (2L, "p q a b c r"),
      (3L, "m m m m m m m"),
      (4L, "u v") // shorter than k: untouched
    ).toDF("doc_id", "text")
    val got = Dedup.substringDedupRewrite(corpus, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 6L, 0L, 0L, "a b c x y z")),
      s"the first occurrence's doc must be untouched: ${got(1L)}")
    assert(got(2L) == ((2L, 6L, 3L, 3L, "p q r")), got(2L).toString)
    assert(got(3L) == ((3L, 7L, 6L, 6L, "m")), got(3L).toString)
    assert(got(4L) == ((4L, 2L, 0L, 0L, "u v")), got(4L).toString)
  }

  test("substringDedupRewrite minSpan: default equivalent to minSpan=k; larger floors keep short spans; whole-doc removal") {
    val corpus = Seq(
      (1L, "a b c x y z"),
      (2L, "p q a b c r"), // 3-token span (exactly k)
      (3L, "m m m m m m m"), // 6-token marked span
      (4L, "u v"),
      (5L, "a b c") // repeated whole doc: head-empty AND tail-empty slice
    ).toDF("doc_id", "text")
    // every merged span is >= k tokens, so any minSpan <= k is a no-op
    val dflt = Dedup.substringDedupRewrite(corpus, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect().toSeq
    val atK = Dedup.substringDedupRewrite(corpus, "doc_id", "text", k = 3,
      minSpan = 3).orderBy("doc_id").collect().toSeq
    assert(dflt == atK, s"minSpan=k must be the identity floor:\n$dflt\n$atK")
    // doc 5 is an exact duplicate of doc 1's head gram "a b c": the
    // whole doc drops (both boundary slices empty), clean_text ""
    val byId = dflt.map(r => r.getLong(0) -> r).toMap
    assert(byId(5L).getString(4) == "" && byId(5L).getLong(2) == 3L,
      s"whole-doc removal must empty clean_text: ${byId(5L)}")
    // minSpan=4: doc 2's 3-token span survives in the text; doc 3's
    // 6-token span still drops
    val floored = Dedup.substringDedupRewrite(corpus, "doc_id", "text",
      k = 3, minSpan = 4)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(floored(2L) == ((2L, 6L, 0L, 0L, "p q a b c r")),
      floored(2L).toString)
    assert(floored(3L) == ((3L, 7L, 6L, 6L, "m")), floored(3L).toString)
  }

  test("substringDupStats plan: gram stream scanned once (reused exchange), no cartesian") {
    val df = Dedup.substringDupStats(docs, "doc_id", "text", k = 3)
    df.count() // materialize so AQE resolves its final plan + stage reuse
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"), s"no cartesian allowed:\n$s")
    // two acceptable scalable shapes for the dup filter: (a) the
    // dup-key set is small -> broadcast LeftSemi, probe grams pipeline
    // with NO shuffle at all; (b) both sides shuffle on gkey -> the
    // identical child plans share one Exchange (ReusedExchange). A
    // shuffled semi with two independent gram shuffles would scan and
    // shuffle the corpus twice — reject that.
    val broadcastSemi = s.contains("BroadcastHashJoin") && s.contains("LeftSemi")
    val gramShuffles = "hashpartitioning\\(gkey".r.findAllIn(s).size
    assert(broadcastSemi || s.contains("ReusedExchange") || gramShuffles <= 1,
      s"dup filter must broadcast or reuse the gram exchange:\n$s")
  }

  test("substringDedupRewrite plan: gram stream shuffles once on gkey, no cartesian, no token-vs-span explode join") {
    val df = Dedup.substringDedupRewrite(docs, "doc_id", "text", k = 3)
    df.count() // materialize so AQE resolves its final plan + stage reuse
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"), s"non-equi join in rewrite:\n$s")
    // the keep-first rule rides the SAME gkey aggregation that finds
    // duplicates: grams shuffle on gkey for the groupBy, the marked
    // join either broadcasts the (bounded) duplicate-firsts side or
    // reuses that exchange — a second independent gram shuffle would
    // scan the corpus gram stream twice
    val gramShuffles = "hashpartitioning\\(gkey".r.findAllIn(s).size
    assert(s.contains("BroadcastHashJoin") || s.contains("ReusedExchange")
      || gramShuffles <= 1,
      s"keep-first join must broadcast or reuse the gram exchange:\n$s")
  }

  test("sourceOverlap counts shared shingle keys and Jaccard per source pair") {
    // a/b share the base shingles exactly; c is disjoint
    val corpus = Seq(
      (0L, base, "a"), (1L, base, "b"),
      (2L, "completely different content about spark engines", "c")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(corpus, "text", "source")
      .as[(String, String, Long, Double)].collect()
    // only (a, b) overlaps; identical texts -> identical shingle sets
    assert(got.length == 1)
    val (sa, sb, n, j) = got.head
    assert((sa, sb) == (("a", "b")))
    val nShingles = base.split(" ").length - 2 // distinct 3-grams of base
    assert(n == nShingles && j == 1.0)
  }

  test("sourceOverlap drops shingles present in more than maxSources sources") {
    // one shingle in all 3 sources (boilerplate), plus a 2-source one
    val corpus = Seq(
      (0L, "x y z", "a"), (1L, "x y z p q r", "b"), (2L, "x y z", "c")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(corpus, "text", "source", maxSources = 2)
      .as[(String, String, Long, Double)].collect()
    // "x y z" is in 3 sources -> excluded; nothing else shared
    assert(got.isEmpty)
    val loose = Dedup.sourceOverlap(corpus, "text", "source", maxSources = 3)
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    // with the cap at 3 the shared key counts in all three pairs
    assert(loose.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L)))
    // a={xyz}, b={xyz, yzp(...)}: jacc(a,c) over universes 1 and 1 = 1.0
    assert(loose.find(r => (r._1, r._2) == (("a", "c"))).get._4 == 1.0)
  }

  test("sourceOverlap plan: pair generation is a key equi-join, no cartesian") {
    val corpus = Seq((0L, base, "a"), (1L, base, "b")).toDF("doc_id", "text", "source")
    val df = Dedup.sourceOverlap(corpus, "text", "source")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"), s"no cartesian allowed:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin"), s"no nested loop allowed:\n$s")
  }

  test("containmentPairs: quote-inclusion caught where jaccard misses; boilerplate-capped; integer gate") {
    // doc 1 = 30 words; doc 2 = its first 8 words verbatim (a quote):
    // shared shingles 6, jaccard 6/(28+6-6) ≈ 0.21 — below every
    // near-dup cutoff — but containment 6/min(28,6) = 1
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val quote = (1 to 8).map(i => s"w$i").mkString(" ")
    val other = (100 to 120).map(i => s"v$i").mkString(" ")
    val corpus = Seq((1L, long), (2L, quote), (3L, other))
      .toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.5)
      .count() == 0, "fixture must be invisible to symmetric jaccard")
    val got = Dedup.containmentPairs(corpus, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 28L, 6L, 6L)))
    // integer gate boundary: 4/5 of min — a pair sharing exactly 4 of
    // the smaller side's 5 shingles passes, 3 of 5 does not
    val five = "a b c d e f g"                  // 5 shingles
    val share4 = "a b c d e f zz"               // shares 4 of them
    val share3 = "a b c d e yy zz"              // shares 3
    assert(Dedup.containmentPairs(
      Seq((1L, five), (2L, share4)).toDF("doc_id", "text"),
      "doc_id", "text").count() == 1)
    assert(Dedup.containmentPairs(
      Seq((1L, five), (2L, share3)).toDF("doc_id", "text"),
      "doc_id", "text").count() == 0)
    // the boilerplate cap: 20 docs sharing ONE corpus-common shingle
    // (plus disjoint tails) generate no candidates through it
    val common = (0 until 20).map(i =>
      (i.toLong, s"same same same u${i}a u${i}b u${i}c u${i}d"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairs(common, "doc_id", "text",
      maxDocs = 16).count() == 0)
    // plan lock: candidate generation is a shingle-key equi-join —
    // never doc × doc
    val plan = Dedup.containmentPairs(corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }
}
