package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** Replay idempotence of the per-ingest maintenance family: every
  * append path stamps its batch into an `ingest_id` partition written
  * by dynamic partition overwrite, so a crashed-and-retried maintain
  * job (at-least-once — the normal failure mode of a daily pipeline)
  * replaces its own rows instead of double-appending. Each test runs
  * the append TWICE with the same ingest id and asserts the table —
  * and the consumer the table feeds — is byte-identical to running it
  * once. */
class ReplaySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dropAll(tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("appendIncrementalKeys twice == once (exact-dedup key tables)") {
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val bulk = corpus.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val delta = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
    val name = "replay_exact"
    try {
      Dedup.saveIncrementalKeys(spark, name, bulk, "text")
      Dedup.appendIncrementalKeys(spark, name, delta, "text", ingestId = "d1")
      def snapshot(): (Set[String], Set[(Int, Seq[Long])]) = (
        spark.table(s"${name}_norm").select("__norm_key").as[String].collect().toSet,
        spark.table(s"${name}_bands").select("band_idx", "band_key")
          .as[(Int, Seq[Long])].collect().toSet)
      val once = snapshot()
      val onceRows = (spark.table(s"${name}_norm").count(),
        spark.table(s"${name}_bands").count())
      // the retry
      Dedup.appendIncrementalKeys(spark, name, delta, "text", ingestId = "d1")
      assert(snapshot() == once)
      assert((spark.table(s"${name}_norm").count(),
        spark.table(s"${name}_bands").count()) == onceRows,
        "replay must not change ROW counts either (no silent duplicates)")
      // a DIFFERENT ingest id still appends (replay-safety must not
      // collapse into write-once semantics)
      Dedup.appendIncrementalKeys(spark, name,
        delta.select(col("doc_id"), concat(col("text"), lit(" novel suffix"))
          .as("text")), "text", ingestId = "d2")
      assert(spark.table(s"${name}_norm").count() > onceRows._1)
    } finally dropAll(s"${name}_norm", s"${name}_bands")
  }

  test("appendNearDupKeys twice == once: no duplicate key rows, no duplicate pairs") {
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val newB = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
    val old = corpus.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val bulk = old.filter(pmod(col("doc_id"), lit(10)) =!= 2)
    val delta = old.filter(pmod(col("doc_id"), lit(10)) === 2)
    val name = "replay_nd"
    try {
      Dedup.saveNearDupKeys(spark, name, bulk, "doc_id", "text")
      Dedup.appendNearDupKeys(spark, name, delta, "doc_id", "text", ingestId = "d1")
      def pairs(): Seq[(Long, Long, Double)] =
        Dedup.jaccardPairsBetweenFromTables(
            spark, newB, name, "doc_id", "text", threshold = 0.5)
          .as[(Long, Long, Double)].collect().toSeq.sorted
      val oncePairs = pairs()
      val onceRows = (spark.table(s"${name}_ndband").count(),
        spark.table(s"${name}_ndsh").count())
      Dedup.appendNearDupKeys(spark, name, delta, "doc_id", "text", ingestId = "d1")
      assert((spark.table(s"${name}_ndband").count(),
        spark.table(s"${name}_ndsh").count()) == onceRows,
        "replayed append must replace its partition, not double the key rows")
      val replayPairs = pairs()
      assert(replayPairs == oncePairs,
        "duplicated key rows would emit duplicate candidate/verified pairs")
      assert(replayPairs.size == replayPairs.distinct.size)
    } finally dropAll(s"${name}_ndband", s"${name}_ndsh")
  }

  test("appendToIvfIndex twice == once: top-k has no duplicated neighbors") {
    val rnd = new scala.util.Random(41)
    def vecs(ids: Range) =
      ids.map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian()))).toSeq.toDF("id", "vec")
    val name = "replay_ivf"
    try {
      dropAll(s"${name}_centroids", s"${name}_assignments")
      Similarity.saveIvfIndex(spark,
        Similarity.ivfIndex(vecs(0 until 40), nCentroids = 4, iters = 2), name)
      val delta = vecs(100 until 120)
      Similarity.appendToIvfIndex(spark, name, delta, ingestId = "d1")
      val queries = vecs(100 until 104)
      def topk(): Seq[(Long, Long, Double, Long)] =
        Similarity.ivfTopK(queries, Similarity.loadIvfIndex(spark, name),
            k = 5, nProbe = 2)
          .as[(Long, Long, Double, Long)].collect().toSeq.sorted
      val once = topk()
      val onceRows = spark.table(s"${name}_assignments").count()
      Similarity.appendToIvfIndex(spark, name, delta, ingestId = "d1")
      assert(spark.table(s"${name}_assignments").count() == onceRows,
        "replayed append must not duplicate postings")
      val replay = topk()
      assert(replay == once)
      // the failure the fix prevents: a duplicated posting returns the
      // same neighbor twice inside one query's top-k
      val perQuery = replay.groupBy(_._1).values
      assert(perQuery.forall(g => g.map(_._2).distinct.size == g.size))
    } finally dropAll(s"${name}_centroids", s"${name}_assignments")
  }

  test("appendToAdcPostings twice == once") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(43)
    val dim = 8; val m = 2
    def vecs(ids: Range) =
      ids.map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian()))).toSeq.toDF("id", "vec")
    val old = vecs(0 until 40)
    val (ivfN, pqN) = ("replay_adc", "replay_adc_pq")
    try {
      dropAll(s"${ivfN}_centroids", s"${ivfN}_assignments",
        s"${pqN}_codes", s"${pqN}_books", s"${pqN}_adc")
      val ivf = Similarity.ivfIndex(old, nCentroids = 4, iters = 2)
      Similarity.saveIvfIndex(spark, ivf, ivfN)
      val (codes, books) = Similarity.productQuantizeModel(
        old.select(col("id").as("vec_id"), col("vec").as("embedding")),
        m = m, k = 4, iters = 2, dim = dim)
      Similarity.savePqModel(spark, pqN, codes, books)
      Similarity.ensureAdcPostings(spark, pqN, ivf, codes, m = m)
      val delta = vecs(100 until 115)
      Similarity.appendToAdcPostings(spark, ivfN, pqN, delta,
        m = m, ingestId = "d1", dim = dim)
      def snapshot(): Seq[Seq[Any]] = spark.table(s"${pqN}_adc")
        .select("cid", "neighbor_id", "c0", "c1")
        .collect().map(_.toSeq.toList).toSeq.sortBy(_.toString)
      val once = snapshot()
      Similarity.appendToAdcPostings(spark, ivfN, pqN, delta,
        m = m, ingestId = "d1", dim = dim)
      assert(snapshot() == once,
        "replayed ADC append must replace its partition, not duplicate codes")
    } finally dropAll(s"${ivfN}_centroids", s"${ivfN}_assignments",
      s"${pqN}_codes", s"${pqN}_books", s"${pqN}_adc")
  }

  test("compactIngests folds old ingest partitions: fewer files, same rows, still exchange-free") {
    // DATE-STYLE ids on purpose: they sort lexically BEFORE the "base"
    // bootstrap partition ('2' < 'b'), the exact shape under which a
    // naive takeRight-over-all-ids retention keeps {base} and folds
    // the NEWEST ingest (the round-11 verdict defect); retention must
    // key on partition write time and never count base
    val ingestIds = Seq("2026-08-01", "2026-08-02", "2026-08-03")
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val name = "replay_compact"
    try {
      Dedup.saveNearDupKeys(spark, name, corpus.filter(pmod(col("doc_id"), lit(4)) === 0),
        "doc_id", "text")
      for ((id, d) <- ingestIds.zipWithIndex)
        Dedup.appendNearDupKeys(spark, name,
          corpus.filter(pmod(col("doc_id"), lit(4)) === d + 1), "doc_id", "text",
          ingestId = id)
      def rows(): Set[Seq[Any]] = spark.table(s"${name}_ndsh")
        .select("doc_id", "sh").collect().map(_.toSeq.toList).toSet
      def files(): Int = {
        val loc = spark.sql(s"DESCRIBE TABLE EXTENDED ${name}_ndsh")
          .filter(col("col_name") === "Location").select("data_type").as[String].head()
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(new java.net.URI(loc)))
          .count(_.getName.endsWith(".parquet"))
      }
      val (beforeRows, beforeFiles) = (rows(), files())
      graft.sources.Bucketing.compactIngests(spark, s"${name}_ndsh",
        Seq("doc_id"), buckets = 8, keepLast = 1)
      assert(rows() == beforeRows, "compaction must not change table contents")
      assert(files() < beforeFiles, s"expected fewer files, $beforeFiles -> ${files()}")
      // the NEWEST ingest keeps its own partition (still replayable) —
      // not base, which sorts lexically after every date id
      assert(spark.table(s"${name}_ndsh").select("ingest_id").distinct()
        .as[String].collect().toSet == Set("base", "2026-08-03"))
      // ...and a retry of that kept ingest is STILL idempotent after
      // compaction (the promise keep-last exists to protect)
      val onceRows = (spark.table(s"${name}_ndband").count(),
        spark.table(s"${name}_ndsh").count())
      Dedup.appendNearDupKeys(spark, name,
        corpus.filter(pmod(col("doc_id"), lit(4)) === 3), "doc_id", "text",
        ingestId = "2026-08-03")
      assert((spark.table(s"${name}_ndband").count(),
        spark.table(s"${name}_ndsh").count()) == onceRows,
        "replay of the kept ingest after compaction must not double-append")
      assert(rows() == beforeRows)
      // bucketed layout survives the rewrite: a self-join on the bucket
      // key plans with no shuffle over the table
      val prevAb = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val t = spark.table(s"${name}_ndsh").select("doc_id")
        val plan = t.join(t.withColumnRenamed("doc_id", "doc_id"), "doc_id")
          .queryExecution.executedPlan.toString
        assert(!plan.contains("ShuffleExchange"),
          s"bucket join must stay exchange-free after compaction:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAb)
    } finally dropAll(s"${name}_ndband", s"${name}_ndsh",
      s"${name}_ndsh__compacting", s"${name}_ndsh__old")
  }

  test("dir-flavor compact (EdgeRunner): write-time retention, durable swap, replayable") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_dir").toFile
    val keysDir = s"${tmp.getAbsolutePath}/keys"
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    try {
      // maintain-shaped writes: ingest_id partitions via dynamic
      // partition overwrite, date ids that sort BEFORE "base"
      for ((id, d) <- Seq("base", "2026-08-01", "2026-08-02").zipWithIndex)
        graft.sources.Connectors.overwritePartitions(
          Dedup.knownKeys(corpus.filter(pmod(col("doc_id"), lit(3)) === d), "text")
            .withColumn("ingest_id", lit(id)),
          keysDir, Seq("ingest_id"))
      def rows(): Set[String] = spark.read.parquet(keysDir)
        .select("__norm_key").as[String].collect().toSet
      val before = rows()
      val msg = graft.tools.EdgeRunner.runCompact(spark,
        graft.tools.EdgeRunner.Config(mode = "compact", in = "unused:",
          knownKeys = keysDir, keepLast = 1))
      assert(msg.contains(keysDir))
      assert(rows() == before, "dir compaction must not change contents")
      assert(spark.read.parquet(keysDir).select("ingest_id").distinct()
        .as[String].collect().toSet == Set("base", "2026-08-02"),
        "the newest-written ingest survives; base is the fold target, never kept")
      // the durable-swap working dirs are gone
      assert(!new java.io.File(s"${keysDir}__compacting").exists())
      assert(!new java.io.File(s"${keysDir}__old").exists())
      // replay of the kept ingest still idempotent post-compaction
      graft.sources.Connectors.overwritePartitions(
        Dedup.knownKeys(corpus.filter(pmod(col("doc_id"), lit(3)) === 2), "text")
          .withColumn("ingest_id", lit("2026-08-02")),
        keysDir, Seq("ingest_id"))
      assert(rows() == before)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp)
  }
}
