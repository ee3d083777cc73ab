package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Forget, Similarity}

/** Deletion propagation (the right-to-be-forgotten path): the
  * requested ids vanish from the landing and every doc-keyed derived
  * store, every OTHER row is byte-identical, layouts (partitions,
  * bucket specs) survive the rewrite, and the operation is
  * idempotent. */
class ForgetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("forget removes ids from landing + near-dup family; everything else intact") {
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val name = "forget_nd"
    val docsDir = java.nio.file.Files.createTempDirectory("forget_docs")
      .toString + "/corpus_docs"
    try {
      val bulk = corpus.filter(pmod(col("doc_id"), lit(3)) =!= 1)
      val delta = corpus.filter(pmod(col("doc_id"), lit(3)) === 1)
      // landing: two ingest partitions under (lang, ingest_id)
      graft.sources.Connectors.overwritePartitions(
        bulk.withColumn("ingest_id", lit("base")),
        docsDir, Seq("lang", "ingest_id"))
      graft.sources.Connectors.overwritePartitions(
        delta.withColumn("ingest_id", lit("2026-08-12")),
        docsDir, Seq("lang", "ingest_id"))
      Dedup.saveNearDupKeys(spark, name, bulk, "doc_id", "text")
      Dedup.appendNearDupKeys(spark, name, delta, "doc_id", "text",
        ingestId = "2026-08-12")
      // forget ids from BOTH ingests
      val ids = Seq(3L, 4L, 7L) // 3 in base (0,3: %3=0? 3%3=0 base; 4%3=1 delta; 7%3=1 delta)
      def landed(): Set[Long] = spark.read.parquet(docsDir)
        .select("doc_id").as[Long].collect().toSet
      def sh(): Set[Seq[Any]] = spark.table(s"${name}_ndsh")
        .collect().map(_.toSeq.toList).toSet
      def band(): Set[Seq[Any]] = spark.table(s"${name}_ndband")
        .collect().map(_.toSeq.toList).toSet
      val (landBefore, shBefore, bandBefore) = (landed(), sh(), band())
      assert(ids.forall(landBefore.contains))

      val nDir = Forget.forgetFromDir(spark, docsDir, "doc_id", ids,
        Seq("lang", "ingest_id"))
      val nSh = Forget.forgetFromTable(spark, s"${name}_ndsh",
        Seq("doc_id"), "doc_id", ids)
      val nBand = Forget.forgetFromTable(spark, s"${name}_ndband",
        Seq("band_idx", "band_key"), "doc_id", ids)
      assert(nDir == 3L && nSh == 3L && nBand > 0L)
      // gone from every store, everything else byte-identical
      assert(landed() == landBefore -- ids)
      assert(sh() == shBefore.filterNot(r => ids.contains(r.head)))
      val idIdx = spark.table(s"${name}_ndband").columns.indexOf("doc_id")
      assert(band() == bandBefore.filterNot(r => ids.contains(r(idIdx))))
      // the rewrite preserved the bucket layout: self-join on the
      // bucket key still plans exchange-free
      val prevAb = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val t = spark.table(s"${name}_ndsh").select("doc_id")
        val plan = t.join(t.withColumnRenamed("doc_id", "doc_id"), "doc_id")
          .queryExecution.executedPlan.toString
        assert(!plan.contains("ShuffleExchange"),
          s"bucket join must stay exchange-free after forget:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAb)
      // idempotent: nothing left to delete
      assert(Forget.forgetFromDir(spark, docsDir, "doc_id", ids,
        Seq("lang", "ingest_id")) == 0L)
      assert(Forget.forgetFromTable(spark, s"${name}_ndsh",
        Seq("doc_id"), "doc_id", ids) == 0L)
      // CLI face: a second id set through the dispatcher
      graft.tools.EdgeRunner.run(spark, graft.tools.EdgeRunner.parse(Array(
        "--mode", "forget", "--ids", "10,13", "--in", s"parquet:$docsDir",
        "--partition-by", "lang,ingest_id", "--table", name)))
      assert(!landed().contains(10L) && !landed().contains(13L))
      assert(!sh().exists(r => r.head == 10L || r.head == 13L))
    } finally for (t <- Seq(s"${name}_ndband", s"${name}_ndsh"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("forgetFromDir: staging invisible to discovery, crash between renames recovers, escaped partition values, mtime preserved") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("forget_crash")
      .toString + "/landing"
    // partition VALUES that need path escaping ('%', space): the
    // physical dirs are derived from input_file_name, never rebuilt
    // from the value strings
    val docs = Seq(
      (1L, "a", "en us"), (2L, "b", "en us"), (3L, "c", "en us"),
      (6L, "d", "fr%ca"), (7L, "e", "fr%ca"))
    docs.toDF("doc_id", "text", "lang")
      .withColumn("ingest_id", lit("2026-08-01"))
      .write.mode("overwrite").partitionBy("lang", "ingest_id").parquet(dir)
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val enPart = fs.globStatus(new Path(base, "*/ingest_id=2026-08-01"))
      .map(_.getPath).find(_.toString.contains("en")).get
    // age the partition: a deletion request must not freshen it
    val aged = System.currentTimeMillis() - 7777000L
    fs.setTimes(enPart, aged, -1)

    assert(Forget.forgetFromDir(spark, dir, "doc_id", Seq(2L, 6L),
      Seq("lang", "ingest_id")) == 2L)
    assert(spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L, 7L))
    assert(fs.getFileStatus(enPart).getModificationTime == aged,
      "partition rewrite must preserve the pre-forget mtime")

    // simulate the crash BETWEEN the two renames: the side dir (in the
    // staging tree OUTSIDE the landing root) holds the complete
    // post-delete copy, the live partition is gone
    val qBase = fs.makeQualified(base)
    val side = new Path(
      new Path(qBase.getParent, "_" + qBase.getName + "__forget"),
      enPart.toString.stripPrefix(qBase.toString).stripPrefix("/") + "__forgetting")
    val kept = spark.read.parquet(enPart.toString).filter(col("doc_id") =!= 3L)
    kept.write.mode("overwrite").parquet(side.toString)
    fs.delete(enPart, true)
    // the staging dir is INVISIBLE to partition discovery: no mangled
    // partition, no duplicated rows — the store reads merely stale
    assert(spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
      == Set(7L))
    // any forget run recovers: the preamble finishes the swap
    assert(Forget.forgetFromDir(spark, dir, "doc_id", Seq(999L),
      Seq("lang", "ingest_id")) == 0L)
    assert(spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
      == Set(1L, 7L))
    assert(!fs.exists(side))
  }

  test("recoverSwaps walks ANY partition depth: a crashed swap four levels deep still finishes") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("forget_deep")
      .toString + "/landing"
    // four partition columns — deeper than any fixed-depth glob
    Seq((1L, "a", "s1", "en", "x", "2026-08-01"),
        (2L, "b", "s1", "en", "x", "2026-08-01"),
        (3L, "c", "s2", "fr", "y", "2026-08-02"))
      .toDF("doc_id", "text", "src", "lang", "shard", "ingest_id")
      .write.mode("overwrite")
      .partitionBy("src", "lang", "shard", "ingest_id").parquet(dir)
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qBase = fs.makeQualified(base)
    // crash between the renames at depth 4: side copy complete, live gone
    val rel = "src=s1/lang=en/shard=x/ingest_id=2026-08-01"
    val live = new Path(qBase, rel)
    val side = new Path(
      new Path(qBase.getParent, "_" + qBase.getName + "__forget"),
      rel + "__forgetting")
    spark.read.parquet(live.toString).filter(col("doc_id") =!= 2L)
      .write.mode("overwrite").parquet(side.toString)
    fs.delete(live, true)
    // any forget run's preamble must find and finish the deep swap
    assert(Forget.forgetFromDir(spark, dir, "doc_id", Seq(999L),
      Seq("src", "lang", "shard", "ingest_id")) == 0L)
    assert(spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L))
    assert(!fs.exists(side), "deep staged swap left behind")
  }

  test("compaction recovers pending forget swaps FIRST: a leftover backup cannot resurrect forgotten rows after the fold") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("forget_compact")
      .toString + "/landing"
    Seq((1L, "a", "i1"), (2L, "b", "i1"), (3L, "c", "i1"))
      .toDF("doc_id", "text", "ingest_id")
      .write.mode("overwrite").partitionBy("ingest_id").parquet(dir)
    Seq((4L, "d", "i2"), (5L, "e", "i2"))
      .toDF("doc_id", "text", "ingest_id")
      .write.mode("append").partitionBy("ingest_id").parquet(dir)
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qBase = fs.makeQualified(base)
    // a completed forget of doc 2 ...
    assert(Forget.forgetFromDir(spark, dir, "doc_id", Seq(2L),
      Seq("ingest_id")) == 1L)
    // ... that crashed BEFORE deleting its pre-delete backup: the
    // `__forgotten` staging sibling still holds the original partition
    val backup = new Path(
      new Path(qBase.getParent, "_" + qBase.getName + "__forget"),
      "ingest_id=i1__forgotten")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(backup.toString)
    // compaction must run swap recovery BEFORE folding: the live
    // partition exists, so the stale backup is dropped — folding first
    // would remove the live dir, and a LATER recovery would restore the
    // backup wholesale (forgotten row back + kept rows duplicated)
    graft.sources.Bucketing.compactDir(spark, dir, Seq("ingest_id"),
      keepLast = 1)
    assert(!fs.exists(backup), "stale backup must be cleaned before the fold")
    val after = spark.read.parquet(dir).select("doc_id").as[Long].collect()
    assert(after.sorted.toSeq == Seq(1L, 3L, 4L, 5L),
      s"forgotten/duplicated rows after compaction: ${after.toSeq}")
    // and a later forget run finds nothing left to recover
    assert(Forget.forgetFromDir(spark, dir, "doc_id", Seq(999L),
      Seq("ingest_id")) == 0L)
    assert(spark.read.parquet(dir).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("forget drops an ingest partition its deletions emptied; probes stop returning forgotten vectors") {
    val rnd = new scala.util.Random(37)
    def vecs(ids: Range) =
      ids.map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian()))).toSeq.toDF("id", "vec")
    val name = "forget_ivf"
    try {
      for (t <- Seq(s"${name}_centroids", s"${name}_assignments"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
      Similarity.saveIvfIndex(spark,
        Similarity.ivfIndex(vecs(0 until 40), nCentroids = 4, iters = 2), name)
      // a tiny ingest whose docs will ALL be forgotten
      Similarity.appendToIvfIndex(spark, name, vecs(200 until 202),
        ingestId = "tiny")
      Similarity.appendToIvfIndex(spark, name, vecs(100 until 120),
        ingestId = "big")
      val queries = vecs(200 until 202)
      def neighbors(): Set[Long] =
        Similarity.ivfTopK(queries, Similarity.loadIvfIndex(spark, name),
            k = 10, nProbe = 4)
          .select("neighbor_id").as[Long].collect().toSet
      assert(neighbors().intersect(Set(200L, 201L, 105L)).nonEmpty)
      val n = Forget.forgetFromTable(spark, s"${name}_assignments",
        Seq("cid"), "id", Seq(200L, 201L, 105L))
      assert(n == 3L)
      // the emptied ingest partition is GONE (a zero-row dynamic
      // overwrite would have left it behind), the big one survives
      assert(spark.table(s"${name}_assignments")
        .select(col("ingest_id").cast("string")).distinct()
        .as[String].collect().toSet == Set("base", "big"))
      // probes cannot return what the store no longer holds
      assert(neighbors().intersect(Set(200L, 201L, 105L)).isEmpty)
      assert(spark.table(s"${name}_assignments").count() == 40L + 20L - 1L)
    } finally for (t <- Seq(s"${name}_centroids", s"${name}_assignments"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
