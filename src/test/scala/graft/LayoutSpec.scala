package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zkey interleaves bits exactly (known Morton values)") {
    // morton(x, y) with x in even positions: (3, 0) -> 0b0101 = 5,
    // (0, 3) -> 0b1010 = 10, (3, 3) -> 15, (2, 1) -> y1=0,x1=1,y0=1,x0=0 -> 0b0110 = 6
    val got = Seq((3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L))
      .toDF("x", "y")
      .select(Layout.zkey(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].collect().toSeq
    assert(got == Seq(5L, 10L, 15L, 6L))
    // values beyond `bits` are masked, not shifted into high positions
    val masked = Seq((7L, 4L)).toDF("x", "y")
      .select(Layout.zkey(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].head()
    assert(masked == 5L) // 7 & 3 = 3, 4 & 3 = 0 -> morton(3, 0)
  }

  test("zkey and zkeySql agree on random inputs") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val df = rows.toDF("x", "y")
    df.createOrReplaceTempView("zt")
    val viaColumn = df.select(Layout.zkey(Seq(col("x"), col("y")), 16).as("z"))
      .as[Long].collect().toSeq
    // zkeySql is ANSI bit arithmetic — Spark SQL runs it too
    val viaSql = spark.sql(
      s"SELECT ${Layout.zkeySql(Seq("x", "y"), 16)} AS z FROM zt")
      .as[Long].collect().toSeq
    assert(viaColumn == viaSql)
  }

  test("manifest pruning reads a fraction of the z-ordered files, result exact") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(20000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val df = rows.toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zm").toString
    Layout.zorderWrite(df, Seq("x", "y"), bits = 10, files = 64, dir)
    Layout.writeManifest(spark, dir, Seq("x", "y"))
    // range scan on the NON-leading dim: a single-column-sorted layout
    // could prune nothing here; z-order + manifest prunes most files
    val pruned = Layout.prunedFiles(spark, dir, "y", 100L, 131L)
    assert(pruned.nonEmpty && pruned.size < 32,
      s"expected strong pruning, got ${pruned.size} of 64 files")
    val got = Layout.readPruned(spark, dir, "y", 100L, 131L)
      .select("x", "y").as[(Long, Long)].collect().sorted.toSeq
    val want = rows.filter(r => r._2 >= 100 && r._2 <= 131).sorted
    assert(got == want, "pruned scan must equal full scan + filter")
    // empty-range path returns an empty frame with the right schema
    assert(Layout.readPruned(spark, dir, "y", 5000L, 6000L).count() == 0)
  }

  test("appendZorder: per-ingest layout maintenance — pruned reads exact, replay-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("layout_append").toString + "/t"
    def rows(ids: Range) = ids.map { i =>
      (i.toLong, (i * 37 % 1000).toLong, (i * 91 % 1000).toLong)
    }.toDF("id", "x", "y")
    // bootstrap, then two daily ingests — each z-clustered alone
    Layout.appendZorder(spark, rows(0 until 4000), Seq("x", "y"),
      bits = 10, files = 8, dir, ingestId = "base")
    Layout.appendZorder(spark, rows(4000 until 6000), Seq("x", "y"),
      bits = 10, files = 8, dir, ingestId = "day1")
    Layout.appendZorder(spark, rows(6000 until 8000), Seq("x", "y"),
      bits = 10, files = 8, dir, ingestId = "day2")
    def fullScan() = spark.read.parquet(dir)
      .where(col("x") >= 100L && col("x") <= 180L)
      .select("id").as[Long].collect().sorted.toSeq
    def pruned() = Layout.readPruned(spark, dir, "x", 100L, 180L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(pruned() == fullScan() && pruned().nonEmpty)
    // pruning really prunes: the x-window hits a fraction of each
    // ingest's 8 z-ranged files
    val total = spark.read.parquet(s"$dir/${Layout.ManifestDir}").count()
    val hit = Layout.prunedFiles(spark, dir, "x", 100L, 180L).size
    assert(total == 24L, s"3 ingests x 8 files, got $total")
    assert(hit < 24, s"expected pruning, hit $hit of $total")
    // the replay: re-landing day2 changes neither the data nor the
    // manifest (its partition and manifest rows are REPLACED)
    Layout.appendZorder(spark, rows(6000 until 8000), Seq("x", "y"),
      bits = 10, files = 8, dir, ingestId = "day2")
    assert(spark.read.parquet(dir).count() == 8000L,
      "replayed ingest must replace its partition, not double it")
    assert(spark.read.parquet(s"$dir/${Layout.ManifestDir}").count() == 24L)
    assert(pruned() == fullScan())
  }

  test("zorderWrite bounds the non-leading dimension a plain sort leaves open") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(20000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val df = rows.toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft_s").toString
    Layout.zorderWrite(df, Seq("x", "y"), bits = 10, files = 64, zDir)
    // the comparison layout: same file count, sorted on x only
    df.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(sDir)

    // per-file min/max spans — exactly the parquet footer statistics a
    // scan's file-skipping consults
    def meanSpans(dir: String): (Double, Double) = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y"))
          .as[(Long, Long, Long, Long)].head()
        ((r._2 - r._1 + 1).toDouble, (r._4 - r._3 + 1).toDouble)
      }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val (zx, zy) = meanSpans(zDir)
    val (sx, sy) = meanSpans(sDir)
    // x-sorted: x razor thin but y unconstrained -> no pruning for
    // y predicates. z-order: BOTH dims bounded (~128-256 tile sides),
    // so min/max skipping works for either predicate column.
    assert(sy > 1000.0, s"x-sorted layout should leave y open, got $sy")
    assert(zy < sy / 2.0, s"z-order must bound y: z=$zy sorted=$sy")
    assert(zx < 1024.0 / 2.0, s"z-order must keep x bounded too: $zx")
    // and the layout holds exactly the same rows
    assert(spark.read.parquet(zDir).count() == 20000)
  }
}
