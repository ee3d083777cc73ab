package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch runner: evaluates one named query with full stack
  * traces. `runMain graft.tools.Scratch <queryName> [sfDir]`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // temp warehouse (the Verify/Bench discipline): a repo-local
      // ./spark-warehouse leftover makes the NEXT run's fresh
      // in-memory catalog refuse to recreate its managed tables
      // (LOCATION_ALREADY_EXISTS)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_scratch_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Similarity}
    import graft.sources.Tables
    if (name == "_neardup_parity") {
      // LSH-routed d05/d06 pair generation vs brute force at this SF —
      // the empirical recall=1 check backing the registered plans
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(spark, dir)
      val lshJ = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
      val sh = docs.select(col("doc_id"),
        array_distinct(graft.functions.TextOps.shingles(
          graft.functions.TextOps.tokens(col("text")), 3)).as("sh"))
        .localCheckpoint(false)
      val fullJ = sh.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
        .crossJoin(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          Dedup.jaccard(col("sha"), col("shb")).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      println(s"d05 lsh=${lshJ.count()} full=${fullJ.count()} " +
        s"missed=${fullJ.exceptAll(lshJ).count()} extra=${lshJ.exceptAll(fullJ).count()}")
      val emb = Tables.embeddings(spark, dir)
      val lshE = Similarity.embeddingNearDupPairsLsh(emb, 0.45, dim = 64)
      val fullE = Similarity.embeddingNearDupPairs(emb, 0.45)
      println(s"d06 lsh=${lshE.count()} full=${fullE.count()} " +
        s"missed=${fullE.exceptAll(lshE).count()} extra=${lshE.exceptAll(fullE).count()}")
      spark.stop()
      return
    }
    if (name == "_lr_profile") {
      // r18 optimization forensics: where do the LR-family seconds go —
      // feature-stream build, per-GD-round passes, or scoring?
      import org.apache.spark.sql.functions._
      import graft.operators.TextAnalysis
      val docs = Tables.documents(spark, dir)
      val label = graft.plans.TextHash.classifierScore(
        graft.functions.TextOps.tokens(col("text"))) > 0L
      def t[A](lbl: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[lr] $lbl ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      (1 to 2).foreach { rep =>
        println(s"[lr] --- rep $rep ---")
        val (meta, feats) = t("frames(lazy)")(TextAnalysis.logisticFrames(
          docs, "doc_id", "text", label, 4096, materialize = true))
        t("materialize meta")(meta.count())
        t("materialize feats")(feats.count())
        val counts = t("counts collect")(
          meta.agg(count(lit(1)), sum(col("y"))).collect().head)
        println(s"[lr] nDocs=${counts.getLong(0)} nPos=${counts.getLong(1)}")
        val model = t("train 4 rounds")(TextAnalysis.logisticTrain(
          docs, "doc_id", "text", label, 4096, 4))
        t("apply pass")(TextAnalysis.logisticApply(
          docs, "doc_id", "text", label, model)
          .write.format("noop").mode("overwrite").save())
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop()
      return
    }
    if (name == "_lr_round_exp") {
      // r18: one GD round's cost decomposition — is the per-round
      // wall in (a) the feats⋈err sort-merge sort, (b) the
      // Decimal(30,10) sums, or (c) fixed stage latency? Variants must
      // produce IDENTICAL w1 tables (checked) or they're not eligible.
      import org.apache.spark.sql.functions._
      import graft.operators.TextAnalysis
      import graft.functions.Exact
      val docs = Tables.documentsFanned(spark, dir)
      val label = graft.plans.TextHash.classifierScore(
        graft.functions.TextOps.tokens(col("text"))) > 0L
      val (meta, feats) = TextAnalysis.logisticFrames(
        docs, "doc_id", "text", label, 4096, materialize = true)
      meta.count(); feats.count()
      val nDocs = 5000L
      def roundOnce(dsumF: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                    hintErr: Boolean): org.apache.spark.sql.DataFrame = {
        val sw = feats.withColumn("wf", lit(0.0))
          .select(col("doc_id"), col("wf"))
          .groupBy("doc_id").agg(dsumF(col("wf")).as("sw"))
        val err0 = meta.join(sw, Seq("doc_id"))
          .select(col("doc_id").as("__did"),
            ((round(lit(1.0) / (lit(1.0) + exp(-(col("sw") / col("n_feats")))), 6)
              - col("y").cast("double")) * when(col("y") === 1L,
              lit(0.5460899)).otherwise(lit(5.9241706))).as("err"),
            col("n_feats").as("__nf"))
        val err = if (hintErr) err0.hint("shuffle_hash") else err0
        feats.join(err, col("doc_id") === col("__did"))
          .select(col("bucket"), round(col("err") / col("__nf"), 6).as("c"))
          .groupBy("bucket").agg(dsumF(col("c")).as("g"))
      }
      def time(lbl: String)(f: => Unit): Unit = (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[exp] $lbl rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      time("A dsum+smj") { roundOnce(Exact.dsum, hintErr = false)
        .write.format("noop").mode("overwrite").save() }
      time("B dsum+shj") { roundOnce(Exact.dsum, hintErr = true)
        .write.format("noop").mode("overwrite").save() }
      time("C dsumL+shj") { roundOnce(Exact.dsumL(_, 6), hintErr = true)
        .write.format("noop").mode("overwrite").save() }
      val a = roundOnce(Exact.dsum, hintErr = false).orderBy("bucket").collect()
      val b = roundOnce(Exact.dsum, hintErr = true).orderBy("bucket").collect()
      val c = roundOnce(Exact.dsumL(_, 6), hintErr = true).orderBy("bucket").collect()
      println(s"[exp] a==b ${a.sameElements(b)} a==c ${a.sameElements(c)}")
      a.zip(c).filter { case (x, y) => x != y }.take(3)
        .foreach { case (x, y) => println(s"[exp] DIFF $x vs $y") }
      spark.stop()
      return
    }
    if (name == "_q70_stride") {
      // r19 (VERDICT #8): can the 25-level UnionLoop walk the chains
      // in stride-K steps — each recursion level emitting K positions
      // per customer from a precomputed per-customer prefix sum — so
      // the recursion pays depth/K full passes over seqd instead of
      // depth? Equality vs the shipped q70 is checked exactly.
      import org.apache.spark.sql.functions._
      spark.conf.set("spark.sql.cteRecursionRowLimit", "1000000000")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val seqd = Tables(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice") * 10000.0).cast("long").as("price_l"),
          row_number().over(w).cast("long").as("rn"))
        .withColumn("cum_l", sum(col("price_l")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("o_custkey").orderBy("rn")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .coalesce(math.max(1, spark.sparkContext.defaultParallelism / 4))
        .localCheckpoint(false)
      seqd.createOrReplaceTempView("seqd_s")
      def strided(k: Int) = spark.sql(
        s"""WITH RECURSIVE chain(o_custkey, o_orderkey, rn, running_l, adv) AS (
           | SELECT o_custkey, o_orderkey, rn, cum_l, true FROM seqd_s WHERE rn = 1
           | UNION ALL
           | SELECT /*+ BROADCAST(c) */ s.o_custkey, s.o_orderkey, s.rn,
           |  s.cum_l, s.rn = c.rn + $k
           | FROM chain c JOIN seqd_s s
           |  ON s.o_custkey = c.o_custkey AND c.adv
           |  AND s.rn BETWEEN c.rn + 1 AND c.rn + $k)
           |SELECT o_custkey, o_orderkey, rn,
           | CAST(running_l AS DOUBLE) / 10000.0 AS running
           |FROM chain""".stripMargin)
      def rep(label: String)(f: => org.apache.spark.sql.DataFrame): Unit =
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          f.write.format("noop").mode("overwrite").save()
          println(f"[exp] $label rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      rep("shipped")(graft.SparkEntry.queries("q70_recursive_chains")(spark, dir))
      for (k <- Seq(1, 2, 5, 8)) rep(s"stride$k")(strided(k))
      val base = graft.SparkEntry.queries("q70_recursive_chains")(spark, dir)
        .orderBy("o_custkey", "rn").collect()
      for (k <- Seq(2, 5, 8)) {
        val got = strided(k).orderBy("o_custkey", "rn").collect()
        println(s"[exp] stride$k identical=${base.sameElements(got)} " +
          s"rows=${got.length}/${base.length}")
      }
      spark.stop()
      return
    }
    if (name == "_dsuml_exp") {
      // VERDICT r3 #8: does long-scaled integer accumulation
      // (sum(round(x*1e4) as long)/1e4) beat the DECIMAL(18,4) sums the
      // oracle bit-equality uses, and does it produce identical doubles?
      import org.apache.spark.sql.functions._
      import graft.functions.Exact
      val li = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .localCheckpoint()
      def dec = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(Exact.dsumM(col("l_quantity")).as("a"),
          Exact.dsumM(col("l_extendedprice")).as("b"),
          Exact.dsumM(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"))
      def lsum(c: org.apache.spark.sql.Column) =
        sum(round(c * 10000).cast("long")) / 10000.0
      def lng = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(lsum(col("l_quantity")).as("a"),
          lsum(col("l_extendedprice")).as("b"),
          lsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"))
      def rep(label: String)(f: => org.apache.spark.sql.DataFrame): Unit =
        (1 to 5).foreach { i =>
          val t0 = System.nanoTime()
          f.write.format("noop").mode("overwrite").save()
          println(f"[exp] $label rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      rep("decimal")(dec); rep("longscaled")(lng)
      val d = dec.orderBy("l_returnflag", "l_linestatus").collect()
      val l = lng.orderBy("l_returnflag", "l_linestatus").collect()
      println(s"[exp] identical=${d.sameElements(l)}")
      d.zip(l).foreach { case (a, b) => if (a != b) println(s"[exp] DIFF\n  $a\n  $b") }
      spark.stop()
      return
    }
    val tb = System.nanoTime()
    val df = name match {
      case "entry" => graft.SparkEntry.entry(spark)
      case "_sigs" => Dedup.signatures(Tables.documents(spark, dir), "doc_id", "text", 32)
      case _ => graft.SparkEntry.queries(name)(spark, dir)
    }
    // plan-build is not free for operators with eager steps (iterative
    // clustering, index builds) — surface it separately
    println(s"build=${(System.nanoTime() - tb) / 1e9}s")
    if (sys.env.contains("SCRATCH_EXPLAIN")) { df.explain("formatted"); df.show(10, false) }
    // rows via count (prunes agg expressions), but TIME via the noop
    // sink, which materializes every output column — the same
    // materialization Bench uses, so Scratch timings are comparable
    val n = df.count()
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(s"rows=$n time=${(System.nanoTime() - t0) / 1e9}s")
    // the steady-state read carries the NOISE-FREE work axes beside
    // wall-clock (the bench work-metrics discipline): a probe whose
    // seconds moved but whose bytes/tasks didn't is host noise
    val wl = new graft.Bench.WorkListener
    spark.sparkContext.addSparkListener(wl)
    val cap = graft.Bench.captureLastExecution(spark)
    graft.Bench.drainBus(spark); wl.reset(); cap.clear()
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val dt1 = (System.nanoTime() - t1) / 1e9
    graft.Bench.drainBus(spark)
    val rows = Option(cap.get())
      .map(qe => graft.Bench.firstOutputRows(qe.executedPlan))
      .getOrElse(-1L)
    val w = wl.snapshot(rows, "")
    println(s"second_run=${dt1}s sr=${w.sr} sw=${w.sw} in=${w.in} " +
      s"spill=${w.spill} tasks=${w.tasks} sink_rows=${w.rows}")
    spark.stop()
  }
}
