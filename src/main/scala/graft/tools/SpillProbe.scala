package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-constrained SPILL POSTURE probe: run named queries under a
  * deliberately small heap and report completion + spill metrics — the
  * 100 TB question the 128 GiB sandbox never asks. At cluster scale
  * the working set does not fit and plans must DEGRADE TO SPILL
  * (sort/agg/join spill to disk, bounded memory), not OOM: a query
  * that dies here under -Xmx2g is carrying a driver/executor-side
  * structure sized to the corpus (an unbounded typedlit/broadcast, a
  * collect, a localCheckpoint of the whole input) — a real scale
  * defect the comfortable heap hides.
  *
  * Run (heap set by the CALLER — sbt forks the JVM):
  *   sbt 'set run/javaOptions += "-Xmx2g"; runMain graft.tools.SpillProbe
  *        /root/testdata/sf0.1 q01_pricing_summary,d19_containment_pairs'
  * with SPARK_GRAFT_CPUS=4 for the constrained local[4] shape.
  * Prints one line per query: wall seconds, memory/disk spill bytes
  * (summed task metrics), peak single-task execution memory, status. */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: SpillProbe <sfDir> <q1,q2,...>")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_spill_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[spillprobe] heap=${Runtime.getRuntime.maxMemory() / (1 << 20)}MiB " +
      s"cores=$cpus shuffle_partitions=$cpus sf=$sfDir")
    @volatile var memSpilled = 0L
    @volatile var diskSpilled = 0L
    @volatile var peakExec = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpilled += m.memoryBytesSpilled
          diskSpilled += m.diskBytesSpilled
          peakExec = math.max(peakExec, m.peakExecutionMemory)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try graft.Queries.prepare(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[spillprobe] prepare failed: $e")
    }
    val byName = graft.SparkEntry.queries
    names.foreach { name =>
      byName.get(name) match {
        case None => println(s"[spillprobe] $name UNKNOWN")
        case Some(fn) =>
          memSpilled = 0L; diskSpilled = 0L; peakExec = 0L
          val t0 = System.nanoTime()
          val status =
            try {
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              "ok"
            } catch {
              case e: Throwable =>
                val oom = Option(e.getMessage).exists(_.contains("OutOfMemory")) ||
                  e.isInstanceOf[OutOfMemoryError] ||
                  Iterator.iterate(e.getCause)(_.getCause).takeWhile(_ != null)
                    .take(8).exists(_.isInstanceOf[OutOfMemoryError])
                if (oom) "OOM" else s"FAILED: ${e.toString.take(120)}"
            }
          val sec = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          // settle so straggler task-end events land before the read
          Thread.sleep(300)
          println(f"[spillprobe] $name%-28s $status%-6s wall=$sec%7.2fs " +
            f"spill_mem=${memSpilled / (1 << 20)}%6dMiB " +
            f"spill_disk=${diskSpilled / (1 << 20)}%6dMiB " +
            f"peak_task_exec=${peakExec / (1 << 20)}%5dMiB")
      }
    }
    spark.stop()
  }
}
