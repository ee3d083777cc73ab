package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch runner: evaluates one named query with full stack
  * traces. `runMain graft.tools.Scratch <queryName> [sfDir]`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.sources.Tables
    val df = name match {
      case "entry" => graft.SparkEntry.entry(spark)
      case "_sigs" => Dedup.signatures(Tables.documents(spark, dir), "doc_id", "text", 32)
      case _ => graft.SparkEntry.queries(name)(spark, dir)
    }
    if (sys.env.contains("SCRATCH_EXPLAIN")) { df.explain("formatted"); df.show(10, false) }
    val t0 = System.nanoTime()
    val n = df.count()
    println(s"rows=$n time=${(System.nanoTime() - t0) / 1e9}s")
    val t1 = System.nanoTime()
    df.count()
    println(s"second_run=${(System.nanoTime() - t1) / 1e9}s")
    spark.stop()
  }
}
