package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor replicator for the builder-side sf1 bench probe:
  * `runMain graft.tools.MakeScale <srcSfDir> <destDir> <factor>`
  * writes `factor`× copies of the tables the headline-expensive
  * queries read (documents, orders), with keys remapped per replica.
  *
  * Construction matters more than volume here. Document TEXT is
  * salted per replica at the TOKEN level (`word` → `word_rN`), so:
  *   - cross-replica shingle sets are DISJOINT — near-dup/containment
  *     pair counts scale exactly linearly with the factor (naive
  *     cloning would add cross-replica pairs quadratically, the
  *     clones-squared artifact TESTDATA.md documents for the 100×
  *     hash-stability sweeps, and any superlinear bench ratio would
  *     measure the fixture, not the engine);
  *   - within-replica structure is byte-for-byte isomorphic to the
  *     source, so per-replica work is the source workload repeated.
  * `n_chars` is recomputed from the salted text. Orders remap both
  * o_orderkey and o_custkey (disjoint customers per replica), so q70's
  * recursion DEPTH stays the per-customer maximum (25) while its row
  * count scales with the factor — depth-bounded recursion is the
  * contract being probed. Replica 0 is the source verbatim. */
object MakeScale {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: MakeScale <srcSfDir> <destDir> <factor>")
    val Array(src, dest, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(table: String, remap: (DataFrame, Int, Long) => DataFrame,
                  keyCol: String): Unit = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val step = df.agg(max(col(keyCol))).head.getLong(0) + 1L
      (0 until factor).map(i => remap(df, i, step))
        .reduce(_ unionByName _)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$dest/$table.parquet")
      val n = spark.read.parquet(s"$dest/$table.parquet").count()
      println(s"[makescale] $table: ${df.count()} x $factor -> $n rows")
    }

    replicate("documents", (df, i, step) => {
      val salted =
        if (i == 0) df
        else df.withColumn("text",
            regexp_replace(col("text"), "(\\S+)", "$1_r" + i))
          .withColumn("n_chars", length(col("text")).cast("long"))
      salted.withColumn("doc_id", col("doc_id") + lit(i * step))
    }, "doc_id")

    val custStep = spark.read.parquet(s"$src/orders.parquet")
      .agg(max(col("o_custkey"))).head.getLong(0) + 1L
    replicate("orders", (df, i, step) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * step))
      .withColumn("o_custkey", col("o_custkey") + lit(i * custStep)),
      "o_orderkey")

    spark.stop()
  }
}
