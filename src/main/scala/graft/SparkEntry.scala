package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real query surface lives in [[graft.Queries]]; this object only
  * adapts it to the driver's expected shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the 3-way join + aggregation (scan, filter, join, hash agg,
    * exact-decimal sums) as the representative end-to-end slice. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q03.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash-specific / approximate
    * operators (MinHash, SimHash, LSH-ANN) → driver records a weaker
    * rows-only check; those are ScalaTest-covered instead. */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
