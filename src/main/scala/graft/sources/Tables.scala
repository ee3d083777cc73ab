package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver's Parquet star schema (TESTDATA.md).
  *
  * Plain `spark.read.parquet` — schema comes from the parquet footer, so no
  * inference scan. All downstream operators stay declarative, which lets
  * Catalyst push filters and prune columns into the scan (verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`). At cluster
  * scale the same readers work unchanged: partition pruning and split
  * planning are handled by the parquet source.
  *
  * Reference data model: SURVEY.md §1 (the reference declares fixed
  * StructTypes at the edge, `spark/jobs/stock_batch.py:16-24`); here the
  * edge is parquet, which carries its own schema.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark rejects at
    // schema conversion unless this conf is set. Set it on every read
    // (idempotent session conf) rather than inside the events reader
    // only — otherwise whether a generic read of `events` works depends
    // on whether Tables.events happened to run first in the session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as epoch-nanos long and convert with
    * integral division (`DIV 1000` — double division would lose
    * precision above 2^53). The driver's synthetic timestamps are
    * µs-aligned, so the conversion is lossless and matches the DuckDB
    * oracle's native ns reads. */
  def events(s: SparkSession, d: String): DataFrame = {
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
