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
    // Legacy testdata generations carried events.ts as TIMESTAMP(NANOS),
    // which Spark rejects at schema conversion unless this conf is set
    // (it reads as epoch-nanos LongType instead). Harmless on the
    // current TIMESTAMP(MICROS) layout; kept so the nanos fixture and
    // any old replica stay readable. Set on every read (idempotent
    // session conf) rather than inside the events reader only —
    // otherwise whether a generic read of `events` works depends on
    // whether Tables.events happened to run first in the session.
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
  /** `events.ts` has shipped in two parquet layouts across driver testdata
    * generations, so branch on the ingested type:
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects it outright unless
    *    `nanosAsLong` is set (done in `apply`), in which case it arrives as
    *    `LongType` epoch-nanos. Convert with integral division
    *    (`DIV 1000` — double division would lose precision above 2^53);
    *    the synthetic timestamps are µs-aligned, so this is lossless.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    `TIMESTAMP_NTZ`. Cast to `TimestampType` for a schema identical to
    *    the nanos path. The cast reinterprets wall-clock values in the
    *    session timezone, so it is only lossless when the session is pinned
    *    to UTC — assert that precondition here rather than relying on every
    *    entrypoint's builder config.
    *  - Already `TimestampType` (isAdjustedToUTC=true): pass through.
    *
    * Scale note: time-range predicates written against the converted
    * `ts` still reach the parquet scan on the NTZ path — Catalyst's
    * UnwrapCastInBinaryComparison rewrites `cast(ts) >= lit` to an
    * NTZ comparison (verified: `PushedFilters: [GreaterThanOrEqual(ts,
    * …)]` in the formatted plan), so a 100 TB scan with a time filter
    * prunes row groups rather than reading the table.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        val tz = s.conf.get("spark.sql.session.timeZone")
        // any UTC-equivalent zone id keeps the cast lossless — normalize
        // rather than string-compare so "Etc/UTC"/"GMT"/"+00:00" pass
        val utcEquivalent =
          try java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
          catch { case _: java.time.DateTimeException => false }
        require(utcEquivalent,
          s"events.ts is TIMESTAMP_NTZ; casting to TIMESTAMP is only " +
            s"lossless under a UTC session, but spark.sql.session.timeZone=$tz")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as unrecognized type $other — the driver " +
          "testdata layout changed again; teach Tables.events the new " +
          "layout (see TablesDriftSpec)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
