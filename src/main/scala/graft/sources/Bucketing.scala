package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run with NO exchange at read
  * time — the core strategy for a fact table that is joined on the
  * same key by every query (lineitem.l_orderkey ⋈ orders.o_orderkey at
  * 100 TB: bucket both once, then every join is a zipped local join).
  *
  * Uses the session catalog's managed tables (`saveAsTable` — plain
  * `.parquet(path)` cannot persist bucket metadata).
  */
object Bucketing {
  /** Write `df` as a managed table bucketed (and sorted) by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    writeBucketedMulti(df, table, Seq(key), buckets, mode)

  /** Multi-key form: bucket (and sort) on a composite join key — for
    * joins whose equi-keys are a column PAIR (e.g. LSH (band_idx,
    * band_key)), where bucketing on a prefix would still exchange.
    * SaveMode.Append is the per-ingest maintenance write of an
    * incrementally-maintained key table: new rows land bucket-aligned
    * (Spark validates the spec against the catalog, a mismatch throws
    * rather than silently degrading the layout), so reads stay
    * exchange-free and the table never needs a rebuild. */
  def writeBucketedMulti(df: DataFrame, table: String, keys: Seq[String],
                         buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket
    * count: Catalyst sees compatible output partitionings and plans a
    * sort-merge join with zero Exchange on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
