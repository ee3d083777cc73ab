package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion propagation — the right-to-be-forgotten path of the
  * maintenance family: remove a (bounded) set of document ids from the
  * corpus landing AND every doc-keyed derived store (near-dup key
  * tables, IVF assignments, ADC postings), by PARTITION-TARGETED
  * rewrite — only partitions that actually contain a requested id are
  * touched, located by one partition-column projection of the id
  * filter, so the cost is O(affected partitions), never a full-store
  * rewrite. A partition whose rows ALL vanish is dropped outright
  * (a dynamic overwrite with zero rows would silently leave it
  * behind — the stale-partition trap).
  *
  * What forget deliberately does NOT touch: the CONTENT-keyed
  * exact-dedup stores (`_norm`/`_bands` tables, the maintain key dir)
  * hold fingerprints of content, not documents — they carry no doc
  * attribution to delete by, and keeping them means re-posts of the
  * forgotten content are still suppressed, which is what a deletion
  * request wants (the content must not come back via another upload).
  * A deployment that must ALSO forget the fingerprints needs
  * refcounted keys — a different table contract, out of scope here.
  *
  * Idempotent: a second run with the same ids finds no affected
  * partitions and rewrites nothing. Ids are a driver-side Seq — a
  * deletion-request batch is small by nature; a bulk purge (a whole
  * source or time range) should instead ride the compaction cadence
  * as an anti-join rewrite.
  */
object Forget {

  /** Delete `ids` rows from an ingest-partitioned parquet DIRECTORY
    * store (the dedup corpus landing, layout e.g. (lang, ingest_id)).
    * Each affected partition is rewritten durably: the kept rows are
    * fully written to a side directory first, then swapped in by
    * rename (the compaction discipline — a full copy exists on disk
    * at every instant). Returns the number of rows deleted. */
  def forgetFromDir(spark: SparkSession, dir: String, idCol: String,
                    ids: Seq[Long], partitionCols: Seq[String]): Long = {
    require(ids.nonEmpty, "forget needs at least one id")
    import org.apache.hadoop.fs.Path
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = spark.read.parquet(dir)
    // one projection pass finds the affected partitions; everything
    // after is partition-pruned
    val affected = df.filter(col(idCol).isin(ids: _*))
      .select(partitionCols.map(col): _*).distinct().collect()
    var deleted = 0L
    affected.foreach { row =>
      val pred = partitionCols.zipWithIndex
        .map { case (c, i) => col(c) === lit(row.get(i)) }.reduce(_ && _)
      val partPath = new Path(base, partitionCols.zipWithIndex
        .map { case (c, i) => s"$c=${row.get(i)}" }.mkString("/"))
      val part = df.filter(pred)
      val kept = part.filter(!col(idCol).isin(ids: _*))
        .drop(partitionCols: _*)
      val keptN = kept.count()
      deleted += part.count() - keptN
      if (keptN == 0L) {
        // the whole partition was the forgotten docs: drop the
        // directory — there is no row left to express it with
        fs.delete(partPath, true)
        ()
      } else {
        val side = partPath.suffix("__forgetting")
        val old = partPath.suffix("__forgotten")
        fs.delete(side, true)
        kept.write.mode(SaveMode.Overwrite).parquet(side.toString)
        fs.delete(old, true)
        require(fs.rename(partPath, old), s"rename $partPath -> $old failed")
        require(fs.rename(side, partPath), s"rename $side -> $partPath failed")
        fs.delete(old, true)
        ()
      }
    }
    deleted
  }

  /** Delete `ids` rows from a managed ingest-partitioned BUCKETED
    * table (near-dup key tables, IVF assignments, ADC postings —
    * `idCol` names the doc-keyed column: `doc_id` / `id` /
    * `neighbor_id`). Affected `ingest_id` partitions are rewritten
    * through [[graft.sources.Bucketing.writeBucketedIngest]]'s dynamic
    * partition overwrite with the SAME bucket/sort spec, so
    * exchange-free reads survive the deletion; a partition left empty
    * is dropped via the catalog. The kept rows are eagerly
    * materialized before the overwrite (the self-read-overwrite rule;
    * bounded by one ingest partition). Returns rows deleted. */
  def forgetFromTable(spark: SparkSession, table: String, keys: Seq[String],
                      idCol: String, ids: Seq[Long]): Long = {
    require(ids.nonEmpty, "forget needs at least one id")
    import spark.implicits._
    val df = spark.table(table)
    val affected = df.filter(col(idCol).isin(ids: _*))
      .select(col("ingest_id").cast("string")).distinct()
      .as[String].collect()
    val buckets = graft.sources.Bucketing.bucketsOf(spark, table)
    var deleted = 0L
    affected.foreach { ing =>
      val part = df.filter(col("ingest_id") === ing)
      val kept = part.filter(!col(idCol).isin(ids: _*)).drop("ingest_id")
        .localCheckpoint(true)
      val keptN = kept.count()
      deleted += part.count() - keptN
      if (keptN == 0L)
        spark.sql(s"ALTER TABLE $table DROP IF EXISTS " +
          s"PARTITION (ingest_id='$ing')")
      else
        graft.sources.Bucketing.writeBucketedIngest(spark, kept, table,
          keys, buckets, ingestId = ing)
    }
    spark.catalog.refreshTable(table)
    deleted
  }
}
