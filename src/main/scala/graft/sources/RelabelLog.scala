package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Durable EDIT LOG for in-place row edits of a cluster-assignment
  * table ([[graft.operators.Dedup.saveClusterAssignments]]'s
  * `{name}_clusters`, bucketed on `doc_id`) — the redo log that makes
  * multi-partition relabels CRASH-CONVERGENT.
  *
  * Why a log at all: a cluster merge (or a forget's relabel/dissolve)
  * rewrites several ingest partitions in place, and a crash between
  * those rewrites leaves ONE component split across two `cluster_id`s
  * — e.g. the delta-incident member already moved to the merged label
  * while its old siblings keep the stale one. A retry that recomputes
  * "touched" clusters from the table's CURRENT labels can no longer
  * see the stale half (nothing links it to a delta endpoint anymore),
  * so the split would persist forever — the unsafe direction for
  * dedup and decontamination. Recording the FULL edit set durably
  * before the first partition rewrite, and replaying it as a preamble
  * on every maintenance entry, closes that window: the replay is
  * idempotent (a row already edited re-edits to the same value), and
  * only after every partition holds the logged state is the log
  * cleared.
  *
  * Log rows: `(doc_id, new_cid)` — `new_cid` NULL means DELETE the
  * row (a forgotten doc, or the survivor of a dissolving <2-member
  * cluster); non-NULL sets `cluster_id`. The log lives OUTSIDE the
  * table directory (`_<dir>__relabel` sibling — the Forget staging
  * discipline: anything `k=v`-shaped inside the tree parses as a
  * partition column) and is made visible by an ATOMIC rename of a
  * fully-written temp dir, so a crash mid-begin leaves no log and the
  * table untouched. Single-writer per family, like every maintenance
  * op.
  */
private[graft] object RelabelLog {

  private def logRoot(spark: SparkSession, table: String): Path = {
    val loc = new Path(Bucketing.tableLocation(spark, table))
    new Path(loc.getParent, "_" + loc.getName + "__relabel")
  }

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Durably record `edits` (`doc_id`, nullable `new_cid`) as the
    * pending edit set: fully written to a temp sibling, then renamed
    * in — atomic visibility, so recovery only ever sees a COMPLETE
    * log. Call before the first partition rewrite. */
  def begin(spark: SparkSession, table: String, edits: DataFrame): Unit = {
    val root = logRoot(spark, table)
    val fs = fsOf(spark, root)
    val tmp = root.suffix("__writing")
    fs.delete(tmp, true)
    fs.delete(root, true)
    edits.select(col("doc_id").cast("long"), col("new_cid").cast("long"))
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(tmp, root), s"relabel log: rename $tmp -> $root failed")
  }

  /** Apply-and-clear any pending edit log — the preamble every cluster
    * maintenance entry runs (and the second half of a begin/recover
    * pair when applying fresh edits). Replays the logged edits against
    * every partition holding an edited doc (idempotent — already-
    * applied edits rewrite to the same value), preserving partition
    * mtimes, then deletes the log. An orphaned temp dir (crash
    * mid-begin, no visible log) is discarded: the table was never
    * touched under it. Returns true when a log was applied. */
  def recover(spark: SparkSession, table: String): Boolean = {
    val root = logRoot(spark, table)
    val fs = fsOf(spark, root)
    fs.delete(root.suffix("__writing"), true)
    if (!fs.exists(root)) return false
    applyEdits(spark, table, spark.read.parquet(root.toString))
    fs.delete(root, true)
    true
  }

  /** One partition-targeted pass: every ingest partition holding an
    * edited doc_id is rewritten with deletes applied and labels set,
    * bucket spec preserved, mtime restored; a partition left empty is
    * dropped via the catalog. */
  private def applyEdits(spark: SparkSession, table: String,
                         edits: DataFrame): Unit = {
    import spark.implicits._
    val marked = edits
      .select(col("doc_id"), col("new_cid").as("__edit_cid"),
        lit(true).as("__edited"))
    val df = spark.table(table)
    val affected = df.join(marked, Seq("doc_id"), "left_semi")
      .select(col("ingest_id").cast("string")).distinct()
      .as[String].collect()
    val buckets = Bucketing.bucketsOf(spark, table)
    affected.foreach { ing =>
      val part = df.filter(col("ingest_id") === ing)
      val kept = part.join(broadcast(marked), Seq("doc_id"), "left")
        // matched with a NULL target = delete; matched non-NULL =
        // relabel; unmatched passes through
        .filter(col("__edited").isNull || col("__edit_cid").isNotNull)
        .withColumn("cluster_id", coalesce(col("__edit_cid"), col("cluster_id")))
        .drop("__edit_cid", "__edited", "ingest_id")
        // eager: the rewrite below overwrites the very files this reads
        .localCheckpoint(true)
      if (kept.isEmpty)
        spark.sql(s"ALTER TABLE $table DROP IF EXISTS " +
          s"PARTITION (ingest_id='$ing')")
      else
        Bucketing.preservingMtime(spark, table, ing) {
          Bucketing.writeBucketedIngest(spark, kept, table,
            Seq("doc_id"), buckets, ingestId = ing)
        }
    }
    spark.catalog.refreshTable(table)
  }
}
