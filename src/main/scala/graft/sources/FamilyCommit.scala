package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-ingest COMMIT MARKERS for a maintenance family — the
  * read-side half of the replay discipline. A family's member writes
  * are sequential (`_ndband` then `_ndsh` then `_clusters`, …), so a
  * consumer reading BETWEEN them sees a half-landed ingest: candidate
  * rows whose verify join can't resolve, postings whose stats row
  * hasn't landed. The audit→repair loop detects and heals that state
  * after the fact; the marker PREVENTS it from ever being read:
  *
  *   - the pipeline calls [[commit]] with the family prefix AFTER the
  *     ingest's LAST member write — one tiny partition landed in
  *     `{prefix}_commits` (ingest_id-partitioned, dynamic-overwrite,
  *     replay-idempotent like every family write);
  *   - family readers go through [[visible]], which filters member
  *     rows to committed ingests (plus `base`, the bootstrap fold
  *     target — compaction re-stamps rows to `base`, which stays
  *     visible by construction);
  *   - the audit classifies an UNCOMMITTED ingest by the age of its
  *     newest member write ([[status]]): younger than the grace window
  *     means in-flight (a writer is mid-family — leave it alone),
  *     older means crashed (repair it).
  *
  * OPT-IN per family: a family with no `{prefix}_commits` table is
  * legacy-open (every ingest visible, the pre-marker contract), so
  * existing stores need no migration. Only the ORCHESTRATOR knows
  * which member write is the family's last — the library writers
  * never auto-commit.
  */
object FamilyCommit {

  private def commitsTable(prefix: String) = s"${prefix}_commits"

  /** Whether the family at `prefix` enforces commit visibility. */
  def enabled(spark: SparkSession, prefix: String): Boolean =
    spark.catalog.tableExists(commitsTable(prefix))

  /** Mark `ingestId` committed for the family at `prefix` — call after
    * the ingest's LAST member write. Creates the commits table on
    * first use (which SWITCHES the family to enforced visibility: do
    * the first commit for `base`/existing ingests before relying on
    * reads). Replay-idempotent: the marker is an ingest_id partition
    * written by dynamic overwrite. */
  def commit(spark: SparkSession, prefix: String, ingestId: String): Unit = {
    require(ingestId.nonEmpty, "ingestId must be non-empty")
    val tbl = commitsTable(prefix)
    // the committed id is ALSO a data column: the partition value is
    // the replay key (one marker partition per ingest, idempotent
    // overwrite), but the id a reader trusts must survive compaction
    // ([[compactMarkers]] folds partitions; an id living only in the
    // partition VALUE would vanish with the fold and silently revoke
    // every folded commit)
    val row = spark.range(1)
      .select(current_timestamp().as("committed_at"),
        lit(ingestId).as("committed_id"),
        lit(ingestId).as("ingest_id"))
    if (!spark.catalog.tableExists(tbl))
      row.write.mode(SaveMode.Overwrite).partitionBy("ingest_id")
        .format("parquet").saveAsTable(tbl)
    else {
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try row.write.mode(SaveMode.Overwrite).insertInto(tbl)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** The committed ingest ids, or None when the family is legacy-open
    * (no commits table). Read from the DATA column so markers folded
    * by [[compactMarkers]] still count. */
  def committedIds(spark: SparkSession, prefix: String): Option[Set[String]] =
    if (!enabled(spark, prefix)) None
    else {
      import spark.implicits._
      Some(spark.table(commitsTable(prefix))
        .select(col("committed_id").cast("string")).distinct()
        .as[String].collect().toSet)
    }

  /** Compaction for the marker table itself (one tiny partition per
    * ingest accrues forever — the same small-files tax every per-ingest
    * store pays): markers OLDER than the newest `keepLast` fold into a
    * single `base` partition, their ids preserved in the data column;
    * kept markers stay replay-overwritable. Durable side-table swap
    * (the compactIngests rename-aside discipline, minus bucketing —
    * the marker table has no bucket spec). NEVER fold this table with
    * the generic ingest compaction: that rewrites the `ingest_id`
    * partition values the marker rows derive nothing from, but only
    * this routine knows the commits contract. */
  def compactMarkers(spark: SparkSession, prefix: String,
                     keepLast: Int = 1): Unit = {
    val tbl = commitsTable(prefix)
    val ids = {
      import spark.implicits._
      spark.table(tbl).select(col("ingest_id").cast("string")).distinct()
        .as[String].collect().toSeq
    }
    val kept = Bucketing.newestIngestIds(spark,
      Bucketing.tableLocation(spark, tbl), ids, keepLast)
    val keptCond = kept.foldLeft(lit(false))((c, id) => c || col("ingest_id") === id)
    val remapped = spark.table(tbl)
      .withColumn("ingest_id",
        when(keptCond, col("ingest_id")).otherwise(lit("base")))
    val side = s"${tbl}__compacting"
    val old = s"${tbl}__old"
    spark.sql(s"DROP TABLE IF EXISTS $side")
    remapped.write.mode(SaveMode.Overwrite).partitionBy("ingest_id")
      .format("parquet").saveAsTable(side)
    spark.sql(s"DROP TABLE IF EXISTS $old")
    spark.sql(s"ALTER TABLE $tbl RENAME TO $old")
    spark.sql(s"MSCK REPAIR TABLE $old SYNC PARTITIONS")
    spark.sql(s"ALTER TABLE $side RENAME TO $tbl")
    spark.sql(s"DROP TABLE $old")
    spark.sql(s"MSCK REPAIR TABLE $tbl SYNC PARTITIONS")
    spark.catalog.refreshTable(tbl)
  }

  /** Restrict a family-member read to COMMITTED ingests (+ `base`).
    * Legacy-open families (no commits table) pass through unchanged.
    * The filter is a literal IN on the partition column, so the member
    * scan stays partition-pruned. */
  def visible(spark: SparkSession, member: DataFrame, prefix: String): DataFrame =
    committedIds(spark, prefix) match {
      case None => member
      case Some(ids) =>
        member.filter(col("ingest_id").isin((ids + "base").toSeq: _*))
    }

  /** CROSS-family visibility for COMPOSED reads. One logical ingest
    * spans several families committed sequentially (the stream sink
    * lands lexical then IVF; a maintain run appends family by family),
    * and a composed reader spans families too: hybrid retrieval fuses
    * the lexical and vector legs, incremental admission joins the
    * exact-key and near-dup-key stores. A reader in the window between
    * two family commits would see the ingest in one leg and not the
    * other — a doc BM25-retrievable but absent from the vector leg
    * skews that window's fused ranks. Gating every leg on the
    * INTERSECTION of the involved families' committed sets makes the
    * ingest visible ATOMICALLY: in no leg until its LAST family marker
    * lands, in every leg after.
    *
    * Implemented as a fold of [[visible]] (set-intersection by
    * composition — the filter stack stays literal-IN partition-pruned
    * per family); a legacy-open family contributes no filter, exactly
    * its single-family contract. PRECONDITION: the composed families
    * share one logical ingest-id space (the same batch lands in each
    * under the same id — the `stream<batchId>` / date-id discipline);
    * families with unrelated id spaces have no cross-family ingest to
    * gate and must be read per-family. */
  def visibleAcross(spark: SparkSession, member: DataFrame,
                    prefixes: Seq[String]): DataFrame =
    prefixes.distinct.foldLeft(member)((df, p) => visible(spark, df, p))

  /** The ids a composed read over `prefixes` may trust — the
    * intersection of every enforcing family's committed set, or None
    * when all are legacy-open (everything visible). `base` is always
    * additionally visible, as in [[visible]]. */
  def committedAcross(spark: SparkSession,
                      prefixes: Seq[String]): Option[Set[String]] = {
    val sets = prefixes.distinct.flatMap(committedIds(spark, _))
    sets.reduceOption(_ intersect _)
  }

  /** Classify every ingest id across the family's `members` (catalog
    * tables or `parquet:/dir`): per id, the member row-count pivot of
    * [[Bucketing.auditIngests]] plus
    *   - `committed`: the marker exists,
    *   - `status`: "committed" when marked AND consistent; "broken"
    *     when marked but missing from a member (a marker should only
    *     follow the last write — repair immediately); for unmarked
    *     ingests, "in-flight" while the newest member write is younger
    *     than `graceMs`, "crashed" once older.
    * `base` counts as committed by construction. Partition write
    * times come off the member directories (one globStatus per
    * (member, id) — driver-side, bounded by ingests × members). */
  def status(spark: SparkSession, members: Seq[String], prefix: String,
             graceMs: Long): DataFrame = {
    import org.apache.hadoop.fs.Path
    val audit = Bucketing.auditIngests(spark, members)
    val committed = committedIds(spark, prefix).getOrElse(Set.empty) + "base"
    val locs = members.map { m =>
      if (m.startsWith("parquet:")) m.stripPrefix("parquet:")
      else Bucketing.tableLocation(spark, m)
    }
    val hconf = spark.sparkContext.hadoopConfiguration
    def newestWrite(id: String): Long = locs.flatMap { loc =>
      val base = new Path(loc)
      val fs = base.getFileSystem(hconf)
      Seq(s"ingest_id=$id", s"*/ingest_id=$id").flatMap { pat =>
        try Option(fs.globStatus(new Path(base, pat)))
          .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus]).toSeq
        catch { case _: java.io.IOException => Nil }
      }.map(_.getModificationTime)
    }.foldLeft(0L)(math.max)
    val now = System.currentTimeMillis()
    // driver-side classification (the audit is one row per ingest id,
    // bounded): filesystem mtime probes don't belong in executor-side
    // expressions
    import spark.implicits._
    val flat = audit.select(col("ingest_id").cast("string"),
      col("consistent")).as[(String, Boolean)].collect()
    val statuses = flat.toSeq.map { case (id, consistent) =>
      val s =
        if (committed(id)) { if (consistent) "committed" else "broken" }
        else if (now - newestWrite(id) < graceMs) "in-flight"
        else "crashed"
      (id, committed(id), s)
    }.toDF("ingest_id", "committed", "status")
    audit.join(broadcast(statuses), Seq("ingest_id"))
  }
}
