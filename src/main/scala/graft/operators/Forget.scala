package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion propagation — the right-to-be-forgotten path of the
  * maintenance family: remove a (bounded) set of document ids from the
  * corpus landing AND every doc-keyed derived store (near-dup key
  * tables, IVF assignments, ADC postings, cluster assignments), by
  * PARTITION-TARGETED rewrite — only partitions that actually contain
  * a requested id are touched, located by one partition-column
  * projection of the id filter, so the cost is O(affected partitions),
  * never a full-store rewrite. A partition whose rows ALL vanish is
  * dropped outright (a dynamic overwrite with zero rows would silently
  * leave it behind — the stale-partition trap).
  *
  * Physical partition paths are never reconstructed from partition
  * VALUES (string concat would mis-encode values Spark path-escapes —
  * spaces, '%', ':' — and DateType-inferred ids whose toString differs
  * from the dir encoding): each affected partition's directory is read
  * off `input_file_name()` of its own matched rows, so the rename
  * targets are the paths that physically hold the data.
  *
  * Rewrites preserve the partition directory's MODIFICATION TIME
  * (`fs.setTimes` back to the pre-rewrite stamp): compaction retention
  * ([[graft.sources.Bucketing.newestIngestIds]]) orders ingests by
  * write time, and a forget that bumped an OLD partition to "now"
  * would make a later compaction retain it while folding a genuinely
  * recent ingest — whose retry would then double-append.
  *
  * What forget deliberately does NOT touch: the CONTENT-keyed
  * exact-dedup stores (`_norm`/`_bands` tables, the maintain key dir)
  * hold fingerprints of content, not documents — they carry no doc
  * attribution to delete by, and keeping them means re-posts of the
  * forgotten content are still suppressed, which is what a deletion
  * request wants (the content must not come back via another upload).
  * A deployment that must ALSO forget the fingerprints needs
  * refcounted keys — the `{name}_normrc` family
  * ([[graft.operators.Dedup.saveRcFingerprints]]): [[forgetFingerprints]]
  * lands a negative ledger row per affected key (decrement), and
  * [[graft.operators.Dedup.compactRcFingerprints]] physically erases
  * keys whose refcount reached zero. CLI: `--mode forget --ids ...
  * --fingerprints <rcName>`.
  *
  * Idempotent: a second run with the same ids finds no affected
  * partitions and rewrites nothing. Ids are a driver-side Seq — a
  * deletion-request batch is small by nature; a bulk purge (a whole
  * source or time range) rides the compaction cadence instead
  * ([[purgeDir]] / [[graft.sources.Bucketing.compactIngests]] with a
  * purge anti-join — one fold pass, no per-id partition hunt).
  */
object Forget {

  /** Staging layout for the durable partition rewrite: a swap dir
    * OUTSIDE the landing root (`_<landing>__forget`, an underscore-
    * prefixed SIBLING — the runCompact discipline), mirroring the
    * partition tree, with `__forgetting` (the complete post-delete
    * copy) and `__forgotten` (the pre-delete backup) leaf suffixes.
    * Nothing under the landing root itself — a staged copy INSIDE the
    * tree is not ignorable: any `k=v`-shaped dir name is parsed as a
    * partition column (an underscore prefix does not exempt it), so a
    * crash mid-swap would make forgotten docs readable under a mangled
    * column and duplicate the kept rows. Outside the root, a crash
    * leaves the store at worst MISSING one partition, never wrong, and
    * [[recoverSwaps]] finishes the swap on the next run. */
  private def stagingRoot(base: Path) =
    new Path(base.getParent, "_" + base.getName + "__forget")
  private def relOf(base: Path, partPath: Path): String = {
    // both sides fully qualified by the callers; a silent mismatch
    // would resolve the staging dir back inside the landing tree
    require(partPath.toString.startsWith(base.toString + "/"),
      s"partition $partPath is not under store root $base")
    partPath.toString.stripPrefix(base.toString).stripPrefix("/")
  }
  private def sideOf(base: Path, partPath: Path) =
    new Path(stagingRoot(base), relOf(base, partPath) + "__forgetting")
  private def oldOf(base: Path, partPath: Path) =
    new Path(stagingRoot(base), relOf(base, partPath) + "__forgotten")
  private def liveOf(base: Path, staged: Path, suffix: String) = {
    val root = stagingRoot(base).toString
    new Path(base,
      staged.toString.stripPrefix(root).stripPrefix("/").stripSuffix(suffix))
  }

  /** Crash recovery for [[forgetFromDir]]'s partition swap, run as a
    * preamble on every call: a leftover `<part>__forgetting` whose
    * live partition is MISSING means the crash hit between the two
    * renames — the side copy is the complete post-delete partition, so
    * renaming it in FINISHES the forget. A `__forgetting` with the
    * live dir present is a crash mid-write (live untouched — drop the
    * stage); a `__forgotten` with the live dir present is the backup
    * of a completed swap (drop); a `__forgotten` without live or side
    * is restored (the forget retries). Returns swaps finished. */
  private[graft] def recoverSwaps(fs: FileSystem, base: Path): Int = {
    val root = stagingRoot(base)
    if (!fs.exists(root)) return 0
    // recursive walk, NOT a fixed-depth glob: the staging tree mirrors
    // the store's partition layout, and a store partitioned by more
    // columns than a hard-coded glob depth would silently leave its
    // crashed swaps unfinished forever. A staged leaf (a suffixed dir)
    // is a plain partition copy — never descended into.
    def stagedLeaves(p: Path): Seq[Path] =
      Option(fs.listStatus(p)).getOrElse(Array.empty).toSeq
        .filter(_.isDirectory).map(_.getPath)
        .flatMap { d =>
          val n = d.getName
          if (n.endsWith("__forgetting") || n.endsWith("__forgotten")) Seq(d)
          else stagedLeaves(d)
        }
    def staged(suffix: String): Seq[Path] =
      stagedLeaves(root).filter(_.getName.endsWith(suffix))
    var finished = 0
    staged("__forgetting").foreach { side =>
      val live = liveOf(base, side, "__forgetting")
      if (!fs.exists(live)) {
        fs.mkdirs(live.getParent)
        require(fs.rename(side, live), s"swap recovery: rename $side -> $live failed")
        finished += 1
      } else fs.delete(side, true) // crash mid-write: live copy intact
      fs.delete(oldOf(base, live), true) // its backup, if any
      ()
    }
    staged("__forgotten").foreach { old =>
      val live = liveOf(base, old, "__forgotten")
      if (fs.exists(live)) { fs.delete(old, true); () }
      else {
        // no live dir and no side copy: the backup IS the data —
        // restore it; the forget will be retried
        fs.mkdirs(live.getParent)
        require(fs.rename(old, live), s"swap recovery: restore $old -> $live failed")
        finished += 1
      }
    }
    // every leftover handled — anything remaining is empty tree
    if (staged("__forgetting").isEmpty && staged("__forgotten").isEmpty) {
      fs.delete(root, true)
      ()
    }
    finished
  }

  /** Delete `ids` rows from an ingest-partitioned parquet DIRECTORY
    * store (the dedup corpus landing, layout e.g. (lang, ingest_id)).
    * Each affected partition is rewritten durably: the kept rows are
    * fully written to a discovery-invisible side directory first, then
    * swapped in by rename (live renamed aside, side renamed in, backup
    * deleted — a full copy exists on disk at every instant, and
    * neither staging name is readable as a partition). A crash leaves
    * at most one partition temporarily absent, never mangled;
    * [[recoverSwaps]] (run on every call) finishes the swap. Returns
    * the number of rows deleted. */
  def forgetFromDir(spark: SparkSession, dir: String, idCol: String,
                    ids: Seq[Long], partitionCols: Seq[String]): Long = {
    require(ids.nonEmpty, "forget needs at least one id")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fully qualified: partition paths come off input_file_name (always
    // schemed), and relativizing them against an unschemed base would
    // silently resolve the staging dirs back INSIDE the landing tree
    val base = fs.makeQualified(new Path(dir))
    recoverSwaps(fs, base)
    val df = spark.read.parquet(dir)
    // one projection pass finds the affected partitions — VALUES for
    // the pruned re-read, physical DIR off the rows' own file names
    val affected = df.filter(col(idCol).isin(ids: _*))
      // non-deterministic exprs can't sit inside an aggregate: project
      // the file name first, aggregate the projected column
      .select(partitionCols.map(col) :+ input_file_name().as("__file"): _*)
      .groupBy(partitionCols.map(col): _*)
      .agg(first(col("__file")).as("__file"))
      .collect()
    var deleted = 0L
    affected.foreach { row =>
      // null-safe equality: a NULL partition value (Hive default
      // partition) under plain === would match NO rows, making keptN 0
      // and wrongly deleting the whole partition directory
      val pred = partitionCols.zipWithIndex
        .map { case (c, i) => col(c) <=> lit(row.get(i)) }.reduce(_ && _)
      val partPath = fs.makeQualified(new Path(
        new java.net.URI(row.getString(row.length - 1))).getParent)
      val mtime = fs.getFileStatus(partPath).getModificationTime
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
        val side = sideOf(base, partPath)
        val old = oldOf(base, partPath)
        fs.delete(side, true)
        kept.write.mode(SaveMode.Overwrite).parquet(side.toString)
        fs.delete(old, true)
        fs.mkdirs(old.getParent)
        require(fs.rename(partPath, old), s"rename $partPath -> $old failed")
        require(fs.rename(side, partPath), s"rename $side -> $partPath failed")
        fs.delete(old, true)
        // restore the pre-rewrite write-time: compaction retention
        // keys on it, and a deletion request must not make an old
        // ingest look freshly landed
        fs.setTimes(partPath, mtime, -1)
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
    * bounded by one ingest partition). Partition mtimes are restored
    * after the rewrite (compaction retention reads them). Returns rows
    * deleted. */
  def forgetFromTable(spark: SparkSession, table: String, keys: Seq[String],
                      idCol: String, ids: Seq[Long]): Long = {
    require(ids.nonEmpty, "forget needs at least one id")
    import spark.implicits._
    val df = spark.table(table)
    // id cast only in the driver-side listing — the per-partition
    // filters below compare the untouched partition column so the
    // scans still prune (managed-table partition columns are string
    // by schema; the cast is belt-and-braces)
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
        graft.sources.Bucketing.preservingMtime(spark, table, ing) {
          graft.sources.Bucketing.writeBucketedIngest(spark, kept, table,
            keys, buckets, ingestId = ing)
        }
    }
    spark.catalog.refreshTable(table)
    deleted
  }

  /** Delete `ids` from a maintained near-dup CLUSTER assignment table
    * (`(doc_id, cluster_id)` rows, ingest-partitioned and bucketed on
    * `doc_id` — [[graft.operators.Dedup.saveClusterAssignments]]), the
    * one doc-keyed derived store a plain row filter cannot serve,
    * because cluster LABELS are member ids and cluster membership has
    * a ≥2 contract:
    *   - the forgotten docs' own rows vanish;
    *   - a cluster whose LABEL was a forgotten doc is relabeled to the
    *     smallest surviving member (the connected-components min-id
    *     convention, so downstream equality with a from-scratch rebuild
    *     holds) — the doc a cluster "anchored" never survives as its
    *     name, and d14's canonical re-selection sees a coherent table;
    *   - a cluster left with fewer than TWO members dissolves (the
    *     table only ever holds docs with at least one near-dup edge —
    *     d17's membership contract), so the lone survivor's row is
    *     deleted too.
    *
    * CONTRACT — connectivity is NOT re-derived: if the forgotten doc
    * was the only BRIDGE between two sub-groups, the survivors stay in
    * one cluster. That is the conservative direction for every
    * consumer (dedup keeps one canonical where a rebuild might keep
    * two; decontamination holds near-twins in the same split), and the
    * exact split would need the edge set, i.e. re-clustering the
    * touched components from the ND key tables — schedule a cluster
    * rebuild at the compaction cadence when drift from accumulated
    * deletions matters.
    *
    * Cost: one full-store id projection to find touched clusters (the
    * forgetFromTable discipline — unavoidable without an id→partition
    * index, fine at deletion-request cadence), then partition-targeted
    * rewrites of only the partitions holding touched-cluster members.
    * Returns rows deleted (forgotten rows + dissolved-cluster
    * survivors). */
  /** BULK purge of a doc-keyed bucketed table at the COMPACTION
    * cadence — the path for whole-source / time-range deletions, where
    * the per-id [[forgetFromTable]] (driver-side id list, partition
    * hunt) is the wrong tool: `purgeIds` is a DATAFRAME of doc ids,
    * and the deletion rides [[graft.sources.Bucketing.compactIngests]]
    * as an anti-join inside the fold — the store is rewritten exactly
    * once (the rewrite compaction was going to do anyway), bucket/sort
    * spec preserved, write-time retention honored (`keepLast` ingests
    * stay replayable — NOTE a replayed kept ingest re-lands its purged
    * rows; purge after the retry horizon, or re-run the purge). */
  def purgeTable(spark: SparkSession, table: String, keys: Seq[String],
                 idCol: String, purgeIds: DataFrame, keepLast: Int = 1): Unit =
    graft.sources.Bucketing.compactIngests(spark, table, keys,
      graft.sources.Bucketing.bucketsOf(spark, table), keepLast,
      transform = df => df.join(
        purgeIds.select(col(purgeIds.columns.head).as(idCol)),
        Seq(idCol), "left_anti").select(df.columns.map(col): _*))

  /** [[purgeTable]] for the cluster-assignment member, which an
    * anti-join alone cannot serve (labels are member ids, membership
    * is ≥2 by contract): inside the fold, purged rows drop, every
    * cluster relabels to its min surviving member (a no-op for
    * untouched clusters — the label already IS the min member), and
    * clusters left under two members dissolve. Same bridge caveat as
    * [[forgetFromClusters]]: connectivity is not re-derived. */
  def purgeClusters(spark: SparkSession, table: String,
                    purgeIds: DataFrame, keepLast: Int = 1): Unit = {
    // a pending relabel log must replay BEFORE the fold (recovery
    // strictly precedes any compaction — the recoverSwaps ordering)
    graft.sources.RelabelLog.recover(spark, table)
    graft.sources.Bucketing.compactIngests(spark, table, Seq("doc_id"),
      graft.sources.Bucketing.bucketsOf(spark, table), keepLast,
      transform = { df =>
        val kept = df.join(
          purgeIds.select(col(purgeIds.columns.head).as("doc_id")),
          Seq("doc_id"), "left_anti")
        val relabel = kept.groupBy("cluster_id")
          .agg(min(col("doc_id")).as("__new_cid"), count(lit(1)).as("__n"))
        kept.join(relabel, Seq("cluster_id"))
          .filter(col("__n") >= 2L)
          .withColumn("cluster_id", col("__new_cid"))
          .drop("__new_cid", "__n")
          .select(df.columns.map(col): _*)
      })
  }

  /** Deletion propagation for the LEXICAL index family
    * ([[graft.operators.TextAnalysis.saveLexicalIndex]]): the
    * forgotten docs' posting rows vanish from `{prefix}_post`
    * (partition-targeted, the [[forgetFromTable]] path), and the
    * affected ingests' `{prefix}_lexstats` contribution rows are
    * RECOMPUTED from the rewritten postings — corpus scalars must
    * shrink with the corpus or every later idf/length normalization
    * would quietly assume the forgotten docs still exist (a rebuild
    * over the reduced corpus is the contract, and the recompute
    * matches it exactly: every doc has ≥1 posting row, so per-ingest
    * n_docs/sum_dl are derivable from the postings alone). An ingest
    * whose docs ALL vanish loses both partitions. Returns posting
    * rows deleted. */
  def forgetFromLexicalIndex(spark: SparkSession, prefix: String,
                             ids: Seq[Long]): Long = {
    require(ids.nonEmpty, "forget needs at least one id")
    import spark.implicits._
    val post = s"${prefix}_post"
    val stats = s"${prefix}_lexstats"
    val affected = spark.table(post).filter(col("doc_id").isin(ids: _*))
      .select(col("ingest_id").cast("string")).distinct()
      .as[String].collect()
    val n = forgetFromTable(spark, post, Seq("term"), "doc_id", ids)
    refreshLexStats(spark, post, stats, affected)
    n
  }

  /** Recompute the per-ingest corpus-scalar contribution rows of a
    * lexical index's `_lexstats` member from its (already rewritten)
    * postings, for exactly `ingests`; an ingest with no postings left
    * loses its stats partition. Partition mtimes preserved. */
  private def refreshLexStats(spark: SparkSession, post: String,
                              stats: String, ingests: Seq[String]): Unit = {
    import spark.implicits._
    val buckets = graft.sources.Bucketing.bucketsOf(spark, stats)
    ingests.foreach { ing =>
      val fresh = spark.table(post).filter(col("ingest_id") === ing)
        .groupBy("doc_id").agg(first(col("dl")).as("dl"))
        .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L)))
        .as[(Long, Long)].collect().head
      if (fresh._1 == 0L)
        spark.sql(s"ALTER TABLE $stats DROP IF EXISTS " +
          s"PARTITION (ingest_id='$ing')")
      else
        graft.sources.Bucketing.preservingMtime(spark, stats, ing) {
          graft.sources.Bucketing.writeBucketedIngest(spark,
            Seq(fresh).toDF("n_docs", "sum_dl"), stats, Seq("n_docs"),
            buckets, ingestId = ing)
        }
    }
    spark.catalog.refreshTable(stats)
  }

  /** [[purgeTable]] for the lexical family: the posting fold plus the
    * stats recompute over every surviving ingest (bulk cadence — the
    * fold just rewrote the whole store, the stats re-derivation is a
    * narrow grouped scan of it). */
  def purgeLexicalIndex(spark: SparkSession, prefix: String,
                        purgeIds: DataFrame, keepLast: Int = 1): Unit = {
    import spark.implicits._
    val post = s"${prefix}_post"
    val stats = s"${prefix}_lexstats"
    val before = spark.table(stats)
      .select(col("ingest_id").cast("string")).distinct()
      .as[String].collect()
    purgeTable(spark, post, Seq("term"), "doc_id", purgeIds, keepLast)
    val after = spark.table(post)
      .select(col("ingest_id").cast("string")).distinct()
      .as[String].collect()
    // recompute survivors; stats partitions of folded/emptied ingests
    // (present before, absent from the folded postings) are dropped by
    // the zero-doc branch of the refresh
    refreshLexStats(spark, post, stats, (before ++ after).distinct.toSeq)
  }

  /** Deletion propagation for the REFCOUNTED content-fingerprint
    * family `{name}_normrc` ([[graft.operators.Dedup
    * .saveRcFingerprints]] — the strict-erasure exact-dedup variant):
    * land one NEGATIVE ledger row per distinct fingerprint of
    * `forgotten` (the to-be-forgotten docs, read from the landing
    * BEFORE the landing forget deletes them — call this FIRST; the
    * reverse order loses the texts and with them the decrement). The
    * ledger lands in its own `forget-<requestId>` ingest partition
    * under dynamic overwrite, so a retried request replaces its own
    * rows (replay-idempotent) — and a retry AFTER the landing delete
    * computes zero rows, which dynamic overwrite writes as nothing,
    * leaving the first run's ledger intact. A key whose ledger sum
    * reaches ≤ 0 immediately vanishes from
    * [[graft.operators.Dedup.liveFingerprints]] (re-posts admitted
    * again); [[graft.operators.Dedup.compactRcFingerprints]] erases it
    * from disk. When the family enforces commit markers, the ledger's
    * marker is committed here (single-member family — this IS the last
    * write). Returns distinct fingerprints decremented. */
  def forgetFingerprints(spark: SparkSession, name: String,
                         forgotten: DataFrame, textCol: String,
                         requestId: String): Long = {
    require(requestId.nonEmpty, "forgetFingerprints needs a requestId " +
      "(deterministic per request — the replay key)")
    val table = s"${name}_normrc"
    val dec = Dedup.rcCounts(forgotten, textCol)
      .withColumn("rc", -col("rc"))
      .localCheckpoint(false)
    val n = dec.count()
    if (n > 0L) {
      graft.sources.Bucketing.writeBucketedIngest(spark, dec, table,
        Seq("__norm_key"), graft.sources.Bucketing.bucketsOf(spark, table),
        ingestId = s"forget-$requestId")
      if (graft.sources.FamilyCommit.enabled(spark, name))
        graft.sources.FamilyCommit.commit(spark, name, s"forget-$requestId")
    }
    n
  }

  def forgetFromClusters(spark: SparkSession, table: String,
                         ids: Seq[Long]): Long = {
    require(ids.nonEmpty, "forget needs at least one id")
    import spark.implicits._
    // finish any prior crashed relabel/delete pass before deriving
    // touched clusters from current labels (the RelabelLog contract —
    // a half-applied prior edit set is invisible to the recompute)
    graft.sources.RelabelLog.recover(spark, table)
    val df = spark.table(table)
    // clusters that lose a member — bounded by |ids|
    val touched = df.filter(col("doc_id").isin(ids: _*))
      .select("cluster_id").distinct().as[Long].collect().toSeq
    if (touched.isEmpty) return 0L
    // surviving membership of the touched clusters → relabel map:
    // new label = min surviving member; n < 2 dissolves the cluster.
    // Bounded by the touched clusters' member count — broadcast.
    val relabel = df.filter(col("cluster_id").isin(touched: _*))
      .filter(!col("doc_id").isin(ids: _*))
      .groupBy("cluster_id")
      .agg(min(col("doc_id")).as("__new_cid"), count(lit(1)).as("__n"))
      .localCheckpoint(true)
    // the FULL edit set, one row per row that changes (the durable
    // unit RelabelLog replays if any partition rewrite crashes):
    //   - forgotten docs' own rows: delete (new_cid NULL);
    //   - survivors of a dissolving (<2-member) cluster: delete;
    //   - survivors whose cluster relabels: set the new min-member id
    //     (unchanged-label survivors need no rewrite and stay out).
    val forgottenRows = df.filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), lit(null).cast("long").as("new_cid"))
    val survivorEdits = df.filter(col("cluster_id").isin(touched: _*))
      .filter(!col("doc_id").isin(ids: _*))
      .join(broadcast(relabel), Seq("cluster_id"))
      .withColumn("new_cid",
        when(col("__n") >= 2L, col("__new_cid")).otherwise(lit(null).cast("long")))
      .filter(col("new_cid").isNull || col("new_cid") =!= col("cluster_id"))
      .select("doc_id", "new_cid")
    val edits = forgottenRows.unionByName(survivorEdits).localCheckpoint(true)
    val deleted = edits.filter(col("new_cid").isNull).count()
    graft.sources.RelabelLog.begin(spark, table, edits)
    graft.sources.RelabelLog.recover(spark, table)
    deleted
  }
}
