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
    // pre-shuffle onto the bucket key (same hash family as the bucket
    // assignment): without it every input partition writes a file per
    // bucket — partitions × buckets small files per write instead of
    // ~buckets (the writeBucketedIngest lesson, measured 32x)
    df.repartition(buckets, keys.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(mode)
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

  /** The replay-safe per-ingest write for an incrementally-maintained
    * bucketed table: rows are stamped with `ingestId` and the table is
    * PARTITIONED on that stamp (directory partition) while staying
    * bucketed (and sorted) on the join `keys`, so
    *   - a RETRIED ingest replaces exactly its own `ingest_id=...`
    *     partition via dynamic partition overwrite instead of
    *     double-appending (write-twice ≡ write-once — the
    *     at-least-once retry a daily pipeline WILL eventually hit),
    *   - reads stay exchange-free on the bucket keys (bucket layout is
    *     per (partition, bucket); Catalyst still reports the hash
    *     partitioning, verified by plan-shape spec),
    *   - compaction ([[compactIngests]]) can fold finalized ingest
    *     partitions without touching live ones.
    * `overwrite = true` is the bootstrap: (re)create the table from
    * scratch. `overwrite = false` requires the table to exist (the
    * bootstrap is a separate, explicit act — an append into nothing is
    * a pipeline wiring bug, not a table to silently invent). */
  def writeBucketedIngest(spark: SparkSession, df: DataFrame, table: String,
                          keys: Seq[String], buckets: Int, ingestId: String,
                          overwrite: Boolean = false): Unit = {
    require(ingestId.nonEmpty, "ingestId must be non-empty")
    import org.apache.spark.sql.functions.{col, lit}
    // pre-shuffle onto the bucket key with the bucket count: without
    // this, EVERY input partition writes its own file into every
    // bucket (partitions × buckets small files per ingest — measured
    // 3,071 files after 12 ingests at 32 partitions; with it, ~buckets
    // per ingest). One O(batch) exchange, the same hash family the
    // bucket assignment uses, paid once per maintenance write.
    require(overwrite || spark.catalog.tableExists(table),
      s"append into missing table '$table' — an append into nothing is a " +
        "pipeline wiring bug (typo'd name?); bootstrap with overwrite = true")
    val stamped = df.repartition(buckets, keys.map(col): _*)
      .withColumn("ingest_id", lit(ingestId))
    if (overwrite) {
      stamped.write.mode(SaveMode.Overwrite)
        .partitionBy("ingest_id")
        .bucketBy(buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .format("parquet").saveAsTable(table)
    } else {
      // insertInto is positional: emit exactly the catalog's column
      // order (data columns, then the ingest_id partition column last)
      val cols = spark.table(table).columns
        .map(org.apache.spark.sql.functions.col)
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try stamped.select(cols.toIndexedSeq: _*)
        .write.mode(SaveMode.Overwrite).insertInto(table)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Cross-table ingest-consistency audit for a maintenance FAMILY —
    * the monitoring face of the replay discipline: a family's writer
    * lands one ingest into SEVERAL tables sequentially (near-dup keys:
    * `_ndband` then `_ndsh`; exact keys: `_norm` then `_bands`), and a
    * crash BETWEEN the writes leaves the ingest half-present. The
    * retry heals it (every write is idempotent), but if the retry
    * never comes the family is silently inconsistent — candidate
    * generation sees docs the verify join can't resolve. This audit
    * surfaces exactly that: one row per ingest_id with each member's
    * row count, `consistent` = the ingest exists in EVERY member.
    * Members are catalog tables, or `parquet:/dir` for the path-based
    * stores (the maintain key dir, the corpus_docs landing). Cost: one
    * metadata-light count per member, grouped on the partition column
    * — partition pruning does the work. Run it on the maintenance
    * cadence, after the day's appends; an inconsistent row means
    * "re-run maintain for that ingest id" (idempotence makes that
    * safe). */
  def auditIngests(spark: SparkSession, members: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, first, lit}
    require(members.size >= 2, "auditing a family needs >= 2 member stores")
    // ingest_id normalized to string: partition type inference reads
    // an all-date id set back as DateType, which would break the
    // cross-member pivot and the callers' string handling
    def readMember(m: String): DataFrame =
      (if (m.startsWith("parquet:")) spark.read.parquet(m.stripPrefix("parquet:"))
       else spark.table(m))
        .withColumn("ingest_id", col("ingest_id").cast("string"))
    val counts = members.map { m =>
      readMember(m).groupBy(col("ingest_id"))
        .agg(count(lit(1)).as("rows"))
        .withColumn("member", lit(m))
    }.reduce(_ unionByName _)
    val pivoted = counts.groupBy(col("ingest_id"))
      .pivot("member", members)
      .agg(first(col("rows")))
    pivoted.withColumn("consistent",
      members.map(m => col(s"`$m`").isNotNull).reduce(_ && _))
  }

  /** The newest `keepLast` ingest ids of a partitioned store — the set
    * compaction must NOT fold. "Newest" is the partition directory's
    * modification time, NOT the id's lexical order: the recommended id
    * schemes (dates, zero-padded batch numbers) happen to sort by
    * time, but hash-derived ids (`in_<md5>`) don't sort at all, and
    * the bootstrap's `base` sorts AFTER date ids (`'2' < 'b'`) — a
    * lexical take-right with date ids would keep `{base}` and fold the
    * NEWEST ingest, voiding its replayability. Write time is the
    * signal that actually means "inside the retry horizon" (a
    * just-replayed partition is recent by definition), and it is
    * id-scheme-independent. `base` — the fold TARGET — is always
    * excluded from retention. Lexical id is the deterministic tiebreak
    * for same-timestamp writes; a partition whose directory can't be
    * statted sorts oldest. `globDepth` = how many partition levels sit
    * ABOVE ingest_id in the layout (0 for `ingest_id=...` at the root,
    * 1 for `lang=.../ingest_id=...`). */
  private[graft] def newestIngestIds(spark: SparkSession, baseDir: String,
                                     ids: Seq[String], keepLast: Int,
                                     globDepth: Int = 0): Set[String] = {
    import org.apache.hadoop.fs.Path
    val base = new Path(baseDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ids.filterNot(_ == "base").map { id =>
      val pat = new Path(base, ("*/" * globDepth) + s"ingest_id=$id")
      val mtime = try {
        val hits = Option(fs.globStatus(pat)).getOrElse(Array.empty)
        if (hits.isEmpty) 0L else hits.map(_.getModificationTime).max
      } catch { case _: java.io.IOException => 0L }
      (mtime, id)
    }.sorted.takeRight(keepLast).map(_._2).toSet
  }

  /** Compaction for an ingest-partitioned bucketed table (the
    * operational tax of [[writeBucketedIngest]]: each daily ingest
    * leaves its own partition directory of ≤`buckets` files, so a year
    * of ingests is 365×buckets small files). Folds every ingest
    * partition EXCEPT the most-recently-written `keepLast` ids
    * ([[newestIngestIds]] — write time, so hash-style ids and the
    * `base` bootstrap partition can't confuse retention) into the
    * single `base` partition, rewriting with the identical bucket/sort
    * spec — results and exchange-free plans are unchanged (spec-locked).
    * Kept partitions preserve replayability: a retry of a still-kept
    * ingest id remains idempotent; a retry of a FOLDED id would
    * re-append, so compact only ingests past the pipeline's retry
    * horizon (that is what `keepLast` is for).
    *
    * Durability: the compacted copy is fully written to a side table
    * first, then swapped in by catalog rename — the live table is
    * renamed ASIDE (`<table>__old`), the side table renamed onto the
    * production name, and only then is the old copy dropped, so a full
    * copy of the data exists under SOME name at every instant. If a
    * crash lands between the two renames, recover with
    * `ALTER TABLE <table>__old RENAME TO <table>` (or finish the swap:
    * rename `__compacting` in) — both copies hold identical rows. */
  def compactIngests(spark: SparkSession, table: String, keys: Seq[String],
                     buckets: Int, keepLast: Int = 1,
                     transform: DataFrame => DataFrame = identity): Unit = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val ids = spark.table(table).select("ingest_id").distinct()
      .collect().map(_.getString(0)).toSeq
    val kept = newestIngestIds(spark, tableLocation(spark, table), ids, keepLast)
    val keptCond = kept.foldLeft(lit(false))((c, id) => c || col("ingest_id") === id)
    // `transform` is the bulk-purge hook ([[graft.operators.Forget]]):
    // the fold already rewrites every row once, so an anti-join or
    // relabel riding it costs no extra pass — and because the WHOLE
    // store lands in the side table, a partition emptied by the purge
    // simply never materializes (no stale-partition trap)
    val remapped = transform(spark.table(table)
      .withColumn("ingest_id", when(keptCond, col("ingest_id")).otherwise(lit("base"))))
    val side = s"${table}__compacting"
    val old = s"${table}__old"
    // pinned graft.* TBLPROPERTIES (e.g. the cluster family's
    // graft.sim_threshold drift detector) must survive the swap: the
    // side table is a fresh CREATE, so without this copy any pin
    // silently disarms at the first compaction — exactly the drift
    // window the pin exists to close. Captured BEFORE the side write
    // (the property read must not race the renames below).
    val pinned = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(_._1.startsWith("graft."))
    spark.sql(s"DROP TABLE IF EXISTS $side")
    remapped.write.mode(SaveMode.Overwrite)
      .partitionBy("ingest_id")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(side)
    pinned.foreach { case (k, v) =>
      // SQL-escape: the copy claims to preserve ALL graft.* pins, and
      // an unescaped quote in a value would abort the compaction after
      // the side write, stranding a __compacting table
      val (ek, ev) = (k.replace("'", "''"), v.replace("'", "''"))
      spark.sql(s"ALTER TABLE $side SET TBLPROPERTIES ('$ek' = '$ev')")
    }
    spark.sql(s"DROP TABLE IF EXISTS $old")
    spark.sql(s"ALTER TABLE $table RENAME TO $old")
    // re-point the renamed-aside table's PARTITION locations at its
    // moved directory BEFORE the side table takes the production path:
    // rename moves the dir but partition metadata keeps the old
    // location (the MSCK gotcha below), and dropping a table whose
    // stale partition locations point into the live data would, under
    // a Hive-backed catalog, delete the data we just swapped in
    spark.sql(s"MSCK REPAIR TABLE $old SYNC PARTITIONS")
    spark.sql(s"ALTER TABLE $side RENAME TO $table")
    spark.sql(s"DROP TABLE $old")
    // the rename moves the managed dir but catalog-provided PARTITION
    // locations still point at the side path — re-sync them from disk,
    // then drop the cached file index
    spark.sql(s"MSCK REPAIR TABLE $table SYNC PARTITIONS")
    spark.catalog.refreshTable(table)
  }

  /** Compaction for an ingest-partitioned parquet DIRECTORY store (the
    * maintain key dir, the dedup corpus landing — any layout whose
    * partition columns include `ingest_id`): every ingest partition
    * except the most-recently-WRITTEN `keepLast` ids folds into
    * `ingest_id=base`, other partition columns preserved. Durable
    * swap: the compacted copy is fully written to a side dir, the live
    * dir renamed aside, the side renamed in, the old copy deleted last
    * — a full on-disk copy exists at every instant; a crash between
    * the renames leaves both `__old` and `__compacting` complete
    * (rename either back). `transform` is the bulk-purge hook (see
    * [[compactIngests]]). Returns (ingests before, partitions kept
    * incl. base). */
  def compactDir(spark: SparkSession, dir: String, partitionBy: Seq[String],
                 keepLast: Int,
                 transform: DataFrame => DataFrame = identity): (Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit, when}
    // pending forget swaps recover BEFORE the fold reads anything:
    // unrecovered, a `__forgetting` whose live partition is missing
    // would be silently compacted away (the finished forget lost), and
    // a leftover `__forgotten` backup restored AFTER the fold would
    // resurrect right-to-be-forgotten rows AND duplicate the kept rows
    // already folded into base — recovery strictly precedes any fold
    {
      val p = new org.apache.hadoop.fs.Path(dir)
      val rfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.operators.Forget.recoverSwaps(rfs, rfs.makeQualified(p))
    }
    // ingest_id is a STRING by contract: partition type inference
    // reads an all-date id set back as DateType, which would poison
    // the "base" remap below
    val df = spark.read.parquet(dir)
      .withColumn("ingest_id", col("ingest_id").cast("string"))
    val partCols = partitionBy.filter(df.columns.contains)
    require(partCols.contains("ingest_id"),
      s"compact folds ingest_id; --partition-by was ${partitionBy.mkString(",")}")
    val ids = df.select("ingest_id").distinct()
      .collect().map(_.getString(0)).toSeq
    // retention by partition WRITE TIME (newest keepLast, `base` never
    // counted) — the newestIngestIds discipline: lexical order would
    // keep `base` over date ids and keeps an arbitrary ingest under
    // hash-style ids
    val kept = newestIngestIds(spark, dir, ids, keepLast,
      globDepth = partCols.indexOf("ingest_id"))
    val keptCond = kept.foldLeft(lit(false))((c, id) => c || col("ingest_id") === id)
    val remapped = transform(df.withColumn("ingest_id",
      when(keptCond, col("ingest_id")).otherwise(lit("base"))))
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val side = base.suffix("__compacting")
    val old = base.suffix("__old")
    fs.delete(side, true)
    remapped.write.mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*).parquet(side.toString)
    fs.delete(old, true)
    require(fs.rename(base, old), s"rename $base -> $old failed")
    require(fs.rename(side, base), s"rename $side -> $base failed")
    fs.delete(old, true)
    (ids.length, kept.size + 1)
  }

  /** Run `body` (a partition REWRITE of `table`'s `ingest_id=ing`) and
    * restore the partition directory's pre-rewrite modification time:
    * compaction retention ([[newestIngestIds]]) keys on write time,
    * and a maintenance rewrite of an OLD partition (forget, repair, a
    * cluster-merge relabel) must not make that ingest look freshly
    * landed — it would be retained over a genuinely recent ingest,
    * folding the recent one inside its retry horizon (whose retry
    * would then double-append). The physical dir is derived with the
    * same escaping the writer used (managed-table partition columns
    * are string-typed by schema, so no inference drift). */
  private[graft] def preservingMtime[T](spark: SparkSession, table: String,
                                        ing: String)(body: => T): T = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val loc = new Path(tableLocation(spark, table))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = new Path(loc, "ingest_id=" + ExternalCatalogUtils.escapePathName(ing))
    val mtime =
      if (fs.exists(part)) Some(fs.getFileStatus(part).getModificationTime)
      else None
    val r = body
    mtime.foreach(t => if (fs.exists(part)) fs.setTimes(part, t, -1))
    r
  }

  /** The bucket count a managed table was created with (the catalog's
    * spec — any partition rewrite must preserve it exactly). */
  private[graft] def bucketsOf(spark: SparkSession, table: String): Int = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    spark.sql(s"DESCRIBE TABLE EXTENDED $table")
      .filter(col("col_name") === "Num Buckets")
      .select("data_type").as[String].head().trim.toInt
  }

  /** The storage directory of a catalog table (where its partition
    * directories live — the mtime source for retention ordering). */
  private[graft] def tableLocation(spark: SparkSession, table: String): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    spark.sql(s"DESCRIBE TABLE EXTENDED $table")
      .filter(col("col_name") === "Location")
      .select("data_type").as[String].head()
  }
}
