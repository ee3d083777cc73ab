package graft.sources

import org.apache.spark.sql.SparkSession

/** Staleness guard for build-once / read-many derived catalog tables
  * (bucketed facts, cluster assignments, ANN indexes, partitioned
  * layouts). Each derived table records a fingerprint of its SOURCE
  * data in TBLPROPERTIES at build time; consumers rebuild when the
  * data on disk no longer matches — so regenerating testdata in place
  * under the same path (the round-6 failure mode) is detected instead
  * of silently serving stale derived state.
  */
object DerivedTables {
  private val Prop = "graft.fingerprint"

  /** Cheap content fingerprint of a source parquet path: recursive
    * (file count, total bytes, newest mtime). Not a data hash — an
    * identical-bytes rewrite with a newer mtime reads as changed,
    * which errs on the safe side (rebuild) at O(directory listing)
    * cost, never O(data). */
  def sourceFingerprint(dir: String, table: String): String = {
    def scan(f: java.io.File): (Long, Long, Long) =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .foldLeft((0L, 0L, 0L)) { case ((n, sz, mt), c) =>
            val (cn, csz, cmt) = scan(c)
            (n + cn, sz + csz, math.max(mt, cmt))
          }
      else (1L, f.length(), f.lastModified())
    val (n, sz, mt) = scan(new java.io.File(dir, s"$table.parquet"))
    s"n$n-sz$sz-mt$mt"
  }

  private def recorded(s: SparkSession, table: String): Option[String] =
    try {
      s.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .properties.get(Prop)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Table exists AND its recorded source fingerprint matches `fp`.
    * A table written before fingerprinting existed (no property)
    * counts as stale — rebuilt once, then stamped. */
  def fresh(s: SparkSession, table: String, fp: String): Boolean =
    s.catalog.tableExists(table) && recorded(s, table).contains(fp)

  def stamp(s: SparkSession, table: String, fp: String): Unit =
    s.sql(s"ALTER TABLE $table SET TBLPROPERTIES('$Prop'='$fp')")

  /** All of `tables` fresh against `fp`; otherwise run `build` (which
    * must create every table in the list) and stamp them all. */
  def ensure(s: SparkSession, tables: Seq[String], fp: String)
            (build: => Unit): Unit =
    if (!tables.forall(fresh(s, _, fp))) {
      build
      tables.foreach(stamp(s, _, fp))
    }
}
