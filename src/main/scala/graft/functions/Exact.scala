package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic (decimal-backed) aggregates over double columns.
  *
  * A plain `sum(double)` is order-dependent: shuffle fetch order varies
  * run-to-run and engine-to-engine, so the last few bits of a 600k-row sum
  * differ between Spark and the DuckDB oracle (and even between Spark runs).
  * Casting each addend to an exact DECIMAL first makes the sum associative
  * and therefore bit-identical regardless of partitioning — the per-row
  * double expression itself is IEEE-deterministic on both engines.
  *
  * Cost at scale: decimal partial aggregation is still map-side combinable
  * and codegen'd; the overhead is per-row cast + 128-bit adds, which stays
  * in whole-stage codegen (no UDF boundary).
  */
object Exact {
  /** Exact decimal for small-magnitude sums (|value| ≲ 1e4, e.g.
    * embedding components, event values): 10 fractional digits. The
    * scaled integer (sum × 1e10) must stay < 2^53 — above that,
    * DuckDB's decimal→double cast (scaled-int128 → double → ÷10^s,
    * two roundings) diverges from Spark's single correctly-rounded
    * BigDecimal.toDouble. */
  val D: DecimalType = DecimalType(30, 10)

  /** Exact decimal for money/quantity columns (2dp data, big sums):
    * 4 fractional digits keeps sum × 1e4 < 2^53 up to ~1e12 totals. */
  val M: DecimalType = DecimalType(18, 4)

  /** Order-insensitive exact sum of a small-magnitude double expression. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Order-insensitive exact sum of a money-scale double expression. */
  def dsumM(c: Column): Column = sum(c.cast(M)).cast("double")

  /** Deterministic mean: exact sum divided by non-null count (double). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL fragment equivalents for the DuckDB oracle. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(30,10))) AS DOUBLE)"
  def dsumMSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,4))) AS DOUBLE)"
  def davgSql(expr: String): String =
    s"(${dsumSql(expr)} / COUNT($expr))"
}
