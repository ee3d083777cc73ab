package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling per-key metrics — the reference's W2-W4 + P6 pipeline
  * (/root/reference/spark/jobs/stock_stream.py:61-82): a 5-row sliding
  * frame per key ordered by event time, computing VWAP, sample-stddev
  * volatility, and a 3-sigma anomaly flag.
  *
  * Determinism notes:
  *  - the frame order includes a unique tiebreaker column so results are
  *    stable under any physical row order;
  *  - `stddev_samp` over a 1-row frame is NULL-ified explicitly (Spark
  *    and the oracle agree on NULL; FIXTURES.md A4);
  *  - outputs are rounded to 6 decimals BEFORE the anomaly comparison so
  *    the flag is computed on identical values in Spark and the oracle.
  *
  * Scale: one shuffle on the partition key; frames are recomputed per row
  * over ≤ `lookback` rows (bounded memory, no unbounded state). Key skew
  * (one hot symbol) is the main risk at 100 TB — mitigate by salting the
  * key and merging, or pre-aggregating to bars first (the reference's
  * design: metrics run over 1-minute bars, not raw trades, capping rows
  * per key per day at 1440).
  */
object Metrics {
  /** Reference default (stock_stream.py:17). NOTE: with the current row
    * INSIDE its own 5-row frame (the reference's frame spec,
    * rowsBetween(-4,0)), max achievable |price−vwap| / stddev is
    * √5 ≈ 2.236 — a 3.0σ flag can never fire at lookback 4. The
    * reference would never alert; we keep 3.0 as the parity default and
    * let callers pass a reachable threshold. */
  val AnomalyThreshold = 3.0

  def rolling(key: Column, order: Seq[Column], price: Column,
              volume: Column, lookback: Int = 4): RollingCols = {
    val w = Window.partitionBy(key).orderBy(order: _*).rowsBetween(-lookback, 0)
    // Frame sums go through exact decimal: Spark recomputes sliding
    // frames front-to-back while other engines use segment trees, so
    // raw double frame-sums can differ in the last ulp and flip the
    // 6dp rounding. Decimal sums are order-insensitive → identical.
    // No rounding on the quotient: with exact-decimal frame sums both
    // engines divide identical doubles, so the raw quotient is already
    // bit-identical (a round() would re-introduce divergence via
    // DuckDB's double-rounding round()).
    val num = sum((price * volume).cast(graft.functions.Exact.M)).over(w).cast("double")
    val den = sum(volume.cast(graft.functions.Exact.M)).over(w).cast("double")
    val vwap = num / den
    val vol = when(count(price).over(w) > 1, round(stddev_samp(price).over(w), 6))
    RollingCols(vwap, vol)
  }

  case class RollingCols(vwap: Column, vol: Column) {
    /** k-sigma anomaly predicate on the rolling metrics. NULL
      * volatility (frame of 1) yields NULL → filtered out, matching the
      * reference's filter semantics (stock_stream.py:105). */
    def isAnomaly(price: Column,
                  threshold: Double = Metrics.AnomalyThreshold): Column =
      abs(price - vwap) > lit(threshold) * vol
  }
}
