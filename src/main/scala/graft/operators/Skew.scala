package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the 100 TB failure mode a uniform
  * testdata run never shows (one symbol carrying half the trades turns
  * a groupBy/join into a single straggler task).
  *
  * Two standard remedies, as composable operators:
  *  - salted two-phase aggregation: shard each key across `salts`
  *    partial groups, aggregate, then merge partials. Works for any
  *    aggregate with an associative merge (sum/count/min/max).
  *  - salted broadcast-replicated join: replicate the small side once
  *    per salt so a salted big side still matches. (For two big sides,
  *    AQE's skew-join split — on by default in Spark 4 — is the tool.)
  */
object Skew {
  /** One aggregate spec: output name, input expression, and function
    * ("sum" | "count" | "min" | "max"). */
  case class Agg(name: String, expr: Column, fn: String)

  private def apply1(a: Agg): Column = (a.fn match {
    case "sum" => sum(a.expr)
    case "count" => count(a.expr)
    case "min" => min(a.expr)
    case "max" => max(a.expr)
  }).as(a.name)

  /** Merge of a phase-1 partial: count partials merge by SUM. */
  private def merge1(a: Agg): Column = (a.fn match {
    case "sum" | "count" => sum(col(a.name))
    case "min" => min(col(a.name))
    case "max" => max(col(a.name))
  }).as(a.name)

  /** Retry-deterministic salt: a hash of the row's payload columns.
    * `monotonically_increasing_id()`/`rand()` change when a failed task
    * re-runs (ids are partition-relative), so a row could move salt
    * mid-job; a content hash is a pure function of the row and assigns
    * the same salt on every attempt. Identical rows share a salt — for
    * aggregation that only means their partials merge in one shard,
    * which is exactly what a combiner does anyway. */
  private[graft] def contentSalt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salts))

  /** Two-phase salted aggregation. Phase 1 groups on (keys, salt),
    * spreading a hot key over `salts` reducers; phase 2 merges the
    * partials on the true keys (tiny: ≤ salts rows per key). */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                aggs: Seq[Agg]): DataFrame = {
    require(aggs.nonEmpty)
    val salted = df.withColumn("__salt", contentSalt(df, salts))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(apply1(aggs.head), aggs.tail.map(apply1): _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(merge1(aggs.head), aggs.tail.map(merge1): _*)
  }

  /** One-phase partial aggregation in the [[Agg]] vocabulary — the
    * mergeable STATE of an aggregate (what a materialized aggregate
    * table persists). Counts are stored as counts; [[mergeAggStates]]
    * re-merges them by SUM. */
  def partialAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Agg]): DataFrame = {
    require(aggs.nonEmpty)
    df.groupBy(keys.map(col): _*).agg(apply1(aggs.head), aggs.tail.map(apply1): _*)
  }

  /** Merge two aggregate STATES (same keys + agg columns): union, then
    * one associative re-merge. Keys present on only one side pass
    * through; the shuffle carries |stateA| + |stateB| rows — group
    * cardinality, never fact rows. */
  def mergeAggStates(a: DataFrame, b: DataFrame, keys: Seq[String],
                     aggs: Seq[Agg]): DataFrame = {
    require(aggs.nonEmpty)
    a.unionByName(b).groupBy(keys.map(col): _*)
      .agg(merge1(aggs.head), aggs.tail.map(merge1): _*)
  }

  /** Incremental aggregate maintenance: fold a RAW delta into a
    * persisted aggregate state without touching the base facts — the
    * materialized-view refresh pattern. At 100 TB the delta (one
    * day/hour of arrivals) aggregates and merges in minutes while the
    * full recompute rescans the fact table; all [[Agg]] kinds are
    * associative (count/sum/min/max), so the result is bit-identical
    * to the from-scratch GROUP BY. */
  def incrementalAgg(state: DataFrame, delta: DataFrame, keys: Seq[String],
                     aggs: Seq[Agg]): DataFrame =
    mergeAggStates(state, partialAgg(delta, keys, aggs), keys, aggs)

  /** Salted equi-join of a skewed big side against a small dim: the big
    * side gets a uniform salt in [0, salts); the small side is
    * replicated once per salt value and broadcast. A hot key's rows
    * spread over `salts` tasks instead of one straggler. */
  def saltedBroadcastJoin(big: DataFrame, small: DataFrame,
                          key: String, salts: Int): DataFrame = {
    val bigS = big.withColumn("__salt", contentSalt(big, salts))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(broadcast(smallS), Seq(key, "__salt")).drop("__salt")
  }
}
