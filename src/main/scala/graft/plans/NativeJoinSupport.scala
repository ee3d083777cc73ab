package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Shared scaffolding for the native whole-operator joins
  * (AsOfJoinExec, IntervalJoinExec): strategy injection, attribute
  * resolution, and the key-type compatibility check both logical
  * nodes must run — kept in one place so a guard added for one exec
  * cannot be forgotten in the other. */
object NativeJoinSupport {
  /** Idempotently register a planning strategy on the session. */
  def ensureStrategy(spark: SparkSession, strategy: SparkStrategy): Unit =
    if (!spark.experimental.extraStrategies.contains(strategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ strategy

  /** Resolve an output attribute by name, failing loudly — these plans
    * are built from freshly-aliased projections, so names are unique. */
  def attr(plan: LogicalPlan, name: String): Attribute =
    plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not found"))

  /** Both execs hash-partition each side by its own key types and
    * compare keys with an ordering built from the LEFT types; a
    * type-mismatched key pair (INT vs BIGINT, STRING vs INT) would
    * partition the sides differently and read the wrong slot width —
    * silently joining nothing. No analyzer coercion runs on these
    * nodes (there is no Join condition), so enforce it here. */
  def requireMatchingKeyTypes(op: String, leftKeys: Seq[Attribute],
                              rightKeys: Seq[Attribute]): Unit = {
    require(leftKeys.size == rightKeys.size,
      s"$op: ${leftKeys.size} left vs ${rightKeys.size} right key columns")
    for ((l, r) <- leftKeys.zip(rightKeys))
      require(org.apache.spark.sql.types.DataType.equalsStructurally(
          l.dataType, r.dataType, ignoreNullability = true),
        s"$op key types must match: '${l.name}' is " +
          s"${l.dataType.simpleString} but '${r.name}' is " +
          s"${r.dataType.simpleString} — cast one side explicitly first")
  }
}
