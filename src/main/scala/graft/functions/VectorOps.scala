package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` / `array<double>` columns,
  * built from codegen'd higher-order functions (`zip_with` / `aggregate`)
  * — no UDFs, so the whole similarity pipeline stays inside whole-stage
  * codegen and distributes trivially.
  *
  * `aggregate` folds strictly left-to-right, so per-row results are
  * IEEE-deterministic (same value on every executor, every run).
  */
object VectorOps {
  /** Widen array<float> → array<double> (exact). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Native-expression dot / norm (graft.plans.VectorExprs): the
    * higher-order-function forms are interpreted per element, which is
    * the hot loop inside pairwise similarity joins. Accumulation order
    * (left-to-right) is identical, so values are bit-equal. */
  def dot(a: Column, b: Column): Column = graft.plans.VectorExprs.dot(a, b)

  def normSq(a: Column): Column = graft.plans.VectorExprs.normSq(a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; callers should precompute norms per side before a
    * join so each vector's norm is evaluated once, not once per pair. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Elementwise L2-normalized copy of the vector: a native one-pass
    * expression (norm accumulated once, one divide per element). The
    * previous HOF form re-evaluated the norm inside the `transform`
    * lambda — O(d²) per row. Zero vectors pass through unchanged. */
  def l2normalize(a: Column): Column = graft.plans.VectorExprs.l2normalize(a)
}
