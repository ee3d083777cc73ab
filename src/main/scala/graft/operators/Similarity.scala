package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Exact, VectorOps}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a large-scale pipeline needs both:
  *  - brute-force cosine top-k: exact baseline. Queries are broadcast
  *    (small side), candidates stream through — one pass over the
  *    corpus, no shuffle of the big side, norms precomputed per row.
  *  - LSH-bucketed ANN (random hyperplanes): the 100 TB path. Each
  *    vector maps to L signature buckets; candidate generation is an
  *    equi-join on the bucket key (hash shuffle, no cross join), then
  *    exact cosine re-ranking within candidates.
  */
object Similarity {
  /** Brute-force cosine top-k of `queries` against `candidates`.
    * Both frames: (id, vec array<double>). Output: query_id, neighbor_id,
    * cos (rounded 6dp), rn. Ranking is on the ROUNDED similarity with id
    * tiebreak, so ordering is reproducible across engines. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      VectorOps.norm(col("vec")).as("qn"))
    val c = candidates.select(col("id").as("neighbor_id"), col("vec").as("cv"),
      VectorOps.norm(col("vec")).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", round(VectorOps.dot(col("qv"), col("cv")) /
        (col("qn") * col("cn")), 6))
    Relational.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("neighbor_id")), k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }

  /** Deterministic pseudo-random hyperplanes: planes(p)(d) in [-1,1). */
  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    var x = 0x853C49E6748FEA9BL
    def next(): Double = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Array.fill(nPlanes, dim)(next())
  }

  /** Sign-pattern signature for one hash table: a bit per hyperplane. */
  private def signature(vec: Column, table: Array[Array[Double]]): Column =
    table.zipWithIndex.map { case (plane, i) =>
      when(VectorOps.dot(vec, typedlit(plane.toSeq)) >= 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN via L random-hyperplane hash tables of `bitsPerTable` bits.
    * Vectors sharing a (table, signature) bucket with a query are scored
    * exactly; top-k per query returned. Recall grows with L; cost is
    * bounded by bucket sizes (no quadratic blowup on the full corpus). */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              dim: Int, tables: Int = 4, bitsPerTable: Int = 8): DataFrame = {
    val all = planes(tables * bitsPerTable, dim)
    def bucketed(df: DataFrame, idName: String): DataFrame = {
      val sigs = (0 until tables).map { t =>
        struct(lit(t).as("tbl"),
          signature(col("vec"), all.slice(t * bitsPerTable, (t + 1) * bitsPerTable)).as("sig"))
      }
      df.select(col("id").as(idName), col("vec"), VectorOps.norm(col("vec")).as(s"${idName}_n"),
        explode(array(sigs: _*)).as("bucket"))
    }
    val q = bucketed(queries, "query_id")
      .select(col("query_id"), col("vec").as("qv"), col("query_id_n").as("qn"), col("bucket"))
    val c = bucketed(candidates, "neighbor_id")
      .select(col("neighbor_id"), col("vec").as("cv"), col("neighbor_id_n").as("cn"), col("bucket"))
    val cand = q.join(c, "bucket")
      .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn").distinct()
    val scored = cand.withColumn("cos",
      round(VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    Relational.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("neighbor_id")), k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }

  /** Per-label centroid, one row per (label, dimension). Exact decimal
    * mean → identical across engines. posexplode keeps the dimension
    * index; the aggregation is a plain hash groupBy (map-side combined).
    */
  def labelCentroids(embeddings: DataFrame): DataFrame = {
    embeddings
      .select(col("label"), posexplode(col("embedding").cast("array<double>")))
      .toDF("label", "pos", "e")
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      .agg(round(Exact.davg(col("e")), 6).as("c"))
  }
}
