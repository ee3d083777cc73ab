package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-engine output-surface lint.
  *
  * The driver's correctness gate hash-compares Spark's parquet dump
  * against DuckDB's result, so a column whose TYPE differs between the
  * engines fails even when every value is numerically equal. The
  * round-4 q31/q32 regression was exactly this class: Spark coerced
  * `BIGINT / 10000.0` to decimal(28,7) where DuckDB typed it DOUBLE.
  *
  * The rule this spec enforces: every registered query's output stays
  * on the engine-neutral surface — long/double/string/boolean/
  * date/timestamp/binary and arrays/structs/maps thereof. DecimalType
  * and FloatType are banned because the two engines' literal-coercion
  * and representation rules differ there (decimal precision/scale
  * inference, float32 formatting). A query that deliberately needs one
  * must be whitelisted here with a comment.
  *
  * Schema derivation is analysis-only (no jobs run), so this lints the
  * full 100+-query surface in seconds.
  */
class SchemaLintSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  /** query name -> column names allowed to be decimal/float. */
  private val whitelist: Map[String, Set[String]] = Map.empty

  private def banned(dt: DataType): Boolean = dt match {
    case _: DecimalType | FloatType => true
    case s: StructType              => s.fields.exists(f => banned(f.dataType))
    case a: ArrayType               => banned(a.elementType)
    case m: MapType                 => banned(m.keyType) || banned(m.valueType)
    case _                          => false
  }

  test("every registered query carries an oracle; names align exactly") {
    // A queries() entry without an oracleSql twin silently downgrades
    // the driver's gate to a rows-only check; an oracle without a
    // query is dead text. Either asymmetry is a registration bug.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracles: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
    assert(q.nonEmpty && q.forall(_.matches("[a-z][a-z0-9_]+")),
      "query names must be stable snake_case identifiers")
  }

  test("no registered query emits DecimalType/FloatType output columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val allowed = whitelist.getOrElse(name, Set.empty)
        fn(spark, dir).schema.fields.collect {
          case f if banned(f.dataType) && !allowed(f.name) =>
            s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(offenders.isEmpty,
      s"\nengine-divergent output types (decimal/float) — emit double/long " +
        s"instead, or whitelist deliberately:\n  ${offenders.mkString("\n  ")}")
  }

  // ---- dsumL envelope guard (same contract, data side) ----
  // Tiers (see Exact.dsumL scaladoc): |S|<2^53 exact, [2^53,2^62) engine
  // parity (≤1 ulp from true value but bit-identical to DuckDB), ≥2^62
  // guarded (within 2x of long wrap).

  test("dsumL inside the envelope matches the exact sum and stays double") {
    import spark.implicits._
    val df = Seq(1.25, 2.50, -0.75, 1000000.01).toDF("v")
    val out = df.agg(graft.functions.Exact.dsumL($"v").as("s"))
    assert(out.schema("s").dataType == DoubleType)
    assert(out.head.getDouble(0) == 1000003.01)
  }

  test("dsumL over an all-null / empty group returns null, not an error") {
    import spark.implicits._
    val df = Seq[Option[Double]](None, None).toDF("v")
    val out = df.agg(graft.functions.Exact.dsumL($"v").as("s")).head
    assert(out.isNullAt(0))
  }

  test("dsumL parity tier (2^53..2^62) computes, no guard trip") {
    import spark.implicits._
    // 4 rows × 9e11: per-row scaled value 9e15 is an exact double below
    // 2^53, so round(v*1e4) is exactly 9e15; S = 3.6e16 ≈ 2^55 — past
    // exactness, well inside the parity tier. Both engines hold the
    // exact integer S and round it identically, so the expected value
    // is the same two-step long→double→÷1e4 computation done here.
    val big = 9e11
    val df = Seq(big, big, big, big).toDF("v")
    val out = df.agg(graft.functions.Exact.dsumL($"v").as("s")).head
    assert(out.getDouble(0) == (4L * 9000000000000000L).toDouble / 1e4)
  }

  test("dsumL past the parity envelope fails loudly instead of wrapping") {
    import spark.implicits._
    // 3 rows × 2^61 scaled: S = 3×2^61 ≈ 2^62.58 ≥ 2^62 — within 2x of
    // 64-bit wrap, where Spark's long sum and DuckDB's HUGEINT diverge.
    val big = (1L << 61).toDouble / 1e4
    val df = Seq(big, big, big).toDF("v")
    val e = intercept[Exception] {
      df.agg(graft.functions.Exact.dsumL($"v").as("s")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("dsumL parity envelope exceeded")))
  }
}
