package graft

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Connectors

/** Executable coverage for the connector builders (SURVEY §2.1 S1-S4).
  * The sandbox has no Kafka broker, so the Kafka tests pin the exact
  * option surface and prove the builders route to Spark's kafka source
  * (resolution is attempted and fails only on the absent connector
  * artifact). JDBC, by contrast, runs for real against embedded Derby
  * (on the Spark classpath): sink write → pushdown-subquery read back.
  */
class ConnectorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kafka batch/stream builders carry the reference's reader options") {
    assert(Connectors.kafkaBatchOptions("broker:9092", "stock_data") == Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "stock_data",
      "startingOffsets" -> "earliest",
      "endingOffsets" -> "latest",
      "failOnDataLoss" -> "false"))
    val stream = Connectors.kafkaStreamOptions("broker:9092", "stock_data")
    assert(stream("startingOffsets") == "latest")
    assert(!stream.contains("endingOffsets"), "a stream read has no ending bound")
    assert(stream("failOnDataLoss") == "false")
  }

  test("kafka builders route to the kafka data source") {
    // Without the kafka connector artifact the failure must be source
    // RESOLUTION (proving format wiring), not an option/config error.
    val batch = intercept[Exception](
      Connectors.kafkaBatch(spark, "broker:9092", "t")).getMessage
    assert(batch.toLowerCase.contains("kafka"), s"unexpected failure: $batch")
    val stream = intercept[Exception](
      Connectors.kafkaStream(spark, "broker:9092", "t")).getMessage
    assert(stream.toLowerCase.contains("kafka"), s"unexpected failure: $stream")
  }

  test("jdbc sink + pushdown-subquery source round-trip through Derby") {
    // keep derby.log out of the repo working tree
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft_derby").toString)
    val url = "jdbc:derby:memory:graftdb;create=true"
    val bars = Seq(
      ("AAPL", 101.5, 1000L), ("MSFT", 55.0, 2000L), ("AAPL", 102.0, 3000L)
    ).toDF("symbol", "price", "volume")

    // Spark's JDBC writer quotes identifiers, so Derby stores them
    // case-sensitively — the pushdown subquery must quote them too
    Connectors.writeJdbc(bars, url, "stock_bars", SaveMode.Overwrite)
    val filtered = Connectors.jdbcQuery(spark, url,
      """SELECT "symbol", "price" FROM stock_bars WHERE "volume" >= 2000""")
    assert(filtered.columns.map(_.toLowerCase).toSeq == Seq("symbol", "price"))
    assert(filtered.count() == 2)

    // append parity (reference stock_bars uses append mode)
    Connectors.writeJdbc(bars.filter($"symbol" === "MSFT"), url,
      "stock_bars", SaveMode.Append)
    val all = Connectors.jdbcQuery(spark, url, """SELECT "symbol" FROM stock_bars""")
    assert(all.count() == 4)
    assert(Connectors.jdbcTableExpr("SELECT 1") == "(SELECT 1) AS t")
  }

  test("json-lines sink + schema'd source round-trip, corrupt lines survive") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString + "/docs"
    val docs = Seq((1L, "alpha", "en"), (2L, "beta", "de"))
      .toDF("doc_id", "text", "lang")
    Connectors.writeJsonLines(docs, dir, SaveMode.Overwrite)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val back = Connectors.jsonLines(spark, dir, schema)
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(back.toSeq == Seq((1L, "alpha", "en"), (2L, "beta", "de")))

    // a malformed line yields a null-columned row (PERMISSIVE), not a crash
    val corrupt = java.nio.file.Files.createTempDirectory("graft_jsonl2")
      .resolve("bad.json")
    java.nio.file.Files.write(corrupt,
      "{\"doc_id\": 3, \"text\": \"ok\", \"lang\": \"en\"}\nnot json at all\n".getBytes)
    val mixed = Connectors.jsonLines(spark, corrupt.toString, schema)
    assert(mixed.count() == 2)
    assert(mixed.filter($"doc_id".isNull).count() == 1)
  }

  test("orc sink + source round-trip with pushed predicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/t"
    val docs = Seq((1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0))
      .toDF("id", "name", "v")
    Connectors.writeOrc(docs, dir)
    val back = Connectors.orc(spark, dir)
    assert(back.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0)))
    // predicate + projection reach the ORC scan like the parquet path
    val q = back.filter($"id" > 1L).select("id", "name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"orc scan must carry the pushed filter:\n$plan")
    assert(q.count() == 2)
  }
}
