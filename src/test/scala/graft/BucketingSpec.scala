package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Bucketing, Tables}

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed join runs with zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
        .withColumnRenamed("l_orderkey", "orderkey"),
      "li_bucketed", "orderkey", 4, SaveMode.Overwrite)
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "orderkey"),
      "o_bucketed", "orderkey", 4, SaveMode.Overwrite)
    val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "o_bucketed", "orderkey")
    val exchanges = joined.queryExecution.executedPlan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"expected no shuffle, plan had: ${exchanges.map(_.nodeName)}")
    // and the join is still correct
    assert(joined.count() == Tables.lineitem(spark, sf).count())
  }
}
