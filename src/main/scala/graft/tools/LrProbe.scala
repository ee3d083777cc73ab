package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.functions.TextOps

/** Dev probe: per-phase timing of logisticTrain. Not on any gate. */
object LrProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, dir)
    val label = graft.plans.TextHash.classifierScore(TextOps.tokens(col("text"))) > 0L
    docs.limit(1).count() // warm footers
    for (r <- Seq(1, 2, 4, 8)) {
      val t0 = System.nanoTime()
      TextAnalysis.logisticTrain(docs, "doc_id", "text", label,
        nBuckets = 4096, rounds = r)
      println(f"[lrprobe] rounds=$r => ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
