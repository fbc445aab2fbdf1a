package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans of the headline queries for plan review. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q2_segment_revenue", "q6_range_config", "d2_ngram_jaccard",
      "e1_knn_brute", "d1_dedup_exact", "d7_minhash_lsh")
    for (n <- names) {
      println(s"========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
