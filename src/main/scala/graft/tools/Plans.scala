package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: dump physical-plan summaries for the operator queries on a
  * given sf dir — the `.explain` audit loop (exchanges, join strategies,
  * pushdown) the bench protocol prescribes. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-plans")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // queries whose CONSTRUCTION already runs Spark jobs (iterative
    // algorithms): only inspect when explicitly named — a plan audit must
    // not execute minutes of clustering
    val eager = Set("d10_dup_clusters")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if (names.isEmpty && !eager(name)) || names(name)) {
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val joins = plan.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange"))
          .map(_.trim.take(120)).toVector
        println(s"PLAN $name exchanges=${joins.count(_.startsWith("Exchange"))}")
        joins.foreach(l => println(s"  $l"))
      } catch { case e: Throwable =>
        println(s"PLAN $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
