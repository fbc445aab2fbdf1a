package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer (not part of the driver contract): runs the
  * named `SparkEntry.queries` entries against a scale-factor dir and prints
  * wall seconds per query — the fast feedback loop for optimizing one
  * query without paying for a full Bench invocation.
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <query> [query ...]
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .appName(s"graft-timequery-$cpus")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/tmp/spark-graft-timequery")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      for (name <- args.drop(1)) {
        val q = graft.SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query '$name'; known: " +
            graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
        val t0 = System.nanoTime()
        val n = q(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[timequery] $name%-20s $sec%8.3f s  ($n rows)")
      }
    } finally spark.stop()
  }
}
