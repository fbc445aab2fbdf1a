package graft

import org.apache.spark.sql.SparkSession

/** Round-6 optimization-harness main (guide §1.4): times ONLY the query
  * phase, with the SAME session config and noop-sink methodology as
  * Bench's phase 2, so per-query numbers are comparable without paying
  * the ~20-minute scaling phase on every iteration. Never replaces
  * Bench for the driver artifact — it exists so before/after deltas can
  * be measured per change (OPTIMIZATION_r06.md cites its numbers).
  *
  * Usage: sbt "runMain graft.BenchExtra [repeats] [queryName ...]"
  *   - repeats (default 1): timings reported per run; min is the
  *     sustainable-rate estimator (same reasoning as Bench.best).
  *   - queryName...: subset of SparkEntry.queries keys; empty = all.
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = args.headOption.map(_.toInt).getOrElse(1)
    val subset = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    // same untimed warmup as Bench phase 2
    try SparkEntry.queries("d3_token_stats")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case e: Throwable =>
      System.err.println(s"[bench-extra] warmup failed: ${e.getMessage}")
    }
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.isEmpty || subset(n) }
    val results = names.map { case (name, fn) =>
      sc.setJobDescription(name)
      val times = (1 to repeats).map { _ =>
        val q0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench-extra] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - q0) / 1e9
      }
      sc.setJobDescription(null)
      System.err.println(
        f"[bench-extra] $name%-22s min ${times.min}%7.3f s  " +
        times.map(t => f"$t%.3f").mkString("[", ", ", "]"))
      name -> times.min
    }
    val qs = results.map { case (k, v) => f""""$k":$v%.4f""" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"query-phase-only (BenchExtra)","queries":$qs,""" +
      s""""sf":"$sfDir","total_query_sec":${"%.4f".format(results.map(_._2).sum)}}""")
    spark.stop()
  }
}
