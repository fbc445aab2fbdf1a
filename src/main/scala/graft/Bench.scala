package graft

import graft.pipeline.SnapshotTable
import graft.synth.CorpusGen
import org.apache.spark.sql.SparkSession

/** Benchmark main. Two phases:
  *
  *  1. Scaling (the north_rule criterion): the extraction pipeline on one
  *     fixed synthetic corpus at local[8] and local[32] — the sandbox proxy
  *     for N vs 4N executor clusters — reporting docs/sec, spans/sec and
  *     efficiency = T32 / (4 * T8). Each level runs in its own CPU-pinned
  *     JVM (taskset + ActiveProcessorCount). Alongside: the pure-kernel
  *     scaling (engine-only) and a memory-bandwidth probe at both levels —
  *     the single-box environment constant a real N→4N cluster does not
  *     carry (BASELINE.md).
  *
  *  2. Headline operator queries from SparkEntry at local[cpus] on
  *     SPARK_GRAFT_SF_DIR, forced through a full materialization (noop
  *     sink — count() would let Catalyst prune the work).
  *
  * Survivability contract (BENCH_r01 post-mortem: the round-1 run was
  * OOM-killed at 45 min with nothing parseable on stdout):
  *  - the full scaling JSON line is printed BEFORE the query phase starts,
  *    so a mid-phase-2 kill still leaves a parseable artifact;
  *  - child JVMs get an explicit modest heap (they must NOT inherit an
  *    oversized driver -Xmx: Xms=Xmx+AlwaysPreTouch commits it all);
  *  - every query runs under a job-group with a hard cancel timer;
  *  - a watchdog halts the JVM cleanly before any external kill budget,
  *    leaving the last printed JSON line standing;
  *  - stale /dev/shm shuffle dirs from killed runs are deleted up front
  *    (tmpfs pages count against host RAM).
  *
  * Stdout carries up to TWO JSON lines (the phase-1 scaling line, then
  * the final line repeating it plus per-query timings) — the LAST
  * parseable line is authoritative; the first exists so a killed query
  * phase still leaves the scaling artifact.
  */
object Bench {

  /** The currently running pinned child, so the deadline watchdog can
    * kill it before halting — an orphaned child holds a fully committed
    * pretouched heap and pinned cores past the parent's death. */
  @volatile private var liveChild: Process = null

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Best-of-N: the sustainable rate. The sandbox host shows sporadic
    * multi-second noise spikes (observed on pure-CPU probes too), so min
    * wall is the robust estimator here. */
  private def best(xs: Seq[Double]): Double = xs.min

  /** Spawn a CPU-pinned child JVM. Inherited flags are reused minus any
    * heap sizing — the child gets `heap` explicitly (round-1 post-mortem:
    * children inheriting an ~89g Xms=Xmx+AlwaysPreTouch committed 2x host
    * RAM and the runner was OOM-killed). */
  private def pinnedJvm(cores: Int, heap: String, mainClass: String,
                        args: Seq[String], marker: String): Seq[Double] = {
    import scala.jdk.CollectionConverters._
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val inherited = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms"))
    val pin =
      if (new java.io.File("/usr/bin/taskset").exists())
        Seq("taskset", "-c", s"0-${cores - 1}")
      else Seq.empty
    val cmd = pin ++ Seq(javaBin) ++ inherited ++ Seq(
      s"-Xms$heap", s"-Xmx$heap",
      s"-XX:ActiveProcessorCount=$cores",
      "-cp", System.getProperty("java.class.path"),
      mainClass) ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    liveChild = p
    val out =
      try {
        val o = scala.io.Source.fromInputStream(p.getInputStream).getLines().toVector
        p.waitFor()
        o
      } finally liveChild = null
    out.find(_.startsWith(marker)) match {
      case Some(line) =>
        line.stripPrefix(marker).trim.split(" ").toSeq
          .filterNot(_.contains("=")).map(_.toDouble)
      case None => throw new RuntimeException(
        s"pinned child '$marker' failed:\n" + out.takeRight(30).mkString("\n"))
    }
  }

  private def deleteRecursive(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursive))
    f.delete()
  }

  private def f4(d: Double): String = "%.4f".format(d)

  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "4800").toInt
    val deadlineSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_SEC", "1800").toInt
    val corpusPath = s"/tmp/graft_bench_corpus_${nDocs}_v${CorpusGen.GenVersion}"

    // stale shuffle dirs from killed runs sit on tmpfs = host RAM
    deleteRecursive(new java.io.File("/dev/shm/spark-graft"))

    @volatile var finished = false
    val watchdog = new Thread(() => {
      val slept =
        try { Thread.sleep(deadlineSec * 1000L); true }
        catch { case _: InterruptedException => false }
      if (slept && !finished) {
        System.err.println(
          s"[bench] watchdog: deadline ${deadlineSec}s hit, halting " +
          "(last printed JSON line stands)")
        val child = liveChild
        if (child != null) child.destroyForcibly() // no orphaned pinned JVM
        Runtime.getRuntime.halt(0)
      }
    })
    watchdog.setDaemon(true)
    watchdog.start()

    // ---- phase 1: scaling, local[8] vs local[32] on identical input
    val prep = session(cpus)
    if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$corpusPath/_snapshots"))) {
      SnapshotTable.write(
        CorpusGen.inputDS(prep, nDocs, heavyEvery = 50).toDF(), corpusPath,
        buckets = 64)
    }
    // span count for throughput: distributed agg, not a driver loop
    val totalSpans = {
      import org.apache.spark.sql.functions.{col, size, sum}
      SnapshotTable.read(prep, corpusPath)._1
        .select(sum(size(col("spans")) - 1)).head().getLong(0) // cover dropped
    }
    prep.stop()
    def levelThroughput(cores: Int): (Double, Double) = {
      val times = pinnedJvm(cores, "8g", "graft.BenchLevel",
        Seq(cores.toString, corpusPath, "3"), s"LEVEL $cores ")
      System.err.println(
        f"[bench] pinned local[$cores]: timed ${times.map(t => f"$t%.2f").mkString(", ")}")
      val t = best(times)
      (nDocs / t, totalSpans / t)
    }
    val (docs8, spans8) = levelThroughput(8)
    val (docs32, spans32) = levelThroughput(32)
    val efficiency = docs32 / (4.0 * docs8)
    // pure-kernel scaling (engine-only, no Spark task path)
    def pure(cores: Int): Double =
      nDocs / best(pinnedJvm(cores, "4g", "graft.tools.PureLevel",
        Seq(cores.toString, nDocs.toString), s"PURE $cores "))
    val k8 = pure(8)
    val k32 = pure(32)
    val kEff = k32 / (4.0 * k8)
    // memory-bandwidth environment constant (GB/s at each level)
    def membw(cores: Int): Double =
      pinnedJvm(cores, "2g", "graft.tools.MemBw",
        Seq(cores.toString), s"MEMBW $cores ").head
    val bw8 = membw(8)
    val bw32 = membw(32)
    val bwEff = bw32 / (4.0 * bw8)
    System.err.println(
      f"[bench] pipeline eff $efficiency%.3f | kernel eff $kEff%.3f | " +
      f"membw $bw8%.1f->$bw32%.1f GB/s (eff $bwEff%.3f) | t=$elapsed%.0fs")

    def renderJson(queryTimes: Seq[(String, Double)]): String = {
      val qs = queryTimes.map { case (k, v) => s""""$k":${f4(v)}""" }
        .mkString("{", ",", "}")
      val totalQuerySec = queryTimes.map(_._2).sum
      s"""{"metric":"end-to-end extraction throughput (docs/sec at local[32]; scaling efficiency local[8]->local[32] attached)","value":${f4(docs32)},"unit":"docs/sec","queries":$qs,"sf":"$sfDir","total_query_sec":${f4(totalQuerySec)},"scaling":{"corpus_docs":$nDocs,"corpus_spans":$totalSpans,"local8_docs_per_sec":${f4(docs8)},"local8_spans_per_sec":${f4(spans8)},"local32_docs_per_sec":${f4(docs32)},"local32_spans_per_sec":${f4(spans32)},"efficiency_n_to_4n":${f4(efficiency)},"kernel_local8_docs_per_sec":${f4(k8)},"kernel_local32_docs_per_sec":${f4(k32)},"kernel_efficiency_n_to_4n":${f4(kEff)},"membw_local8_gbps":${f4(bw8)},"membw_local32_gbps":${f4(bw32)},"membw_efficiency_n_to_4n":${f4(bwEff)}}}"""
    }

    // scaling artifact is safe on stdout from here on, whatever happens
    // to the query phase (the driver's parser takes a JSON line; the final
    // line below repeats this one plus per-query timings)
    println(renderJson(Seq.empty))
    System.out.flush()

    // ---- phase 2: headline operator queries at local[cpus]
    val skipQueries = sys.env.get("SPARK_GRAFT_BENCH_SKIP_QUERIES").contains("1")
    val perQueryCapSec = 75
    val queryTimes =
      if (skipQueries) Seq.empty
      else {
        val spark = session(cpus)
        val sc = spark.sparkContext
        val timer = new java.util.Timer("bench-query-cap", true)
        val times = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
          case (name, fn) =>
            if (elapsed > deadlineSec - perQueryCapSec - 30) {
              System.err.println(s"[bench] $name skipped: deadline near")
              None
            } else {
              sc.setJobGroup(name, name, interruptOnCancel = true)
              val cancel = new java.util.TimerTask {
                def run(): Unit = {
                  System.err.println(s"[bench] $name cancelled at ${perQueryCapSec}s")
                  sc.cancelJobGroup(name)
                }
              }
              timer.schedule(cancel, perQueryCapSec * 1000L)
              val q0 = System.nanoTime()
              try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
              catch { case e: Throwable =>
                System.err.println(s"[bench] $name failed: ${e.getMessage}")
              } finally {
                cancel.cancel()
                sc.clearJobGroup()
              }
              Some(name -> (System.nanoTime() - q0) / 1e9)
            }
        }
        timer.cancel()
        spark.stop()
        times
      }

    println(renderJson(queryTimes))
    finished = true
    watchdog.interrupt()
  }
}
