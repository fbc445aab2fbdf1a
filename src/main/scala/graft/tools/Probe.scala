package graft.tools

import graft.kernel.{CropConfig, Recognize}
import graft.synth.{CorpusGen, PageRenderer}
import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    // --- kernel single-thread page cost
    val docId = "F1985003"
    val crop = CropConfig.lookup(docId)
    var t0 = System.nanoTime()
    var renderNs = 0L
    var recogNs = 0L
    val N = 40
    for (p <- 1 to N) {
      val a = System.nanoTime()
      val img = PageRenderer.render(docId, p)
      val b = System.nanoTime()
      Recognize.recognizeStored(img, crop)
      val c = System.nanoTime()
      renderNs += b - a
      recogNs += c - b
    }
    println(f"render ms/page: ${renderNs / N / 1e6}%.2f  recognize ms/page: ${recogNs / N / 1e6}%.2f")

    // --- pure kernel thread scaling (no Spark): pages/sec at 8 vs 32 threads
    for (nt <- Seq(8, 32, 8, 32)) {
      val pagesPerThread = 120
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nt)
      val t0 = System.nanoTime()
      val futs = (0 until nt).map { tid =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val id = s"F19850${(tid % 10)}3"
            val cr = CropConfig.lookup(id)
            var p = 1
            while (p <= pagesPerThread) {
              Recognize.recognizeStored(PageRenderer.render(id, p), cr)
              p += 1
            }
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"pure-kernel threads=$nt: ${nt * pagesPerThread / sec}%.0f pages/s (${sec}%.2f s)")
    }

    // --- extraction wall time per level from parquet, with task stats
    val order = sys.env.getOrElse("PROBE_LEVELS", "8,32").split(",").map(_.toInt)
    val corpusPath = sys.env.getOrElse("PROBE_CORPUS", "/tmp/graft_bench_corpus_600")
    for (cores <- order) {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val taskTime = new java.util.concurrent.atomic.AtomicLong()
      val gcTime = new java.util.concurrent.atomic.AtomicLong()
      val maxTask = new java.util.concurrent.atomic.AtomicLong()
      val nTasks = new java.util.concurrent.atomic.AtomicLong()
      val cpuTime = new java.util.concurrent.atomic.AtomicLong()
      val deserTime = new java.util.concurrent.atomic.AtomicLong()
      val shuffleFetch = new java.util.concurrent.atomic.AtomicLong()
      val stageTimes = new java.util.concurrent.ConcurrentHashMap[Int, (java.util.concurrent.atomic.AtomicLong, java.util.concurrent.atomic.AtomicLong)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = e.taskInfo.duration
          taskTime.addAndGet(d)
          gcTime.addAndGet(e.taskMetrics.jvmGCTime)
          maxTask.getAndUpdate(m => math.max(m, d))
          nTasks.incrementAndGet()
          cpuTime.addAndGet(e.taskMetrics.executorCpuTime)
          deserTime.addAndGet(e.taskMetrics.executorDeserializeTime)
          shuffleFetch.addAndGet(e.taskMetrics.shuffleReadMetrics.fetchWaitTime)
          val st = stageTimes.computeIfAbsent(e.stageId, _ =>
            (new java.util.concurrent.atomic.AtomicLong(), new java.util.concurrent.atomic.AtomicLong()))
          st._1.addAndGet(d)
          st._2.incrementAndGet()
        }
      })
      for (i <- 1 to 5) {
        taskTime.set(0); gcTime.set(0); maxTask.set(0); nTasks.set(0)
        cpuTime.set(0); deserTime.set(0); shuffleFetch.set(0)
        val (df, _) = graft.pipeline.SnapshotTable.read(spark, corpusPath)
        import spark.implicits._
        val t = System.nanoTime()
        graft.pipeline.ExtractJob.extract(spark, df.as[graft.core.Doc],
          graft.pipeline.ExtractJob.Config(buckets = 64, skewSpanThreshold = 32))
          .write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t) / 1e9
        println(f"local[$cores] run $i: wall $wall%6.2f s  taskSum ${taskTime.get / 1000.0}%7.2f s  cpuSum ${cpuTime.get / 1e9}%7.2f s  deser ${deserTime.get / 1000.0}%5.2f s  fetchWait ${shuffleFetch.get / 1000.0}%5.2f s  gc ${gcTime.get / 1000.0}%5.2f s")
        if (i == 5) {
          import scala.jdk.CollectionConverters._
          for ((sid, (sum, n)) <- stageTimes.asScala.toSeq.sortBy(_._1))
            println(f"  stage $sid%4d: ${sum.get / 1000.0}%7.2f s over ${n.get} tasks")
        }
        stageTimes.clear()
      }
      spark.stop()
    }
  }
}
