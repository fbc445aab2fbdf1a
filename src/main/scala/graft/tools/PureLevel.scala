package graft.tools

import graft.kernel.{ExtractKernel, KernelStats, SyntheticStore}
import graft.synth.CorpusGen

/** Pure-kernel scaling measurement (no Spark): the same corpus docs, a
  * fixed thread pool, ExtractKernel only. Run pinned:
  *   taskset -c 0-(N-1) java ... graft.tools.PureLevel N 4800 [runs]
  * Distinguishes hardware scaling limits from Spark task-path costs. */
object PureLevel {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val nDocs = args(1).toInt
    val runs = if (args.length > 2) args(2).toInt else 3
    val (inputs, _) = CorpusGen.corpus(nDocs, heavyEvery = 50)
    def once(): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val idx = new java.util.concurrent.atomic.AtomicInteger(0)
      val t0 = System.nanoTime()
      val futs = (0 until threads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val st = new KernelStats
            var i = idx.getAndIncrement()
            while (i < inputs.length) {
              ExtractKernel.extractDoc(inputs(i), SyntheticStore, st)
              i = idx.getAndIncrement()
            }
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm-up
    val times = (1 to runs).map(_ => once())
    println(s"PURE $threads ${times.map(t => f"$t%.2f").mkString(" ")} " +
      f"best_docs_per_sec=${nDocs / times.min}%.1f")
  }
}
