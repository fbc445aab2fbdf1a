package graft.tools

/** Memory-bandwidth probe (spawned CPU-pinned by Bench, like PureLevel):
  * `cores` threads stream-sum disjoint slices of a shared 512 MB long
  * array for ~2 s; prints `MEMBW <cores> <GB/s>`. The aggregate read
  * bandwidth at 8 vs 32 pinned cores is the single-box environment
  * constant behind the pipeline scaling number: a real N→4N *cluster*
  * scale-up multiplies total bandwidth by 4, this box does not
  * (BASELINE.md "Interpretation"). */
object MemBw {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val words = 64 * 1024 * 1024 // 512 MB
    val a = new Array[Long](words)
    var i = 0
    while (i < words) { a(i) = i; i += 1 } // touch every page
    val slice = words / cores
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sink = new java.util.concurrent.atomic.AtomicLong(0)
    val threads = (0 until cores).map { t =>
      new Thread(() => {
        val lo = t * slice
        val hi = lo + slice
        var local = 0L
        while (!stop.get()) {
          var s = 0L
          var j = lo
          while (j < hi) { s += a(j); j += 1 }
          local += s
          bytesRead.addAndGet(slice.toLong * 8)
        }
        sink.addAndGet(local)
      })
    }
    // warm-up pass settles page placement + JIT before the timed window
    threads.foreach(_.start())
    Thread.sleep(500)
    bytesRead.set(0)
    val t0 = System.nanoTime()
    Thread.sleep(2000)
    val bytes = bytesRead.get()
    val sec = (System.nanoTime() - t0) / 1e9
    stop.set(true)
    threads.foreach(_.join())
    if (sink.get() == Long.MinValue) println("?") // keep the sum live
    println(f"MEMBW $cores ${bytes / sec / 1e9}%.3f")
  }
}
