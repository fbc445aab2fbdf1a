package graft.tools

/** Per-thread scalar-compute probe (spawned CPU-pinned by Bench, like
  * MemBw): `cores` threads each spin a register-resident integer LCG for
  * ~2 s; prints `CPUSPD <cores> <M ops/s per thread>`. No memory traffic
  * beyond the loop counter, so the per-thread rate tracks the EFFECTIVE
  * CLOCK of a core when `cores` of them are busy.
  *
  * Why it exists: the ratio clk(4N-busy)/clk(N-busy) is the second
  * single-box environment constant behind the N→4N scaling numbers (the
  * first is MemBw's bandwidth ceiling). On this host the per-thread rate
  * with many cores busy is ~0.85-1.0 of the few-busy rate
  * (turbo/hypervisor headroom at low occupancy), so even a PERFECTLY
  * scaling compute job tops out at that measured efficiency — a ceiling
  * a real N→4N cluster does not carry, because 4 separate N-core nodes
  * all run at the N-busy-core clock. Emitted per attempt into the bench
  * artifact so a sub-0.8 kernel reading in an otherwise-quiet window is
  * explainable from the JSON alone. Record-only at introduction
  * (invocation 25); since invocation 28 it feeds the gate through the
  * CLOCK-NORMALIZATION ARM ([[graft.Bench.ClkArmMin]] scaladoc): a clean
  * pair whose in-window reading sits inside the plausible turbo band may
  * divide this ceiling out of both compute ratios. It never influences
  * the deferral or the sampling plan. */
object CpuSpeed {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val done = new Array[Long](cores) // ops completed in the timed window
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val timing = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sink = new java.util.concurrent.atomic.AtomicLong(0)
    val threads = (0 until cores).map { t =>
      new Thread(() => {
        var x = t.toLong + 1L
        var n = 0L
        var counting = false
        while (!stop.get()) {
          var k = 0
          while (k < 100000) {
            x = x * 6364136223846793005L + 1442695040888963407L
            k += 1
          }
          if (counting) n += 100000
          else if (timing.get()) { counting = true; n = 0L }
        }
        done(t) = n
        sink.addAndGet(x) // keep the LCG live past the JIT
      })
    }
    // warm-up settles JIT + frequency governor before the timed window
    threads.foreach(_.start())
    Thread.sleep(500)
    timing.set(true)
    val t0 = System.nanoTime()
    Thread.sleep(2000)
    stop.set(true)
    val sec = (System.nanoTime() - t0) / 1e9
    threads.foreach(_.join())
    if (sink.get() == Long.MinValue) println("?") // keep the sum live
    val perThread = done.sum.toDouble / cores / sec
    println(f"CPUSPD $cores ${perThread / 1e6}%.3f")
  }
}
