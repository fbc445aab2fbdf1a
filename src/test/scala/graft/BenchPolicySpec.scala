package graft

import graft.Bench.{Attempt, nextRetryLevel, MaxAttempts, TurbulenceFrac}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's interference-aware measurement policy (pure parts):
  * turbulence detection on bracketed membw probes and the retry-level
  * selection order. The policy decides which pinned level gets re-measured
  * when the scaling gate is unmet — it must be deterministic and favor the
  * level most likely mis-measured. */
class BenchPolicySpec extends AnyFunSuite {

  private def a(bwPre: Double, bwPost: Double): Attempt =
    Attempt(bwPre, bwPost, pipeSec = 10.0, kernelSec = 9.0)

  test("turbulent iff the bracketing probes disagree by > TurbulenceFrac") {
    assert(!a(100, 100).turbulent)
    assert(!a(100, 100 * (1 - TurbulenceFrac)).turbulent) // boundary: not >
    assert(a(100, 80).turbulent)
    assert(a(80, 100).turbulent) // direction-agnostic
    assert(a(100, 80).bw == 100.0) // capacity = max of the two probes
  }

  test("retry prefers the least-sampled level") {
    val m = Map(8 -> Vector(a(100, 100), a(100, 100)),
                32 -> Vector(a(100, 100)))
    assert(nextRetryLevel(m).contains(32))
  }

  test("equal samples: the level with a turbulent latest attempt wins") {
    val m = Map(8 -> Vector(a(100, 100)), 32 -> Vector(a(100, 70)))
    assert(nextRetryLevel(m).contains(32))
  }

  test("equal samples, both calm: the noise-prone 8-core level wins") {
    val m = Map(8 -> Vector(a(100, 100)), 32 -> Vector(a(100, 100)))
    assert(nextRetryLevel(m).contains(8))
  }

  test("markTruncated flips exactly the truncated field (idempotent)") {
    val j = """{"value":1.0,"truncated":false,"scaling":{"gate_passed":true}}"""
    val t = Bench.markTruncated(j)
    assert(t.contains("\"truncated\":true") && !t.contains("\"truncated\":false"))
    assert(Bench.markTruncated(t) == t)
    assert(t.replace("\"truncated\":true", "\"truncated\":false") == j)
  }

  test("no level past MaxAttempts is ever retried; all exhausted -> None") {
    val full = Vector.fill(MaxAttempts)(a(100, 70))
    assert(nextRetryLevel(Map(8 -> full, 32 -> Vector(a(100, 100))))
             .contains(32))
    assert(nextRetryLevel(Map(8 -> full, 32 -> full)).isEmpty)
  }
}
