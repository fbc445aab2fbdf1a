package graft

import graft.Bench.{Attempt, GateTarget, MaxPairs, PairAttempt, TurbulenceFrac,
  evalGate, nextPairFits}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's paired-window measurement policy (pure parts):
  * turbulence detection on bracketed membw probes, the per-pair and
  * pooled gate math, the single end-of-sampling gate evaluation, and the
  * fixed sampling plan's independence from measured values (the round-3
  * optional-stopping finding: the sample count must not depend on the
  * verdict). */
class BenchPolicySpec extends AnyFunSuite {

  private def a(bwPre: Double, bwPost: Double,
                pipe: Double = 10.0, kern: Double = 9.0): Attempt =
    Attempt(bwPre, bwPost, pipeSec = pipe, kernelSec = kern)

  /** A pair with the given within-window efficiencies at membw eff 1.0
    * (bw32 = 4*bw8), so pOverB == pipeEff unless bw is overridden. */
  private def pair(pipeEff: Double, kernEff: Double,
                   bw8: Double = 25.0, bw32: Double = 100.0): PairAttempt =
    PairAttempt(
      a(bw8, bw8, pipe = 40.0 * pipeEff, kern = 40.0 * kernEff),
      a(bw32, bw32, pipe = 10.0, kern = 10.0))

  test("turbulent iff the bracketing probes disagree by > TurbulenceFrac") {
    assert(!a(100, 100).turbulent)
    assert(!a(100, 100 * (1 - TurbulenceFrac)).turbulent) // boundary: not >
    assert(a(100, 80).turbulent)
    assert(a(80, 100).turbulent) // direction-agnostic
    assert(a(100, 80).bw == 100.0) // capacity = max of the two probes
    assert(PairAttempt(a(100, 80), a(100, 100)).turbulent) // either side
  }

  test("per-pair efficiency math: T8/(4*T32), bw32/(4*bw8), pipe/membw") {
    val p = PairAttempt(a(25, 25, pipe = 32.0, kern = 36.0),
                        a(90, 100, pipe = 10.0, kern = 10.0))
    assert(math.abs(p.pipeEff - 0.8) < 1e-12)
    assert(math.abs(p.kernEff - 0.9) < 1e-12)
    assert(math.abs(p.bwEff - 1.0) < 1e-12)
    assert(math.abs(p.pOverB - 0.8) < 1e-12)
  }

  test("per-pair gate: pipeline>=0.8 OR (kernel>=0.8 AND pipe/membw>=1.0)") {
    assert(pair(0.8, 0.5).passed)          // raw pipeline path
    assert(!pair(0.79, 0.79).passed)       // neither disjunct
    // kernel path needs BOTH kernel>=0.8 and pOverB>=1.0
    assert(!pair(0.7, 0.9).passed)         // pOverB = 0.7 < 1.0
    // membw eff 0.625 (bw32=100, bw8=40): pOverB = 0.7/0.625 = 1.12
    assert(pair(0.7, 0.9, bw8 = 40.0).passed)
    assert(!pair(0.7, 0.79, bw8 = 40.0).passed) // kernel below target
  }

  test("gate passes iff pooled passes OR any single pair passes") {
    val bad = pair(0.6, 0.6)
    val good = pair(0.85, 0.9)
    assert(evalGate(Seq(bad, good, bad)).passed)
    assert(evalGate(Seq(bad, good, bad)).pairPassed)
    assert(!evalGate(Seq(bad, bad)).passed)
    assert(evalGate(Seq(good)).passed)
  }

  test("pooled estimators: min wall per level across all windows") {
    // each level's fastest run may come from a different window — pooled
    // pipe = min(32,40)/(4*min(16,10)) = 0.8, kern = 36/(4*10) = 0.9
    val p1 = PairAttempt(a(25, 25, pipe = 32.0, kern = 36.0),
                         a(100, 100, pipe = 16.0, kern = 12.0))
    val p2 = PairAttempt(a(20, 30, pipe = 40.0, kern = 40.0),
                         a(100, 90, pipe = 10.0, kern = 10.0))
    val g = evalGate(Seq(p1, p2))
    assert(math.abs(g.pipeEff - 0.8) < 1e-12)
    assert(math.abs(g.kernEff - 0.9) < 1e-12)
    assert(math.abs(g.bwEff - 100.0 / 120.0) < 1e-12) // max bw per level
    assert(g.pooledPassed && g.passed)
  }

  test("pooled bandwidth is MAX across windows (depressed probe = interference)") {
    val g = evalGate(Seq(pair(0.7, 0.7, bw8 = 25, bw32 = 80),
                         pair(0.7, 0.7, bw8 = 20, bw32 = 100)))
    assert(math.abs(g.bwEff - 1.0) < 1e-12) // 100/(4*25), not within-pair
  }

  test("sampling plan depends only on time budget, never on the verdict") {
    // fits: below MaxPairs and predicted wall inside budget
    assert(nextPairFits(1, elapsedSec = 100, pairWallsSec = Seq(100), budgetSec = 500))
    // budget cut: prediction (elapsed + midpoint*1.1) crosses the budget
    assert(!nextPairFits(1, elapsedSec = 395, pairWallsSec = Seq(100), budgetSec = 500))
    // the predictor is the min/max midpoint, not the worst pair: one
    // 4x-interference pair must not block a second pair the budget allows
    // (observed live: pair 1 at 660 s would have predicted 790 s with
    // 790 s left — midpoint of a later 300 s pair keeps the plan going)
    assert(nextPairFits(2, elapsedSec = 900,
      pairWallsSec = Seq(660, 300), budgetSec = 1500)) // predict 528
    // hard cap at MaxPairs
    assert(!nextPairFits(MaxPairs, elapsedSec = 0, pairWallsSec = Seq(1), budgetSec = 1e9))
    // no efficiency/verdict parameter exists in the signature at all —
    // the plan CANNOT stop early on a pass or extend on a fail
  }

  test("GateTarget is the documented 0.8") {
    assert(GateTarget == 0.8)
  }

  test("degradation deferral: waits on a degraded probe, bounded, verdict-blind") {
    import Bench.{shouldDefer, DegradedBw8Gbps, DeferSleepSec, MaxTotalDeferSec}
    // degraded probe with budget left: defer
    assert(shouldDefer(45.0, deferSecUsed = 0, elapsedSec = 100,
      pairWallsSec = Seq(250), budgetSec = 1500))
    // quiet probe: measure immediately (boundary reading is quiet)
    assert(!shouldDefer(DegradedBw8Gbps, 0, 100, Seq(250), 1500))
    assert(!shouldDefer(58.0, 0, 100, Seq(250), 1500))
    // global defer budget exhausted: measure even if still degraded
    assert(!shouldDefer(45.0, MaxTotalDeferSec, 100, Seq(250), 1500))
    assert(shouldDefer(45.0, MaxTotalDeferSec - DeferSleepSec, 100, Seq(250), 1500))
    // a sleep that would push the mandatory pair past the budget: measure
    // now. The fit is floored at the DEGRADED pair wall (850), not the
    // quiet predictor (midpoint(250)*1.1 = 275): when deferral runs out
    // the host is BY CONSTRUCTION still degraded, so the pair it then
    // measures costs the degraded wall — a long defer must never turn
    // into a truncated artifact
    assert(!shouldDefer(45.0, 0, 1200, Seq(250), 1500))
    assert(!shouldDefer(45.0, 0, 600, Seq(250), 1500)) // 600+60+850 >= 1500
    assert(shouldDefer(45.0, 0, 580, Seq(250), 1500))  // 580+60+850 < 1500
    // first pair (no walls observed): conservative guess still bounds it
    assert(shouldDefer(45.0, 0, 0, Seq.empty, 1500))
    assert(!shouldDefer(45.0, 0, 1100, Seq.empty, 1500)) // 1100+60+850 >= 1500
    // no efficiency/verdict parameter exists in the signature at all —
    // deferral can shift WHEN windows are sampled, never HOW MANY
  }

  test("deferral epoch-end is debounced: one quiet probe inside a degraded " +
       "epoch does not release the pair (invocation-9 flapping edge)") {
    import Bench.{deferMore, deferFits, DegradedBw8Gbps, QuietProbesToEndDefer,
                  DeferSleepSec, MaxTotalDeferSec}
    assert(QuietProbesToEndDefer == 2)
    // common quiet case: first probe quiet, never-degraded run measures
    // immediately at zero deferral cost
    assert(!deferMore(58.0, everDegraded = false, quietStreak = 1))
    // degraded probe always wants another sleep, regardless of history
    assert(deferMore(45.0, everDegraded = false, quietStreak = 0))
    assert(deferMore(45.0, everDegraded = true, quietStreak = 0))
    // the inv-9 edge: epoch seen, ONE probe rebounds past the threshold —
    // still deferring (needs a second consecutive quiet reading)
    assert(deferMore(58.0, everDegraded = true, quietStreak = 1))
    // second consecutive quiet probe: epoch end confirmed, measure
    assert(!deferMore(58.0, everDegraded = true, quietStreak = 2))
    // boundary reading counts as quiet (same convention as shouldDefer)
    assert(!deferMore(DegradedBw8Gbps, everDegraded = true, quietStreak = 2))
    // the confirmation sleep obeys the same cap and budget-fit floor as a
    // degraded one — debouncing can never push the pair past the budget
    assert(!deferFits(MaxTotalDeferSec, 100, Seq(250), 1500))
    assert(deferFits(MaxTotalDeferSec - DeferSleepSec, 100, Seq(250), 1500))
    assert(!deferFits(0, 600, Seq(250), 1500)) // 600+60+850 >= 1500
    // deferMore takes no efficiency/verdict input either — the debounce
    // is as verdict-blind as the deferral it extends
  }

  test("exemplar pair = most balanced passer, not the noisiest ratio") {
    // live case: a 58 s interference hit on one 8-core half produced
    // pipe 1.397 / kernel 0.577 — technically a passer, but the summary
    // fields should showcase the window whose two probes AGREE
    val noisy = pair(1.397, 0.577)
    val balanced = pair(0.929, 0.852)
    val pick = Bench.exemplarPair(Seq(noisy, balanced, pair(0.5, 0.5)))
    assert(math.abs(pick.pipeEff - 0.929) < 1e-9)
  }

  test("markTruncated flips exactly the truncated field (idempotent)") {
    val j = """{"value":1.0,"truncated":false,"scaling":{"gate_passed":true}}"""
    val t = Bench.markTruncated(j)
    assert(t.contains("\"truncated\":true") && !t.contains("\"truncated\":false"))
    assert(Bench.markTruncated(t) == t)
    assert(t.replace("\"truncated\":true", "\"truncated\":false") == j)
  }
}
