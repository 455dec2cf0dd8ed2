package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.HostState

/** Pins the tri-state host stamp (r17 verdict #2). The boolean
  * `drifted` stamped every r17 capture true — ambient fsync on this
  * host (0.14–0.35 ms) never clears the 0.15 ms quiet gate — so
  * auto-exclusion stopped excluding anything. The tri-state's
  * boundaries are the contract downstream comparison rules (gate
  * keep-best, floor merge validity) key on; an off-by-inclusive here
  * would relabel a whole round's captures.
  */
class HostStateSpec extends AnyFunSuite {
  // Bench defaults: quiet fsync<0.15, ambient fsync<0.5, spin<0.65
  private def c(spin: Double, fsync: Double): String =
    HostState.classify(spin, fsync, 0.15, 0.5, 0.65)

  test("quiet: both signals under the quiet gate") {
    assert(c(0.48, 0.05) == "quiet")
    assert(c(0.48, 0.149) == "quiet")
  }

  test("ambient: normal background IO churn, CPU un-stolen") {
    // the band every adjudicated-valid r17 capture lived in
    assert(c(0.48, 0.15) == "ambient")
    assert(c(0.48, 0.29) == "ambient")
    assert(c(0.64, 0.499) == "ambient")
  }

  test("drifted: fsync episode, CPU steal, or both") {
    assert(c(0.48, 0.5) == "drifted", "fsync at the ambient bound")
    assert(c(0.48, 1.26) == "drifted", "the campaign-night IO episode")
    assert(c(0.65, 0.05) == "drifted", "spin at the gate is steal")
    assert(c(1.27, 0.05) == "drifted", "the r15 official's stolen spin")
  }

  test("a failed probe (-1 sentinel) can never read better than drifted") {
    assert(c(-1.0, 0.05) == "drifted")
    assert(c(0.48, -1.0) == "drifted")
  }

  test("worst: the window is as bad as its worst probe") {
    assert(HostState.worst("quiet", "quiet") == "quiet")
    assert(HostState.worst("quiet", "ambient") == "ambient")
    assert(HostState.worst("ambient", "quiet") == "ambient")
    assert(HostState.worst("ambient", "drifted") == "drifted")
    assert(HostState.worst("drifted", "quiet") == "drifted")
  }
}
