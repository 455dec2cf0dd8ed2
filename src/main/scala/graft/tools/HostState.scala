package graft.tools

/** Tri-state host-condition classifier for bench artifacts (r17
  * verdict #2). The boolean `drifted` stamp lost discriminating power
  * on this host: ambient fsync sits at 0.14–0.35 ms and never clears
  * the 0.15 ms quiet gate twice in a row (forensics/gate_r17{b,c}/
  * gate.log polled for hours), so every r17 capture — including the
  * one that set the floor — stamped `drifted: true`. A boolean that is
  * always true excludes nothing. The tri-state separates the windows
  * that matter:
  *
  *   quiet    fsync < quietFsyncMs  AND spin < quietSpinS — the
  *            pre-r17 "quiet" predicate, unchanged; rarely seen on
  *            this host any more.
  *   ambient  fsync < ambientFsyncMs AND spin < quietSpinS — normal
  *            background IO churn (0.15–0.5 ms fsync), CPU un-stolen.
  *            Every adjudicated-valid r17 capture lived here; the
  *            89.2 s pass that reset the floor was ambient.
  *   drifted  anything worse, or a FAILED probe (-1 sentinel) — an
  *            unlabeled window must never read better than drifted.
  *
  * Comparison rule downstream (tools/bench_gate.sh, SCALE.md):
  * auto-exclude only `drifted`; prefer `quiet` over `ambient` when
  * keep-besting officials; the floor min-merge accepts all three
  * (churn inflates wall-clock, never deflates it).
  *
  * Pure so the boundary arithmetic is spec-testable without a probe.
  */
object HostState {
  val Order: Seq[String] = Seq("quiet", "ambient", "drifted")

  def classify(spin: Double, fsync: Double, quietFsyncMs: Double,
      ambientFsyncMs: Double, quietSpinS: Double): String =
    if (spin < 0 || fsync < 0) "drifted"
    else if (fsync < quietFsyncMs && spin < quietSpinS) "quiet"
    else if (fsync < ambientFsyncMs && spin < quietSpinS) "ambient"
    else "drifted"

  /** An artifact's stamp covers the whole timed window: pre- and
    * post-pass probes both have to be good for the window to be good.
    */
  def worst(a: String, b: String): String =
    if (Order.indexOf(a) >= Order.indexOf(b)) a else b
}
