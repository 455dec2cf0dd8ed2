package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cliff-SLO baseline parser: the per-query thresholds that arm
  * BenchTrace's auto-capture come straight from a committed BENCH_FULL
  * artifact, so a parse quirk would silently disarm the SLO.
  */
class BenchTraceSpec extends AnyFunSuite {

  test("parseBaseline keeps the worst pass per query across pass maps") {
    val f = java.io.File.createTempFile("graft-bench-baseline", ".json")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    w.println(
      """{"metric":"total","value":603.400,"unit":"sec","sf":"/tmp/graft_combo100",
        |"skipped":["q_dedup_jaccard"],
        |"queries":{
        |  "q_event_resample": 6.500,
        |  "q_tfidf_top": 8.000
        |},"total_pass2":634.600,"queries_pass2":{
        |  "q_event_resample": 6.700,
        |  "q_tfidf_top": 7.200
        |}}""".stripMargin)
    w.close()
    val b = graft.tools.BenchTrace.parseBaseline(f.getPath)
    assert(b("q_event_resample") == 6.7, "max across passes wins")
    assert(b("q_tfidf_top") == 8.0)
    // key-allowlisted parse (r17 verdict #5): top-level artifact
    // numbers are NOT measurements and must not arrive at all
    assert(!b.contains("value"))
    assert(!b.contains("q_dedup_jaccard"), "skip-list strings are not pairs")
  }

  private def artifact(pass1: Seq[(String, String)],
      pass2: Seq[(String, String)]): java.io.File = {
    val f = java.io.File.createTempFile("graft-bench-baseline", ".json")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    def m(vs: Seq[(String, String)]) =
      vs.map { case (k, v) => s"""  "$k": $v""" }.mkString("{\n", ",\n", "\n}")
    w.println(s"""{"metric":"total","value":500.0,"unit":"sec","sf":"/tmp/x",
      |"skipped":[],
      |"queries":${m(pass1)},"total_pass2":500.0,"queries_pass2":${m(pass2)}}"""
      .stripMargin)
    w.close()
    f
  }

  test("integer-formatted values parse (would silently disarm the SLO)") {
    // r13 ADVICE: the old regex required a fractional part, so a value
    // serialized without decimals fell back to the fixed 30 s threshold
    val f = artifact(Seq("q_x" -> "12", "q_y" -> "0.5"),
      Seq("q_x" -> "3.0", "q_y" -> "7"))
    val b = graft.tools.BenchTrace.parseBaseline(f.getPath)
    assert(b("q_x") == 12.0, "integer pass value must parse")
    assert(b("q_y") == 7.0)
  }

  test("floor-ratio block never pollutes the SLO baseline (r17)") {
    // r17 artifacts append "floor":{"ratios":{...}} whose entries reuse
    // query names; for a sub-second query the ratio (>1) exceeds its
    // seconds, so an unstripped scan would take the ratio as the
    // worst pass and loosen that query's threshold 10x+
    val f = java.io.File.createTempFile("graft-bench-baseline", ".json")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    w.println(
      """{"metric":"total","value":105.0,"unit":"sec","sf":"/tmp/x",
        |"skipped":[],"failed":[],
        |"probe":{"pre_spin_s":1.2,"pre_fsync_ms":0.05,"post_spin_s":1.21,"post_fsync_ms":0.06},
        |"drifted":false,
        |"queries":{
        |  "grep": 0.125,
        |  "q_slow": 9.000
        |},
        |"floor":{"path":"BENCH_NOISE.json","total_ratio":1.020,
        |"ratios":{
        |  "grep": 1.45,
        |  "q_slow": 0.98
        |}}}""".stripMargin)
    w.close()
    val b = graft.tools.BenchTrace.parseBaseline(f.getPath)
    assert(b("grep") == 0.125, "ratio must not win the worst-pass max")
    assert(b("q_slow") == 9.0)
    assert(!b.contains("total_ratio"), "floor block stripped entirely")
  }

  test("curated multi-artifact baseline un-blinds the SLO (102s replay)") {
    // The r13 sequence replayed with the committed artifacts' values:
    // the armed artifact (BENCH_FULL_graft_ev100.json) itself carried a
    // 48.697 s resample cliff pass, so the 102.018 s instance
    // (forensics/BENCH_FULL_graft_ev100_102s_cliff_run_r13.json) printed
    // NO breach — threshold was 3×48.697 = 146 s. A clean artifact
    // beside it (the r13 mitigation session ran 6.8/6.9 s, SCALE.md)
    // must anchor the threshold back at 3×clean.
    val cliffArtifact = artifact(
      Seq("q_event_resample" -> "48.697", "q_bpe_apply" -> "12.337"),
      Seq("q_event_resample" -> "7.823", "q_bpe_apply" -> "1.310"))
    val cleanArtifact = artifact(
      Seq("q_event_resample" -> "6.800", "q_bpe_apply" -> "12.100"),
      Seq("q_event_resample" -> "6.900", "q_bpe_apply" -> "1.290"))
    val slow = 102.018

    val old = graft.tools.BenchTrace.parseBaseline(cliffArtifact.getPath)
    assert(old("q_event_resample") == 48.697)
    assert(slow < 3 * old("q_event_resample"),
      "single-artifact policy: the 102 s instance is invisible (the bug)")

    val curated = graft.tools.BenchTrace.parseBaseline(
      Seq(cliffArtifact.getPath, cleanArtifact.getPath))
    assert(curated("q_event_resample") == 6.9,
      "clean artifact's worst pass anchors the query")
    assert(slow > 3 * curated("q_event_resample"),
      "curated policy: the 102 s instance WOULD have breached")
    assert(48.697 > 3 * curated("q_event_resample"),
      "…and so would the armed artifact's own 48.7 s cliff pass")

    // staging/memoization pass asymmetry must NOT breach: within an
    // artifact the WORST pass represents the query (q_bpe_apply pays
    // BPE training in pass 1 — 12.3 s vs 1.3 s memoized), so min-ing
    // happens only ACROSS artifacts
    assert(curated("q_bpe_apply") == 12.1,
      "per-artifact max guards staging-pass asymmetry")
    assert(12.337 < 3 * curated("q_bpe_apply"),
      "a normal staging-inclusive pass stays under its threshold")
  }

  test("a layout-staging pass is annotated, not a cliff-SLO breach (s01 replay)") {
    import graft.tools.BenchTrace
    // r14 campaign s01: q_zorder_scan pass 1 ran 7.8 s because the
    // fingerprinted layout path was fresh that session and the pass
    // paid the z-order WRITE; the armed baseline's min was 1.0 s →
    // threshold max(3×1.0, floor 5.0) = 5.0 — the tracer printed a
    // `cliff-SLO breach` for expected first-pass staging cost (r14
    // verdict directive 3). Replay the values and pin the demotion.
    val f = artifact(Seq("q_zorder_scan" -> "1.0"),
      Seq("q_zorder_scan" -> "1.1"))
    val b = BenchTrace.parseBaseline(f.getPath)
    val threshold = math.max(3.0 * b("q_zorder_scan"), BenchTrace.MinCliffSec)
    assert(threshold == 5.0 && 7.8 > threshold,
      "s01's staging pass trips the threshold either way — the label is " +
        "what must change")
    val annotated = BenchTrace.breachLabel(hasBaseline = true,
      stagedThisPass = true, stagedOut = "/tmp/graft_zorder_tmp_x_ab12cd34")
    assert(!annotated.contains("cliff-SLO breach"),
      "a pass that performed a staging write must not print the breach " +
        "marker campaign tooling greps for")
    assert(annotated.contains("staging pass"),
      "…but it must still be annotated (the cost is real)")
    // a genuinely slow pass with no staging keeps the breach marker,
    // and fixed-threshold (no-baseline) queries keep the bare label
    assert(BenchTrace.breachLabel(hasBaseline = true, stagedThisPass = false,
      stagedOut = "").contains("cliff-SLO breach"))
    assert(BenchTrace.breachLabel(hasBaseline = false, stagedThisPass = true,
      stagedOut = "x") == "")
  }
}
