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
    // top-level artifact numbers parse too but can never shadow a gate
    // query name; sanity-pin they arrive as themselves
    assert(b("value") == 603.4)
    assert(!b.contains("q_dedup_jaccard"), "skip-list strings are not pairs")
  }
}
