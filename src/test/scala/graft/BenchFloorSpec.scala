package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.BenchFloor

/** Pins the drift-normalization block (r16 verdict #7): every sf0.1
  * bench artifact self-reports per-query ratios to the committed noise
  * floor, so mover tables self-label (uniform band = drift, lone big
  * mover = regression) without adjudication prose. A parse quirk here
  * would silently mislabel a whole round's captures.
  */
class BenchFloorSpec extends AnyFunSuite {

  private val floorArtifact =
    """{"metric":"total","value":105.0,"unit":"sec","sf":"/root/testdata/sf0.1",
      |"skipped":[],"failed":[],
      |"probe":{"pre_spin_s":0.50,"pre_fsync_ms":0.05,"post_spin_s":0.51,"post_fsync_ms":0.06},
      |"drifted":false,
      |"queries":{
      |  "grep": 0.150,
      |  "q_slow": 10.000
      |},"total_pass2":104.0,"queries_pass2":{
      |  "grep": 0.125,
      |  "q_slow": 12.000
      |}}""".stripMargin

  private def block(floorText: String, results: Seq[(String, Double)],
      total: Double, passes: Int = 3): Option[String] =
    BenchFloor.block("BENCH_NOISE.json", floorText, results, total,
      passes, "abc123def456")

  test("floor is the min across passes, ratios divide by it") {
    val res = Seq("grep" -> 0.25, "q_slow" -> 10.0)
    val b = block(floorArtifact, res, 10.25)
    assert(b.isDefined)
    assert(b.get.contains(""""grep": 2.00"""), s"0.25/0.125 = 2.00:\n${b.get}")
    assert(b.get.contains(""""q_slow": 1.00"""), "10.0/min(10,12) = 1.00")
    // total 10.25 vs intersection floor 0.125+10.0 = 10.125
    assert(b.get.contains(""""total_ratio":1.012"""), b.get)
  }

  test("a floor artifact's own floor block is stripped before parsing") {
    // phase-A refreshed floors carry ratios keyed by query name; for
    // grep the ratio (1.45) is far above its seconds (0.125) — an
    // unstripped min() would survive, but a MAX-style consumer (or a
    // sub-second query whose ratio undercuts its seconds) would not
    val withFloor = floorArtifact.dropRight(1) +
      """,
        |"floor":{"path":"BENCH_NOISE.json","total_ratio":1.020,
        |"ratios":{
        |  "grep": 0.04,
        |  "q_slow": 0.98
        |}}}""".stripMargin
    val fm = BenchFloor.floorMin(withFloor)
    assert(fm("grep") == 0.125,
      "ratio 0.04 below the seconds must not become the floor")
    assert(fm("q_slow") == 10.0)
    assert(!fm.contains("total_ratio"))
  }

  test("parse is key-allowlisted: only queries/queries_passN maps count") {
    // r17 verdict #5: the old flat scan parsed EVERY numeric pair in
    // the artifact. A top-level field (or a provenance sub-object
    // field, as in BENCH_NOISE.json's merged_from) that collides with
    // a query name must not become that query's floor.
    val colliding =
      """{"metric":"total","value":50.0,
        |"grep": 0.001,
        |"merged_from":[{"path":"x.json","grep": 0.002,"pass_totals":[1.0]}],
        |"probe":{"pre_spin_s":0.50,"pre_fsync_ms":0.05},
        |"queries":{
        |  "grep": 0.150,
        |  "q_slow": 10.000
        |}}""".stripMargin
    val fm = BenchFloor.floorMin(colliding)
    assert(fm("grep") == 0.150,
      "top-level/provenance collisions must not undercut the floor")
    assert(fm("q_slow") == 10.0)
    assert(!fm.contains("value"), "totals are not queries")
    assert(!fm.contains("pre_spin_s"), "probe fields are not queries")
  }

  test("no shared queries -> no block (absent is honest)") {
    assert(block(floorArtifact, Seq("q_new_lane" -> 3.0), 3.0).isEmpty)
  }

  test("queries missing from the floor inflate total_ratio visibly") {
    // a query new to this tree has no floor entry: it appears in the
    // numerator total but not the intersection denominator — the
    // total_ratio rises instead of the query silently vanishing
    val res = Seq("grep" -> 0.125, "q_brand_new" -> 5.0)
    val b = block(floorArtifact, res, 5.125).get
    assert(b.contains(""""total_ratio":41.000"""), b)
    assert(!b.contains("q_brand_new"), "no per-query ratio without a floor")
  }

  test("zero floor entries are excluded, not divided by") {
    val zeroFloor =
      """{"queries":{
        |  "grep": 0.000,
        |  "q_slow": 10.000
        |}}""".stripMargin
    val b = block(zeroFloor, Seq("grep" -> 0.2, "q_slow" -> 10.0), 10.2).get
    assert(!b.contains(""""grep""""), "zero floor must not produce a ratio")
    assert(b.contains(""""q_slow": 1.00"""))
  }

  test("block stamps passes and the floor file's sha") {
    val b = block(floorArtifact, Seq("grep" -> 0.25), 0.25, passes = 3).get
    assert(b.contains(""""passes":3"""), b)
    assert(b.contains(""""sha256":"abc123def456""""), b)
    assert(!b.contains(""""caveat""""),
      "multi-pass blocks are steady-state — no caveat")
  }

  test("single-pass blocks self-label with the warm-state caveat") {
    // r17 verdict #3: a REPEAT=1 capture's min IS pass 1, which pays
    // warmup (q_bpe_apply read 8.58x in the single-pass driver capture
    // vs <=1.25 steady) — the block must say so rather than present
    // pass-1-vs-floor as steady-state-vs-floor
    val b = block(floorArtifact, Seq("grep" -> 0.25), 0.25, passes = 1).get
    assert(b.contains(""""passes":1"""), b)
    assert(b.contains(""""caveat":""""), b)
    assert(b.contains("single pass"), b)
  }
}
