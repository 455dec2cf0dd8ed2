package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the floor-merge provenance guards (r17 verdict #1 + ADVICE) by
  * driving the actual tools the gate runs (`tools/floor_merge.py`,
  * `tools/bench_artifact.py`) against fixtures. The min-merged floor is
  * the denominator of every official-vs-floor ratio; the r17
  * implementation DEFAULTED a missing git head to the current
  * checkout's, which made the same-tree refusal vacuous for exactly
  * the artifacts most likely to be cross-tree and fabricated
  * provenance in merged_from. These tests are the refusal-path
  * coverage the verdict's done-criterion names.
  */
class FloorMergeSpec extends AnyFunSuite {

  private val repoRoot = new java.io.File(".").getCanonicalFile

  private def python3Available: Boolean =
    try {
      new ProcessBuilder("python3", "--version").start().waitFor() == 0
    } catch { case _: Throwable => false }

  /** (exitCode, combined stdout+stderr) */
  private def run(args: String*): (Int, String) = {
    val pb = new ProcessBuilder(("python3" +: args): _*)
      .directory(repoRoot).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    (p.waitFor(), out)
  }

  private def tmpDir(): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-floor-merge")
    d.toFile.deleteOnExit()
    d
  }

  private def write(dir: java.nio.file.Path, name: String,
      text: String): String = {
    val p = dir.resolve(name)
    java.nio.file.Files.write(p,
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    p.toString
  }

  /** A minimal Bench-shaped artifact; identity fields are opt-in so
    * each test controls exactly what provenance exists.
    */
  private def artifact(queries: Map[String, Double],
      pass2: Map[String, Double] = Map.empty,
      head: Option[String] = None, sha: Option[String] = None,
      hostState: Option[String] = None,
      drifted: Option[Boolean] = None,
      floorBlock: String = ""): String = {
    def m(vs: Map[String, Double]) = vs.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""  "$k": $v""" }.mkString("{\n", ",\n", "\n}")
    val idFields =
      head.map(h => s""""git_head":"$h",""").getOrElse("") +
        sha.map(s => s""""timed_path_sha":"$s",""").getOrElse("") +
        hostState.map(s => s""""host_state":"$s",""").getOrElse("") +
        drifted.map(b => s""""drifted":$b,""").getOrElse("")
    val p2 =
      if (pass2.isEmpty) ""
      else s""","total_pass2":${pass2.values.sum},"queries_pass2":${m(pass2)}"""
    s"""{"metric":"total","value":${queries.values.sum},"unit":"sec","sf":"/tmp/x",
       |"skipped":[],"failed":[],
       |"probe":{"pre_spin_s":0.48,"pre_fsync_ms":0.20,"post_spin_s":0.49,"post_fsync_ms":0.25},
       |$idFields
       |"queries":${m(queries)}$p2$floorBlock}""".stripMargin
  }

  test("refuses a capture with no recorded identity (never defaults)") {
    assume(python3Available)
    val d = tmpDir()
    val floor = write(d, "floor.json",
      artifact(Map("grep" -> 0.2), head = Some("abc1234")))
    val cap = write(d, "cap.json", artifact(Map("grep" -> 0.1)))
    val (rc, out) = run("tools/floor_merge.py", floor, cap)
    assert(rc != 0, out)
    assert(out.contains("refusing") && out.contains("pre-stamp era"), out)
    // and the floor file is untouched
    assert(scala.io.Source.fromFile(floor).mkString.contains("0.2"))
  }

  test("refuses a -dirty head: its code is not any commit's") {
    assume(python3Available)
    val d = tmpDir()
    val floor = write(d, "floor.json",
      artifact(Map("grep" -> 0.2), head = Some("abc1234")))
    val cap = write(d, "cap.json",
      artifact(Map("grep" -> 0.1), head = Some("abc1234-dirty")))
    val (rc, out) = run("tools/floor_merge.py", floor, cap)
    assert(rc != 0 && out.contains("dirty"), out)
  }

  test("refuses a head mismatch without --allow-cross-tree") {
    assume(python3Available)
    val d = tmpDir()
    val floor = write(d, "floor.json",
      artifact(Map("grep" -> 0.2), head = Some("abc1234")))
    val cap = write(d, "cap.json",
      artifact(Map("grep" -> 0.1), head = Some("def5678")))
    val (rc, out) = run("tools/floor_merge.py", floor, cap)
    assert(rc != 0 && out.contains("def5678"), out)
  }

  test("timed_path_sha equality merges across different commit heads") {
    assume(python3Available)
    // the content hash is the real same-tree invariant: docs-only
    // commits move git_head without touching the timed path
    val d = tmpDir()
    val floor = write(d, "floor.json", artifact(Map("grep" -> 0.2),
      head = Some("abc1234"), sha = Some("feedbeef1234")))
    val cap = write(d, "cap.json", artifact(Map("grep" -> 0.1),
      head = Some("def5678"), sha = Some("feedbeef1234")))
    val (rc, out) = run("tools/floor_merge.py", floor, cap)
    assert(rc == 0, out)
    val merged = ujsonish(scala.io.Source.fromFile(floor).mkString)
    assert(merged.contains(""""grep": 0.1"""), merged)
  }

  test("--allow-cross-tree records 'unknown', never the merge-time head") {
    assume(python3Available)
    val d = tmpDir()
    val floor = write(d, "floor.json",
      artifact(Map("grep" -> 0.2), head = Some("abc1234")))
    val cap = write(d, "cap.json",
      artifact(Map("grep" -> 0.1, "q_new" -> 5.0)))
    val (rc, out) = run("tools/floor_merge.py", floor, cap,
      "--allow-cross-tree")
    assert(rc == 0, out)
    val merged = scala.io.Source.fromFile(floor).mkString
    // this repo's real current head must appear NOWHERE in provenance
    val realHead = {
      val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD")
        .directory(repoRoot).start()
      val h = new String(p.getInputStream.readAllBytes()).trim
      p.waitFor(); h
    }
    assert(!merged.contains(realHead),
      s"fabricated provenance: merge-time head $realHead in floor")
    assert(merged.contains("\"unknown\""), merged)
    // min-merge semantics: lowered entry + new entry + composite total
    assert(merged.contains(""""grep": 0.1"""))
    assert(merged.contains(""""q_new": 5.0"""))
  }

  test("restamp-floor re-emits the block against the merged floor") {
    assume(python3Available)
    val d = tmpDir()
    val floorText = artifact(Map("grep" -> 0.1, "q_slow" -> 5.0),
      head = Some("abc1234"))
    val floor = write(d, "floor.json", floorText)
    // a 2-pass capture whose embedded block is stale on purpose
    val staleBlock =
      """,
        |"floor":{"path":"old.json","sha256":"000000000000","passes":2,
        |"total_ratio":0.500,
        |"ratios":{
        |  "grep": 0.50
        |}}""".stripMargin
    val cap = write(d, "cap.json", artifact(
      Map("grep" -> 0.2, "q_slow" -> 10.0),
      pass2 = Map("grep" -> 0.3, "q_slow" -> 11.0),
      head = Some("abc1234"), floorBlock = staleBlock))
    val before = scala.io.Source.fromFile(cap).mkString
    val (rc, out) = run("tools/bench_artifact.py", "restamp-floor",
      "--floor", floor, cap)
    assert(rc == 0, out)
    val after = scala.io.Source.fromFile(cap).mkString
    // measurement bytes preserved: everything before the floor block
    val prefix = before.substring(0, before.lastIndexOf(",\n\"floor\":{"))
    assert(after.startsWith(prefix), "measurements must be byte-preserved")
    // steady mins 0.2 + 10.0 vs floor 0.1 + 5.0 -> 2.000
    assert(after.contains(""""total_ratio":2.000"""), after)
    assert(after.contains(""""restamped":true"""), after)
    assert(after.contains(""""passes":2"""), after)
    assert(!after.contains("000000000000"), "stale sha replaced")
    // still valid JSON for every downstream loader
    val (rc2, _) = run("-c", s"import json; json.load(open('$cap'))")
    assert(rc2 == 0)
  }

  test("state: tri-state wins, boolean falls back with old semantics") {
    assume(python3Available)
    val d = tmpDir()
    val amb = write(d, "a.json", artifact(Map("g" -> 1.0),
      hostState = Some("ambient"), drifted = Some(true)))
    val oldQuiet = write(d, "q.json", artifact(Map("g" -> 1.0),
      drifted = Some(false)))
    val oldDrift = write(d, "dr.json", artifact(Map("g" -> 1.0),
      drifted = Some(true)))
    val unstamped = write(d, "u.json", artifact(Map("g" -> 1.0)))
    assert(run("tools/bench_artifact.py", "state", amb)._2.trim == "ambient")
    assert(run("tools/bench_artifact.py", "state", oldQuiet)._2.trim == "quiet")
    assert(run("tools/bench_artifact.py", "state", oldDrift)._2.trim == "drifted")
    assert(run("tools/bench_artifact.py", "state", unstamped)._2.trim == "drifted",
      "an unlabeled window must never read better than drifted")
  }

  test("median-total is the representative official statistic, not min") {
    assume(python3Available)
    val d = tmpDir()
    val cap = write(d, "c.json",
      """{"value":100.0,"total_pass2":120.0,"total_pass3":89.0,
        |"queries":{"g": 100.0}}""".stripMargin)
    assert(run("tools/bench_artifact.py", "median-total", cap)._2.trim
      .toDouble == 100.0)
    assert(run("tools/bench_artifact.py", "min-total", cap)._2.trim
      .toDouble == 89.0)
  }

  test("label splices a top-level field and keeps the JSON loadable") {
    assume(python3Available)
    val d = tmpDir()
    val cap = write(d, "c.json", artifact(Map("g" -> 1.0),
      head = Some("abc1234"),
      floorBlock = """,
        |"floor":{"path":"f.json","sha256":"aaaaaaaaaaaa","passes":3,
        |"total_ratio":1.000,
        |"ratios":{
        |  "g": 1.00
        |}}""".stripMargin))
    val (rc, out) = run("tools/bench_artifact.py", "label", cap,
      "gate_selection", "best-of-2 by state rank then median pass total")
    assert(rc == 0, out)
    val text = scala.io.Source.fromFile(cap).mkString
    assert(text.contains(""""gate_selection":"best-of-2"""), text)
    assert(text.indexOf("gate_selection") < text.indexOf("\"floor\":{"),
      "label must precede the floor block so stripFloorBlock keeps it")
    val (rc2, _) = run("-c", s"import json; json.load(open('$cap'))")
    assert(rc2 == 0)
  }

  /** Normalizes python's json.dump(indent=0) output enough to assert
    * on `"k": v` pairs regardless of spacing.
    */
  private def ujsonish(text: String): String =
    text.replaceAll(":\\s+", ": ")
}
