package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** Semantic checks for the BPE merge loop beyond oracle equality: the
  * greedy leftmost non-overlapping merge rule and the deterministic
  * (count desc, pair asc) selection are pinned on hand-computable
  * corpora, plus a plain-Scala model replay on the gate corpus slice.
  */
class BpeSpec extends SparkTestBase {

  private def merges(texts: Seq[String], k: Int): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Bpe.bpeMergesOf(docs, k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
  }

  test("overlapping run merges leftmost-first, non-overlapping") {
    // "a a a a": pair (a,a) occurs 3 times (overlapping); the greedy
    // rule merges positions 1 and 3 -> "(a a) (a a)", so iteration 2
    // sees exactly one ("a a","a a") pair.
    val got = merges(Seq("a a a a"), 2)
    assert(got == Seq((1L, "a", "a", 3L), (2L, "a a", "a a", 1L)))
  }

  test("tie on count breaks by lexicographic pair") {
    // "b c" and "a d" both occur once -> (a,d) wins the tie
    val got = merges(Seq("b c", "a d"), 1)
    assert(got == Seq((1L, "a", "d", 1L)))
  }

  test("merged symbols participate in later iterations") {
    // "x y z x y z x y": (x,y) x3 wins; then ("x y", z) x2; then
    // ("x y z", "x y z")? no -- after merge 2 the stream is
    // "(x y z) (x y z) (x y)": pairs ((x y z),(x y z)) x1,
    // ((x y z),(x y)) x1 -> tie, lexicographic: "x y z","x y" then
    // "x y z","x y z"; '(space) < z' so "x y z","x y" sorts first...
    // pin the exact sequence the rule produces:
    val got = merges(Seq("x y z x y z x y"), 3)
    assert(got.take(2) == Seq((1L, "x", "y", 3L), (2L, "x y", "z", 2L)))
    // iteration 3: both remaining pairs have count 1; "x y z" < "x y z"
    // is false, compare "x y" vs "x y z": "x y" < "x y z" lexicographically,
    // so the winner is ("x y z", "x y") ... b-key compares after a-key:
    // pairs are ("x y z","x y z") and ("x y z","x y"); a equal, b: "x y" < "x y z"
    assert(got(2) == (3L, "x y z", "x y", 1L))
  }

  test("apply reports hand-computable compression") {
    import spark.implicits._
    // "a a a a" under k=2: iter1 merges (a,a) -> [(a a), (a a)];
    // iter2 merges ((a a),(a a)) -> one symbol. 4 tokens -> 1.
    val docs = Seq((0L, "a a a a", "s0")).toDF("doc_id", "text", "source")
    val got = Bpe.bpeApplyOf(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(("s0", 1L, 4L, 1L, 0.25)))
  }

  test("apply consumes a shipped merge table — no retraining on the target") {
    import spark.implicits._
    // Train on corpus A (argmax pair is (a,a)), apply to corpus B where
    // retraining would instead pick (b,b). If apply honored the shipped
    // table, only (a,a) merges: "b b a a b" -> 5 tokens becomes 4.
    val trainDocs = Seq((0L, "a a a a")).toDF("doc_id", "text")
    val table = Bpe.bpeMergesOf(trainDocs, 1).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(table == Seq(("a", "a")))
    val target = Seq((0L, "b b a a b", "t0"), (1L, "b b b b", "t1"))
      .toDF("doc_id", "text", "source")
    val got = Bpe.bpeApply(target, table).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    // t0: (a,a) merges once (5 -> 4); t1: no (a,a) at all (4 -> 4) —
    // a retrained table would have merged (b,b) and shrunk t1.
    assert(got == Seq(("t0", 5L, 4L), ("t1", 4L, 4L)))
  }

  // Loop-cost note (round 8): before linearization, bpeMergesOf rebuilt
  // its whole rewrite lineage per iteration — each pair-count job re-ran
  // all previous regexp rewrites from the scan (O(k²) corpus passes;
  // 13.9 s for q_bpe_merges alone at sf0.1 k=5 in BENCH_r06). With the
  // eager localCheckpoint per iteration the loop is 2 narrow passes per
  // merge; measured after: see SCALE.md's BPE section and the k-sweep
  // ScaleProbe row (flat per-iteration cost through k=50).

  test("plain-Scala model replay on the sf0.001 corpus") {
    // replay the loop in-memory: tokenize, then k rounds of pair-count /
    // argmax / greedy merge, and require the distributed merge table to
    // match the model exactly
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    var seqs: Seq[Vector[String]] = texts.map(_._2.toLowerCase
      .split(" ", -1).filter(_.nonEmpty).toVector).toSeq
    val want = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (i <- 1 to Bpe.BpeIterations) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { s =>
        s.iterator.zip(s.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + 1L
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        want += ((i.toLong, a, b, c))
        seqs = seqs.map { s =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < s.length) {
            if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
              out += s"$a $b"; j += 2
            } else { out += s(j); j += 1 }
          }
          out.result()
        }
      }
    }
    val got = Bpe.qBpeMerges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == want.toSeq)
  }
}
