package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curate, Embed}

/** Curation composite + negative sampling semantics. */
class CurateSpec extends SparkTestBase {

  test("curate: split audit partitions the survivor count") {
    val audit = Curate.qCorpusCurate(spark, sfDir).collect()
    val splits = audit.map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    val total = audit.map(_.getLong(1)).sum
    // recompute survivors directly from the stage operators
    val docs = Tables.documents(spark, sfDir)
    val q = graft.ops.Text.qualityOf(docs).filter(col("keep"))
      .select("doc_id")
    val x = docs.withColumn("fp", graft.ops.Dedup.exactFp(col("text")))
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val s = Embed.semanticDedup(Tables.embeddings(spark, sfDir),
        Embed.SemanticTau)
      .filter(!col("kept")).select(col("vec_id").as("doc_id"))
    val want = docs.join(q, Seq("doc_id"), "left_semi")
      .join(x, Seq("doc_id"), "left_semi")
      .join(s, Seq("doc_id"), "left_anti").count()
    assert(total == want && total > 0)
    // train must dominate under the 90/5/5 rule
    val byS = audit.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.getOrElse("train", 0L) > byS.getOrElse("val", 0L))
  }

  test("negative sample: k per anchor, never same label, deterministic") {
    val got = Embed.qNegativeSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (a, n, _) =>
      assert(labels(a) != labels(n), s"anchor $a drew same-label $n")
      assert(a != n)
    }
    // per-anchor ranks are 1..k with no repeats
    got.groupBy(_._1).foreach { case (a, rows) =>
      val rnks = rows.map(_._3).sorted.toList
      assert(rnks == (1 to rnks.length).toList, s"anchor $a ranks $rnks")
      assert(rnks.length <= 5)
    }
    // rerun is bit-identical (pure hash draw, no RNG)
    val again = Embed.qNegativeSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == again.toSeq)
  }
}
