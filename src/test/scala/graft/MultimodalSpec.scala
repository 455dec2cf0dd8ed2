package graft

import graft.ops.Multimodal

/** Multimodal plumbing: binary payload columns + stubbed per-partition
  * feature extraction must be deterministic and schema-stable.
  */
class MultimodalSpec extends SparkTestBase {

  test("extractFeatures is deterministic across runs") {
    val a = Multimodal.extractFeatures(spark, sfDir).collect()
      .sortBy(_.doc_id).map(f => (f.doc_id, f.byte_len, f.byte_sum_mod,
        f.head_hex, f.feat.toSeq))
    val b = Multimodal.extractFeatures(spark, sfDir).collect()
      .sortBy(_.doc_id).map(f => (f.doc_id, f.byte_len, f.byte_sum_mod,
        f.head_hex, f.feat.toSeq))
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    assert(a.forall(_._5.length == 8), "stub features are 8-dim")
  }

  test("resize stub: bounded output, deterministic, identity below target") {
    val big = Array.tabulate(1000)(i => (i % 251).toByte)
    val r1 = Multimodal.FakeDecoder.resize(big, 64)
    val r2 = Multimodal.FakeDecoder.resize(big, 64)
    assert(r1.length == 64 && r1.toSeq == r2.toSeq)
    val small = Array[Byte](1, 2, 3)
    assert(Multimodal.FakeDecoder.resize(small, 64).toSeq == small.toSeq)
  }

  test("payload byte length matches n_chars for the ascii corpus") {
    import org.apache.spark.sql.functions._
    val bad = Multimodal.binarize(spark, sfDir)
      .select(col("doc_id"), length(col("payload")).cast("long").as("bl"),
        col("meta.n_chars").as("nc"))
      .filter(col("bl") =!= col("nc"))
      .count()
    assert(bad == 0)
  }
}
