package graft

import org.apache.spark.sql.functions._

/** The user-facing façade works end-to-end on plain frames — the
  * "switch from the reference to this library" path.
  */
class GraftApiSpec extends SparkTestBase {

  test("Graft.mr.wordCount over ad-hoc lines") {
    import spark.implicits._
    val got = Graft.mr.wordCount(Seq("a b", "b [c]").toDF("value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 2L, "c" -> 1L, "" -> 2L))
  }

  test("Graft.dedup candidates -> resolve composes") {
    val docs = Tables.documents(spark, sfDir)
    val pairs = Graft.dedup.minhashCandidates(docs)
    val resolved = Graft.dedup.resolveComponents(spark, pairs)
    assert(resolved.columns.toSeq == Seq("doc_id", "canonical_id"))
    resolved.collect().foreach(r => assert(r.getLong(1) <= r.getLong(0)))
  }

  test("Graft.sim.cosine column == native query scores") {
    val e = Tables.embeddings(spark, sfDir).limit(5)
    val self = e.select(
      Graft.sim.cosine(spark, col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    self.foreach(c => assert(math.abs(c - 1.0) < 1e-9,
      s"self-cosine should be 1.0, got $c"))
  }

  test("Graft.text lane runs on an ad-hoc corpus") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox and the lazy dog", "web"),
        (2L, "to be or not to be is the question of it", "web"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    assert(Graft.text.quality(docs).count() == 2)
    assert(Graft.text.langId(docs).collect().forall(_.getString(1) == "en"))
    assert(Graft.text.fingerprint(docs).select("fp").distinct().count() == 2)
    assert(Graft.text.chunks(docs).count() == 2) // one chunk per short doc
    assert(Graft.text.repetition(docs).count() == 2)
  }

  test("Graft.events.asofJoin on ad-hoc frames") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (2L, 10L, 200L)).toDF("id", "k", "t")
    val r = Seq((10L, 150L, 7L)).toDF("rk", "rt", "pid")
    val got = Graft.events.asofJoin(l, r, "k", "t", "id",
        "rk", "rt", "pid", "pid", "last_pid")
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
    assert(got == Map(1L -> -1L, 2L -> 7L))
  }
}
