package graft

import org.apache.spark.sql.functions._

import graft.ops.Embed

/** Embedding transforms: JL random projection and cluster-scoped
  * semantic dedup. Specs pin semantics (norm preservation, keep rule);
  * the gate pins engine-exactness vs DuckDB.
  */
class EmbedSpec extends SparkTestBase {

  test("random projection: sign matrix is ±1 and balanced-ish") {
    val flat = Embed.signs.flatten
    assert(flat.forall(s => s == 1 || s == -1))
    val pos = flat.count(_ == 1)
    // md5-derived bits: both signs must actually occur in quantity
    assert(pos > flat.length / 4 && pos < 3 * flat.length / 4)
  }

  test("random projection: JL roughly preserves squared norms on average") {
    val proj = Embed.qRandomProjection(spark, sfDir)
    val yCols = (0 until Embed.ProjDim).map(j => col(s"y$j") * col(s"y$j"))
    val projNorm = proj.select(yCols.reduce(_ + _).as("n2"))
      .agg(avg("n2")).head().getDouble(0)
    val origNorm = Tables.embeddings(spark, sfDir)
      .select(expr(
        "aggregate(embedding, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * x)")
        .as("n2"))
      .agg(avg("n2")).head().getDouble(0)
    // E[||y||^2] = ||x||^2 for Rademacher/sqrt(k); sampling error only
    assert(math.abs(projNorm - origNorm) / origNorm < 0.25,
      s"projected $projNorm vs original $origNorm")
  }

  test("random projection matches a driver-side matrix multiply") {
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val want = rows.map { case (id, x) =>
      id -> (0 until Embed.ProjDim).map { j =>
        val s = (0 until Embed.Dim)
          .foldLeft(0.0)((acc, i) => acc + x(i).toDouble * Embed.signs(j)(i))
        BigDecimal(s / math.sqrt(Embed.ProjDim.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toList
    }.toMap
    val got = Embed.qRandomProjection(spark, sfDir).collect().map { r =>
      r.getLong(0) -> (1 to Embed.ProjDim).map(r.getDouble).toList
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, ys) =>
      ys.zip(want(id)).zipWithIndex.foreach { case ((g, w), j) =>
        assert(math.abs(g - w) < 1e-9, s"vec $id dim $j: $g vs $w")
      }
    }
  }

  test("semantic dedup: drop rule is 'has a lower-id cluster-mate above tau'") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (0 until a.length).foreach { i =>
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = emb.map { case (id, lab, e) =>
      val dup = emb.exists { case (id2, lab2, e2) =>
        lab2 == lab && id2 < id &&
          BigDecimal(cos(e2, e)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble >= Embed.SemanticTau
      }
      id -> !dup
    }.toMap
    val got = Embed.qDedupSemantic(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == want)
    assert(got.values.exists(identity), "someone must be kept")
  }

  test("unigram LM: gibberish scores below corpus-typical text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the the the the quick quick brown brown"),
      (3L, "zxqv wvut qqqq jjjj kkkk xxxx yyyy zzzz")
    ).toDF("doc_id", "text")
    val scores = graft.ops.Text2.unigramLmScores(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 2 repeats frequent tokens -> highest avg logp; doc 3 is all
    // singletons -> lowest
    assert(scores(2L) > scores(1L))
    assert(scores(1L) > scores(3L))
  }
}
