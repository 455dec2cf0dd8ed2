package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sim}

/** Semantic checks for dedup + similarity beyond oracle equality:
  * the LSH candidates must actually be the near-duplicates, and the
  * native Catalyst cosine must be indistinguishable from the
  * higher-order-function composition.
  */
class DedupSimSpec extends SparkTestBase {

  test("minhash candidates are high-Jaccard pairs (recall + precision)") {
    val mh = Dedup.qDedupMinhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val jc = Dedup.qDedupJaccard(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val hi = jc.filter(_._2 >= 0.6).keySet
    assert(hi.nonEmpty, "corpus should contain planted near-duplicates")
    assert((hi -- mh).isEmpty, s"minhash missed high-jaccard pairs: ${hi -- mh}")
    val falsePos = mh.filter(p => jc.getOrElse(p, 0.0) < 0.2)
    assert(falsePos.isEmpty, s"minhash false positives: $falsePos")
  }

  test("minhash band cap: no-op on the gate corpus, hot buckets dropped, cold pairs kept") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    def pairs(df: org.apache.spark.sql.DataFrame, cap: Long) =
      Dedup.minhashPairsOf(df, cap).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1. the gate corpus has no bucket above the cap: capped == exact
    val capped = pairs(docs, Dedup.MinhashBandCap)
    val exact = pairs(docs, Long.MaxValue)
    assert(capped == exact,
      "cap must not fire on the gate corpus (deepest bucket is 2 docs)")
    // 2. plant a hot bucket: 100 identical boilerplate docs share every
    //    band bucket (occupancy 100 > cap) — C(100,2)=4950 pairs uncapped
    val boiler = (100000L until 100100L).toDF("doc_id")
      .withColumn("text",
        lit("alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val mixed = docs.union(boiler.select(col("doc_id"), col("text")))
    val mixedUncapped = pairs(mixed, Long.MaxValue)
    assert(mixedUncapped.count { case (a, b) => a >= 100000L && b >= 100000L }
      == 100 * 99 / 2, "uncapped control must emit the full quadratic bucket")
    // 3. capped: the boilerplate bucket is dropped whole, and every pair
    //    between ORGANIC docs survives untouched (their buckets are cold)
    val mixedCapped = pairs(mixed, Dedup.MinhashBandCap)
    assert(!mixedCapped.exists { case (a, b) => a >= 100000L || b >= 100000L },
      "hot-bucket members must emit no pairs")
    assert(mixedCapped == capped,
      "cold-bucket pairs must be unaffected by the cap")
  }

  test("embed bucket cap: no-op on the gate corpus, replicated hot buckets dropped") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    def pairs(df: org.apache.spark.sql.DataFrame, cap: Long) =
      Dedup.embedPairsOf(df, 0.3, bucketCap = cap).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1. gate-scale occupancy (max 23 at sf0.1) is under the cap:
    //    capped == exact, bit-identically
    val capped = pairs(emb, Dedup.EmbedBucketCap)
    val exact = pairs(emb, Long.MaxValue)
    assert(capped == exact,
      "cap must not fire on the gate corpus (max occupancy 23 < 64)")
    // 2. plant the 100× failure in miniature: 100 identical copies of
    //    one vector share every table bucket (occupancy > cap), so the
    //    capped pipeline drops those buckets whole while every pair of
    //    ORGANIC vectors (cold buckets) survives untouched
    val baseRow = emb.orderBy("vec_id").limit(1).collect()(0)
    val baseId = baseRow.getLong(0)
    val base = baseRow.getSeq[Float](1).toArray
    val copies = (1000000L until 1000100L).toDF("vec_id")
      .withColumn("embedding", typedLit(base))
    val mixed = emb.union(copies.select(col("vec_id"), col("embedding")))
    val mixedUncapped = pairs(mixed, Long.MaxValue)
    assert(mixedUncapped.count { case (a, b) => a >= 1000000L && b >= 1000000L }
      == 100 * 99 / 2, "uncapped control must emit the full quadratic bucket")
    val mixedCapped = pairs(mixed, Dedup.EmbedBucketCap)
    assert(!mixedCapped.exists { case (a, b) => a >= 1000000L || b >= 1000000L },
      "hot-bucket members must emit no pairs")
    // collateral is confined to the replicated vector itself: ITS
    // buckets all went hot (it sits with its copies), so its own pairs
    // drop — boilerplate semantics — but no other organic pair moves
    assert((mixedCapped -- capped).isEmpty, "cap must not invent pairs")
    assert((capped -- mixedCapped).forall { case (a, b) =>
      a == baseId || b == baseId },
      "only the replicated vector's own pairs may drop")
  }

  test("native cosine expression == declarative zip_with/aggregate") {
    val a = Sim.qSimTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Sim.qSimTopKNative(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("cosine_sim: unit vectors, orthogonal, zero-norm null") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),   // identical -> 1.0
      (Array(1f, 0f), Array(0f, 1f)),   // orthogonal -> 0.0
      (Array(0f, 0f), Array(1f, 2f)),   // zero norm -> null
      (Array(3f, 4f), Array(3f, 4f)))   // identical -> 1.0
      .toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("c"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).contains(1.0))
    assert(got(1).contains(0.0))
    assert(got(2).isEmpty)
    assert(got(3).exists(v => math.abs(v - 1.0) < 1e-12))
  }

  test("lsh topk is a subset-ranking of brute-force ranking") {
    val brute = Sim.qSimTopK(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Sim.qSimLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // every LSH hit that also appears in the brute-force top-10 must
    // carry the identical score
    lsh.foreach { case (id, c) =>
      brute.get(id).foreach(bc => assert(bc == c, s"score mismatch for $id"))
    }
  }

  test("candidate verification == full jaccard restricted to candidates") {
    // The scale path (score only LSH candidates) must agree exactly with
    // the inverted-index pipeline on the pairs both can see: same shingle
    // recipe, same |A∩B|/|A∪B| arithmetic, just a different join shape.
    val cand = Dedup.minhashPairsOf(graft.Tables.documents(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.jaccardPairs(spark, sfDir, 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val verified = Dedup.qDedupVerify(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(verified.nonEmpty, "corpus should contain verified near-dups")
    assert(verified.keySet.subsetOf(cand),
      "verification must only score candidate pairs")
    val expected = full.filter { case (p, _) => cand(p) }
    assert(verified == expected,
      s"mismatch: only-verified=${verified.keySet -- expected.keySet} " +
        s"only-full=${expected.keySet -- verified.keySet}")
  }

  test("ivf: deterministic, scores exact, results from probed clusters only") {
    val a = Sim.qSimIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Sim.qSimIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b, "IVF result must be deterministic (fixed KMeans seed)")
    assert(a.nonEmpty && a.size <= 10)
    // every IVF score must equal the brute-force cosine for that id
    val brute = Sim.qSimTopK(spark, sfDir).limit(10)
    val all = graft.Tables.embeddings(spark, sfDir).count()
    val bruteScores = {
      // recompute all-pairs scores for the query the same way
      import org.apache.spark.sql.functions._
      val e = graft.Tables.embeddings(spark, sfDir)
        .withColumn("nrm", Sim.normExpr(col("embedding")))
      val q = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm")))
      e.filter(col("vec_id") =!= 0).crossJoin(q)
        .select(col("vec_id"),
          round(Sim.cosineFromParts(col("embedding"), col("q_emb"),
            col("nrm"), col("q_nrm")), 6).as("c"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    a.foreach { case (id, s) =>
      assert(bruteScores(id) == s, s"IVF score for $id differs from exact")
    }
    assert(all > 0 && brute.count() == 10)
    // the learned-codebook twin obeys the same contract
    val km = Sim.ivfKmeansTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(km.nonEmpty && km.size <= 10)
    km.foreach { case (id, s) =>
      assert(bruteScores(id) == s, s"KMeans-IVF score for $id differs from exact")
    }
    // and the gated recall wrapper reports full size + recall over tau
    val recall = Sim.qSimIvfKmeans(spark, sfDir).collect()
    assert(recall.length == 1)
    assert(recall(0).getLong(0) == 10L && recall(0).getBoolean(1))
  }

  test("simhash groups only docs with identical 16-bit signatures") {
    val groups = Dedup.qDedupSimhash(spark, sfDir).collect()
    groups.foreach { r =>
      assert(r.getString(0).length == 16)
      assert(r.getString(0).forall(c => c == '0' || c == '1'))
      assert(r.getLong(1) > 1)
    }
  }

  test("exact dedup: n_unique <= n_docs per source") {
    Dedup.qDedupExact(spark, sfDir).collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("LSH guarantee: exact duplicates are ALWAYS minhash candidates") {
    // J=1 pairs have identical signatures, so every band matches — the
    // one deterministic promise banded LSH makes. Clone 10 docs with
    // fresh ids and assert each (orig, clone) pair surfaces.
    import org.apache.spark.sql.functions._
    val base = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 10 && size(split(col("text"), " ", -1)) >= 3)
    val offset = 100000L
    val cloned = base.withColumn("doc_id", col("doc_id") + offset)
    val pairs = Dedup.minhashPairsOf(base.unionByName(cloned))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = base.select("doc_id").collect().map(_.getLong(0))
      .map(id => (id, id + offset)).toSet
    assert(expected.nonEmpty)
    val missing = expected -- pairs
    assert(missing.isEmpty, s"duplicate pairs not surfaced: $missing")
  }
}
