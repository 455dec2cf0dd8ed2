package graft

import graft.ops.{Sim, Sim2}

/** Semantic checks for the batch-ANN and quantization lane beyond oracle
  * equality: the batch formulation must agree with the proven single-query
  * path, IVF must be a subset-ranking of brute force per query, and int8
  * codes must reconstruct to near-perfect cosine fidelity.
  */
class Sim2Spec extends SparkTestBase {

  private def grouped(rows: Array[org.apache.spark.sql.Row])
    : Map[Long, Seq[(Int, Long, Double)]] =
    rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
      .map { case (q, rs) =>
        q -> rs.map(t => (t._2, t._3, t._4)).sortBy(_._1).toSeq
      }

  test("native ivf_nearest == declarative HOF argmin/top-n over the codebook") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, sfDir)
    val cb = broadcast(Sim2.labelCentroids(e)
      .agg(array_sort(collect_list(struct(col("c_label"), col("centroid"))))
        .as("cb")))
    // the declarative form ivf_nearest replaces: per-row (d, label)
    // structs over the codebook, sorted by (d asc, label asc)
    val dlist = expr(
      """array_sort(transform(cb, c -> struct(
        |  aggregate(zip_with(embedding, c.centroid,
        |    (x, cc) -> (CAST(x AS DOUBLE) - cc) * (CAST(x AS DOUBLE) - cc)),
        |    0.0D, (acc, v) -> acc + v) AS d,
        |  c.c_label AS l)))""".stripMargin)
    for (n <- Seq(1, 3, 5)) {
      val cmp = e.crossJoin(cb)
        .select(col("vec_id"),
          expr(s"ivf_nearest(embedding, cb, $n)").as("native"),
          slice(transform(dlist, s => s.getField("l")), 1, n).as("hof"))
        .filter(not(col("native") === col("hof")))
      assert(cmp.count() == 0, s"ivf_nearest(n=$n) diverged from HOF form")
    }
  }

  test("batch top-k: every query gets ranks 1..3 with non-increasing scores") {
    val byQ = grouped(Sim2.qSimBatchTopK(spark, sfDir).collect())
    val expectQ = Tables.embeddings(spark, sfDir)
      .filter("vec_id % 100 = 0").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(byQ.keySet == expectQ, "one result group per query vector")
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._1) == Seq(1, 2, 3), s"ranks for q=$q")
      assert(rs.sliding(2).forall { case Seq(a, b) => a._3 >= b._3 },
        s"scores must be non-increasing for q=$q")
      rs.foreach { case (_, vid, _) =>
        assert(vid % 100 != 0, "corpus must exclude the query set")
      }
    }
  }

  test("batch top-k for q=0 agrees with the single-query brute-force path") {
    val batch = grouped(Sim2.qSimBatchTopK(spark, sfDir).collect())(0L)
      .map { case (_, vid, cos) => (vid, cos) }
    // qSimTopK excludes only vec_id 0; restrict to the batch corpus
    val brute = Sim.qSimTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .filter(_._1 % 100 != 0).take(3).toSeq
    assert(batch == brute)
  }

  test("batch IVF is a subset-ranking of batch brute force per query") {
    val brute = grouped(Sim2.qSimBatchTopK(spark, sfDir).collect())
    val ivf = grouped(Sim2.qSimBatchIvf(spark, sfDir).collect())
    assert(ivf.keySet == brute.keySet, "IVF must answer every query")
    ivf.foreach { case (q, rs) =>
      assert(rs.map(_._1) == Seq(1, 2, 3), s"ranks for q=$q")
      assert(rs.sliding(2).forall { case Seq(a, b) => a._3 >= b._3 })
      // IVF scores the same metric: any (q, vec) also in the brute top-3
      // must carry the identical score, and nothing can beat brute rank 1
      val bruteMap = brute(q).map { case (_, v, c) => v -> c }.toMap
      rs.foreach { case (_, vid, cos) =>
        bruteMap.get(vid).foreach(bc => assert(bc == cos))
        assert(cos <= brute(q).head._3, s"IVF cannot beat brute rank-1 for q=$q")
      }
    }
  }

  test("int8 quantization: near-perfect cosine fidelity, bounded error") {
    val rows = Sim2.qSimQuantize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 500)
    rows.foreach { case (vid, fid, err) =>
      assert(fid > 0.999, s"fidelity for vec $vid: $fid")
      assert(err >= 0.0 && err < 0.01, s"max_abs_err for vec $vid: $err")
    }
  }
}
