package graft

import org.scalacheck.Gen

/** Generative model check for the custom as-of join plan node: on random
  * event sets, every left row's picked-up payload must equal the
  * brute-force "latest right row at-or-before my time for my key, ties
  * by (time, tie asc) with right-before-left at equal times" — i.e.
  * max by (time, tie) among right rows with time <= left time.
  */
class AsOfJoinPropsSpec extends SparkTestBase {

  private case class Ev(id: Long, key: Long, t: Long)

  private val evGen: Gen[List[(Long, Long)]] = Gen.listOfN(60,
    for {
      key <- Gen.choose(0L, 4L)
      t <- Gen.choose(0L, 50L) // small range forces time collisions
    } yield (key, t))

  test("AsOfJoin payload == brute-force model on generated event sets") {
    import spark.implicits._
    var seed = org.scalacheck.rng.Seed(7L)
    (1 to 10).foreach { _ =>
      val raw = evGen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      val evs = raw.zipWithIndex.map { case ((k, t), i) => Ev(i.toLong, k, t) }
      val (rights, lefts) = evs.partition(_.id % 2 == 0)

      val leftDf = lefts.map(e => (e.id, e.key, e.t))
        .toDF("event_id", "user_id", "ts_sec")
      val rightDf = rights.map(e => (e.key, e.t, e.id))
        .toDF("p_user", "p_ts", "p_id")
      val got = graft.plans.AsOfJoin(leftDf, rightDf,
          key = "user_id", leftTime = "ts_sec", leftTie = "event_id",
          rightKey = "p_user", rightTime = "p_ts", rightTie = "p_id",
          payload = "p_id", outCol = "last_p")
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

      lefts.foreach { l =>
        val expected = rights
          .filter(r => r.key == l.key && r.t <= l.t)
          .sortBy(r => (r.t, r.id)).lastOption.map(_.id)
        assert(got(l.id) == expected,
          s"left ${l.id} (key=${l.key}, t=${l.t}): got ${got(l.id)}, " +
            s"expected $expected")
      }
    }
  }

  test("chunker invariants on generated corpora") {
    import spark.implicits._
    var seed = org.scalacheck.rng.Seed(11L)
    val wordGen = Gen.listOfN(40, Gen.choose(1, 90))
    (1 to 10).foreach { _ =>
      val sizes = wordGen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      val docs = sizes.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(j => s"w$j").mkString(" "))
      }.toDF("doc_id", "text")
      val chunks = graft.ops.Text.chunksOf(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val byDoc = chunks.groupBy(_._1)
      sizes.zipWithIndex.foreach { case (n, i) =>
        val cs = byDoc.getOrElse(i.toLong, Array.empty).sortBy(_._2)
        // chunk_idx is dense from 0; every doc has at least one chunk
        assert(cs.nonEmpty && cs.map(_._2).toSeq == cs.indices.map(_.toLong))
        // full chunks are 32 tokens; only a sole chunk may be shorter
        cs.foreach { case (_, idx, len) =>
          if (cs.length > 1) assert(len == 32L)
          else assert(len == math.min(n, 32).toLong)
        }
        // stride-24 chunks cover the prefix and never pass the doc end
        val lastStart = 1 + (cs.length - 1) * 24
        assert(lastStart + cs.last._3 - 1 <= n)
      }
    }
  }
}
