package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generative checks for the robust-statistics lane on ARBITRARY
  * 2-decimal data (the gate pins engine-vs-engine on the fixtures;
  * these pin the math on adversarial inputs: ties, tiny groups,
  * all-equal values).
  */
class RobustPropsSpec extends SparkTestBase {

  // 2-decimal money values incl. heavy ties and clusters
  private val valGen: Gen[BigDecimal] = Gen.oneOf(
    Gen.choose(0L, 200L).map(c => BigDecimal(c) / 100),        // dense ties
    Gen.choose(0L, 5000000L).map(c => BigDecimal(c) / 100))    // wide
  private val groupGen: Gen[(String, List[BigDecimal])] = for {
    g <- Gen.oneOf("a", "b", "c")
    n <- Gen.choose(1, 400)
    vs <- Gen.listOfN(n, valGen)
  } yield (g, vs.map(_.setScale(2)))

  test("winsorize: thresholds are the ceil(p*n/100) order statistics on random data") {
    import spark.implicits._
    val data = Gen.listOfN(3, groupGen).sample.getOrElse(Nil)
      .flatMap { case (g, vs) => vs.map(g -> _) }
    assert(data.nonEmpty)
    val df = data.map { case (g, v) => (g, v.toDouble) }.toDF("g", "v")
    val got = graft.ops.Robust.winsorize(df, col("g"), col("v"), 1, 99)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    val want = data.groupBy(_._1).map { case (g, rows) =>
      val xs = rows.map(_._2).sorted
      val n = xs.length
      val lo = xs((n * 1 + 99) / 100 - 1)
      val hi = xs((n * 99 + 99) / 100 - 1)
      g -> ((n.toLong, xs.map(x => x.max(lo).min(hi)).sum.toDouble,
        xs.count(_ < lo).toLong, xs.count(_ > hi).toLong))
    }
    assert(got == want)
  }

  test("feature bins: mass per group is partitioned, boundaries respect thresholds") {
    import spark.implicits._
    val data = Gen.listOfN(3, groupGen).sample.getOrElse(Nil)
      .flatMap { case (g, vs) => vs.map(g -> _) }
    val df = data.map { case (g, v) => (g, v.toDouble) }.toDF("g", "v")
    val rows = graft.ops.Robust.featureBins(df, col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val totals = data.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    rows.groupBy(_._1).foreach { case (g, bins) =>
      assert(bins.map(_._3).sum == totals(g), s"group $g mass")
      assert(bins.forall(b => b._2 >= 0 && b._2 <= 9))
    }
  }

  test("zscore avg_value: micro-rounding matches HALF_UP on negative sums too") {
    import spark.implicits._
    val negGen = Gen.choose(-500000L, 500000L).map(c => BigDecimal(c) / 100)
    val data = Gen.listOfN(200, negGen).sample.getOrElse(Nil)
      .map(_.setScale(2))
    assert(data.nonEmpty)
    val df = data.map(v => ("g", v.toDouble)).toDF("g", "v")
    val got = graft.ops.Robust.zscoreOutliers(df, col("g"), col("v"))
      .collect().head.getDouble(3)
    val micro = (BigDecimal(data.sum.toString) * 1000000 / data.length)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP)
    assert(got == (micro / 1000000).toDouble,
      s"got $got want ${(micro / 1000000).toDouble}")
  }

  test("zscore: integer predicate equals double predicate on random data") {
    import spark.implicits._
    val data = Gen.listOfN(2, groupGen).sample.getOrElse(Nil)
      .flatMap { case (g, vs) => vs.map(g -> _) }
    val df = data.map { case (g, v) => (g, v.toDouble) }.toDF("g", "v")
    val got = graft.ops.Robust.zscoreOutliers(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val want = data.groupBy(_._1).map { case (g, rows) =>
      // the integer predicate (w·n−S)² > 4(Qn−S²) in exact BigInt
      val ws = rows.map(_._2 * 100).map(_.toBigIntExact.get)
      val n = BigInt(ws.length)
      val s = ws.sum
      val q = ws.map(w => w * w).sum
      g -> ws.count { w =>
        val l = w * n - s
        l * l > (q * n - s * s) * 4
      }.toLong
    }
    assert(got == want)
  }
}
