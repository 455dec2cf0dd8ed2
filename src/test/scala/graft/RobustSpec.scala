package graft

import org.apache.spark.sql.functions._

import graft.ops.Robust

/** Robust-statistics lane: z-score outlier flagging and percentile
  * winsorization must agree with naive double-arithmetic references on
  * the test tables (the gate separately pins engine-exactness vs DuckDB;
  * these specs pin the SEMANTICS).
  */
class RobustSpec extends SparkTestBase {

  test("zscore: integer-exact predicate agrees with double |v-mu| > 2*sigma") {
    val events = Tables.events(spark, sfDir)
    val got = Robust.qEventZscore(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap

    val rows = events.select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = rows.groupBy(_._1).map { case (t, vs) =>
      val xs = vs.map(_._2)
      val mu = xs.sum / xs.length
      val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / xs.length)
      t -> xs.count(x => math.abs(x - mu) > 2 * sigma).toLong
    }
    assert(got == want)
  }

  test("zscore: outliers are a strict minority in every group") {
    Robust.qEventZscore(spark, sfDir).collect().foreach { r =>
      assert(r.getLong(2) * 10 < r.getLong(1),
        s"${r.getString(0)}: ${r.getLong(2)} outliers of ${r.getLong(1)}")
    }
  }

  test("zscore fails loudly past the DECIMAL(38) headroom, not silently") {
    import spark.implicits._
    // max|w|*n = 10^12 * 2*10^7 = 2*10^19 > 10^18: without the guard,
    // non-ANSI Spark would NULL the overflowed products and silently
    // drop rows from the outlier count
    val big = spark.range(20L * 1000 * 1000)
      .select(lit("g").as("t"),
        (lit(9.9e9) + (col("id") % 2)).as("v"))
    val ex = intercept[Exception] {
      Robust.zscoreOutliers(big, col("t"), col("v")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("DECIMAL(38) headroom")),
      s"wrong failure: ${messages(ex).take(3)}")
  }

  test("winsorize: thresholds are the ceil(p*n/100)-ranked values and clamps match") {
    val prices = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)))
    val want = prices.groupBy(_._1).map { case (g, rows) =>
      val xs = rows.map(_._2).sorted
      val n = xs.length
      val lo = xs((n * 1 + 99) / 100 - 1)
      val hi = xs((n * 99 + 99) / 100 - 1)
      val clamped = xs.map(x => x.max(lo).min(hi))
      g -> (n.toLong, clamped.sum.toDouble, xs.count(_ < lo).toLong,
        xs.count(_ > hi).toLong)
    }
    val got = Robust.qWinsorize(spark, sfDir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4))
    }.toMap
    assert(got == want)
  }

  test("winsorize: clamp counts stay under the percentile mass, sum shrinks toward center") {
    val plain = Tables.lineitem(spark, sfDir)
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double"))
      .head().getDouble(0)
    val rows = Robust.qWinsorize(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1) / 100 + 1) // <= ~1% each side
      assert(r.getLong(4) <= r.getLong(1) / 100 + 1)
    }
    val winTotal = rows.map(_.getDouble(2)).sum
    assert(winTotal > 0 && math.abs(winTotal - plain) / plain < 0.05)
  }

  test("feature binning: bins partition each group, roughly equal mass") {
    val rows = graft.ops.Robust.qFeatureBinning(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val byG = rows.groupBy(_._1)
    val totals = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byG.foreach { case (g, bins) =>
      assert(bins.map(_._3).sum == totals(g), s"group $g mass")
      // every bin holds within 2x of the ideal tenth (ties can skew)
      bins.foreach { case (_, b, n, lo, hi) =>
        assert(b >= 0 && b <= 9)
        assert(lo <= hi)
        assert(n <= totals(g) / 5, s"group $g bin $b overloaded: $n")
      }
      // bin ranges are ordered and non-overlapping
      val sorted = bins.sortBy(_._2).toList
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a._5 <= b._4, s"group $g bins overlap")
      }
    }
  }

  test("single-scan and multi-scan shapes produce identical rows (r19)") {
    // qWinsorize/qFeatureBinning/qEventZscore pick the shape from the
    // source's file bytes (Robust.SingleScanBytes); this pins the two
    // shapes row-identical with the same column names and types, so
    // the switch can never change what a query computes. (Nullability
    // differs by construction — count() is NOT NULL, the weighted
    // sum() is nullable — which no sink or oracle observes.)
    val li = Tables.lineitem(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      (df.schema.map(f => (f.name, f.dataType)), df.collect().toSeq)
    assert(rows(Robust.winsorize(li, col("l_returnflag"),
        col("l_extendedprice"), 1, 99, singleScan = true))
      == rows(Robust.winsorize(li, col("l_returnflag"),
        col("l_extendedprice"), 1, 99, singleScan = false)))
    assert(rows(Robust.featureBins(li, col("l_returnflag"),
        col("l_extendedprice"), singleScan = true))
      == rows(Robust.featureBins(li, col("l_returnflag"),
        col("l_extendedprice"), singleScan = false)))
    assert(rows(Robust.zscoreOutliers(ev, col("event_type"), col("value"),
        singleScan = true))
      == rows(Robust.zscoreOutliers(ev, col("event_type"), col("value"),
        singleScan = false)))
  }

  test("stream-static join reconciles with the batch join") {
    val got = graft.streaming.Streaming.qStreamStaticJoin(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = Tables.events(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sv"))
      .orderBy("c_mktsegment")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }
}
