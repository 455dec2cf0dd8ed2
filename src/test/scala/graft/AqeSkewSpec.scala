package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the adaptive counterpart of `ops/Skew.scala`'s manual salting:
  * AQE's skew-join splits an oversized shuffle partition at runtime, so
  * a hot join key stops being the job's critical path WITHOUT the query
  * author doing anything. The manual salted forms stay for when the
  * planner must be forced (e.g. a skewed aggregation, which AQE's
  * skew-join does not cover); this spec proves the adaptive path is
  * real, fires on a Zipf-hot key, and is result-invisible.
  */
class AqeSkewSpec extends SparkTestBase {

  private def withConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** ~90% of fact rows share key 0 (the hot shard); dim has one row per
    * key so the join result is checkable by plain arithmetic.
    */
  private def skewedJoin(): DataFrame = {
    import spark.implicits._
    val fact = spark.range(200000L)
      .withColumn("key", when(col("id") % 10 < 9, lit(0L))
        .otherwise(pmod(col("id"), lit(50L))))
    val dim = (0L until 50L).map(k => (k, s"dim_$k")).toDF("key", "payload")
    fact.join(dim, "key")
      .groupBy(col("payload"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
  }

  test("AQE splits the hot-key partition (SortMergeJoin skew=true)") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // local[4] test data is tiny; lower the size gates so the 90%-hot
      // partition is classified as skewed exactly as a multi-GB one would
      // be under the production defaults (256 MB threshold, factor 5)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      // keep the 50-row dim from broadcasting, or there is no shuffle
      // join to rescue (both the static and the AQE-runtime threshold)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val df = skewedJoin()
      val rows = df.collect()

      // QueryStage nodes hide their subtree from TreeNode.collect, so
      // assert on the final adaptive plan's string (PlanSpec's idiom)
      val p = finalPlan(df)
      assert(p.contains("SortMergeJoin"), s"expected a shuffle join:\n$p")
      assert(p.contains("skew=true") && p.contains("skewed"),
        s"AQE did not mark the join skewed:\n$p")

      // skew handling must be result-invisible: dim_0 sees the 180 K hot
      // rows; tail ids are all ≡ 9 (mod 10), so exactly the five residues
      // {9,19,29,39,49} survive with 4 K rows each (200 K / 50 per class)
      val byPayload = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byPayload("dim_0") === 180000L, s"hot key count: $byPayload")
      assert(byPayload("dim_9") === 4000L && byPayload("dim_49") === 4000L)
      assert(byPayload.size === 6 && byPayload.values.sum === 200000L)
    }
  }

  test("same join without the size overrides stays a plain join") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val df = skewedJoin()
      df.collect()
      val p = finalPlan(df)
      // under the production 256 MB threshold this toy input is not skewed
      assert(!p.contains("skew=true"),
        "skew split fired below the size threshold — detection gates broken")
    }
  }
}
