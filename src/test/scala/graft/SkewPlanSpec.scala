package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Pins the physical strategy of the manual salted join (`Skew.qSaltedJoin`).
  *
  * The round-11 diagnosis of the ev100 pass-1 tail: Catalyst sizes the
  * exploded dim from the pruned file scan (Generate passes sizeInBytes
  * through without the SaltBuckets multiplier), picks BroadcastHashJoin
  * over a side that is really dim×16 rows, and the driver-side
  * HashedRelation build becomes the whole query (≈15 s of 20 s at 100×;
  * 62 s under full-gate heap pressure). The SHUFFLE_HASH hint pins the
  * broadcast-free shape the operator exists to demonstrate. This spec
  * fails if the hint is dropped or the planner stops honoring it.
  */
class SkewPlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("salted join plans as ShuffledHashJoin, never a broadcast of the exploded dim") {
    val df = Skew.qSaltedJoin(spark, dir)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"expected the hinted shuffled-hash strategy:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"the exploded dim side must not be broadcast:\n$p")
  }

  test("salting + strategy hint are result-invisible vs the plain join") {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.qSaltedJoin(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }
}
