package graft

import org.apache.spark.sql.functions._

/** The injected optimizer rule (CollapseRedundantRound) must fold the
  * duplicate round out of the optimized plan without changing results.
  */
class RuleSpec extends SparkTestBase {

  test("round(round(x, 6), 6) collapses to a single Round in the plan") {
    val df = Tables.lineitem(spark, sfDir)
      .select(round(round(col("l_extendedprice"), 6), 6).as("r"))
    val optimized = df.queryExecution.optimizedPlan.toString
    val occurrences = "round\\(".r.findAllIn(optimized.toLowerCase).size
    assert(occurrences == 1, s"expected 1 round in plan, got $occurrences:\n$optimized")
  }

  test("collapse preserves values (idempotent rounding)") {
    val a = Tables.lineitem(spark, sfDir)
      .select(round(round(col("l_extendedprice"), 2), 2).as("r"))
      .agg(sum("r")).head().getDouble(0)
    val b = Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice"), 2).as("r"))
      .agg(sum("r")).head().getDouble(0)
    assert(a == b)
  }

  test("different scales are NOT collapsed") {
    val df = Tables.lineitem(spark, sfDir)
      .select(round(round(col("l_extendedprice"), 4), 2).as("r"))
    val optimized = df.queryExecution.optimizedPlan.toString
    val occurrences = "round\\(".r.findAllIn(optimized.toLowerCase).size
    assert(occurrences == 2, s"distinct scales must both survive:\n$optimized")
  }

  test("AsOfJoinPlan rewrite matches the hand-built union-tag pipeline") {
    val viaPlan = graft.ops.Events.qEventAsofPlan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    val byHand = graft.ops.Events.qEventAsof(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(viaPlan.nonEmpty && viaPlan.sameElements(byHand),
      s"plan-node as-of (${viaPlan.length} rows) != hand-built (${byHand.length})")
    // the rewrite fired: the optimized plan is the lowered Window shape,
    // with no AsOfJoinPlan node left for physical planning to choke on
    val opt = graft.ops.Events.qEventAsofPlan(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(!opt.contains("AsOfJoinPlan") && opt.contains("Window"),
      s"rewrite did not lower the node:\n${opt.take(1200)}")
  }
}
