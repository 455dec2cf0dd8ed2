package graft

/** Whole-catalogue plan audit: no gate query may plan a TRUE Cartesian
  * product (CartesianProduct = both sides row-scale with no join key —
  * the one physical operator that cannot survive a 100× scale-up).
  * Intentional cross joins against 1-row/broadcast frames lower to
  * BroadcastNestedLoopJoin, which is allowed. Streaming queries are
  * excluded (their returned frame is a materialized memory table; the
  * interesting plans are pinned in StreamingSpec), as are the pipe
  * queries (they'd spawn processes just to plan).
  */
class PlanAuditSpec extends SparkTestBase {

  test("no batch gate query plans a CartesianProduct") {
    val skip = (n: String) =>
      n.startsWith("q_stream_") || n.startsWith("pipe_") ||
        n.startsWith("wc_") // RDD-based: no SQL plan to audit
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if !skip(name) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        name -> plan.contains("CartesianProduct")
    }.collect { case (name, true) => name }
    assert(offenders.isEmpty,
      s"row-scale cartesian product planned in: ${offenders.mkString(", ")}")
  }
}
