package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** PageRank deployment knobs: both checkpoint modes and both join
  * strategies must produce the identical ranking — they are cluster
  * trades, not semantics.
  */
class GraphSpec extends SparkTestBase {

  private def top20(reliable: Boolean, bcast: Boolean) =
    Graph.pagerank(Graph.bipartiteEdges(spark, sfDir), 3,
        reliableCheckpoint = reliable, broadcastRanks = bcast)
      .select(col("node"),
        round(col("r") * col("n_nodes").cast("double"), 6).as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("node").asc)
      .limit(20)

  test("reliable checkpoint() variant matches the cached-pin arm exactly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt-graph").toString
    spark.sparkContext.setCheckpointDir(dir)
    val a = top20(reliable = false, bcast = true).collect().map(_.toSeq).toSeq
    val b = top20(reliable = true, bcast = true).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("co-partitioned fallback (no broadcast) matches, plan shuffles") {
    val a = top20(reliable = false, bcast = true).collect().map(_.toSeq).toSeq
    // Drop the broadcast arm's cached pins before building the fallback:
    // since r18 the pinned edge list embeds its degree-attach join, and
    // the CacheManager's sameResult lookup ignores join-strategy hints —
    // so WITHOUT the clear, the fallback run would silently reuse the
    // broadcast arm's cache and this spec would read that arm's
    // BroadcastHashJoin out of the InMemoryRelation's stored-plan string
    // (a false positive: the reused cache holds identical DATA).
    spark.sharedState.cacheManager.clearCache()
    val b = top20(reliable = false, bcast = false)
    assert(a == b.collect().map(_.toSeq).toSeq)
    // the EDGES join must be the co-partitioned shuffle-hash join; the
    // tiny rank×degree weight join is free to broadcast (and should)
    val plan = b.queryExecution.executedPlan.toString
    assert("""ShuffledHashJoin \[src""".r.findFirstIn(plan).isDefined,
      s"edges join must be shuffle-hash on src:\n${plan.take(1200)}")
    assert(!"""BroadcastHashJoin \[src""".r.findFirstIn(plan).isDefined,
      "edges join must not silently broadcast")
  }
}
