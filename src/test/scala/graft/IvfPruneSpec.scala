package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.ops.Sim

/** Pins the at-rest IVF claim (r12 verdict Missing #3): `q_sim_ivf_pruned`
  * must (a) answer EXACTLY what the inline probe `q_sim_ivf` answers —
  * that's also why the two share one oracle — and (b) actually exhibit
  * metadata-time partition pruning: the probe's literal `assigned IN`
  * predicate lands in the scan's PartitionFilters, and the scan reads
  * only the nprobe inverted-list directories out of all lists on disk.
  * (a) without (b) is a correct query that still scans the whole corpus
  * at 100 TB; (b) is the entire point of paying for the layout.
  */
class IvfPruneSpec extends SparkTestBase {

  private def layoutDir = new java.io.File(graft.sources.Sources
    .layoutDir("graft_ivf_lists", sfDir, "embeddings.parquet"))

  private def scanLeaves(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => scanLeaves(a.executedPlan)
    case q: QueryStageExec => scanLeaves(q.plan)
    case other => other.collectLeaves().flatMap {
      case n @ (_: AdaptiveSparkPlanExec | _: QueryStageExec) => scanLeaves(n)
      case l => Seq(l)
    }
  }

  private def layoutScan(df: DataFrame): FileSourceScanExec = {
    val scans = scanLeaves(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("graft_ivf_lists_")) => f
    }
    assert(scans.size == 1,
      s"expected exactly one scan over the IVF layout, got ${scans.size}")
    scans.head
  }

  test("pruned-layout probe answers exactly the inline IVF probe") {
    val inline = Sim.qSimIvf(spark, sfDir).collect().toSeq
    val pruned = Sim.qSimIvfPruned(spark, sfDir).collect().toSeq
    assert(inline.nonEmpty)
    assert(pruned == inline,
      "the list-partitioned layout must be answer-preserving")
  }

  test("probe scan carries the assigned partition filter and skips lists") {
    val df = Sim.qSimIvfPruned(spark, sfDir)
    df.queryExecution.executedPlan.execute().count() // drive THIS plan
    val scan = layoutScan(df)
    assert(scan.partitionFilters.exists(_.references.exists(
        _.name == "assigned")),
      s"probe predicate must be a PARTITION filter, " +
        s"got ${scan.partitionFilters.mkString(", ")}")
    val listsOnDisk = layoutDir.listFiles()
      .count(_.getName.startsWith("assigned="))
    val partitionsRead = scan.metrics("numPartitions").value
    assert(listsOnDisk > 3,
      s"layout must hold more lists than nprobe, got $listsOnDisk")
    assert(partitionsRead == 3,
      s"scan must read exactly the nprobe=3 probed lists, " +
        s"read $partitionsRead of $listsOnDisk")
  }
}
