package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `explain("formatted")` of named gate queries to individual files
  * — the per-query before/after plan evidence an optimization round
  * commits under plans/rNN/. Unlike [[ExplainDump]] (one PLANS.md over a
  * fixed headline set), this takes the query list and output dir from
  * the command line so a round can snapshot exactly the queries it
  * touches, at the bench's own scale dir and core count.
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <sfDir> <q1> [q2 ...]
  * Writes <outDir>/<query>_<suffix>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.maxMetadataStringLength", "200")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      // q_graph_pagerank's gate entry collects its bounded 20-row answer
      // eagerly (LocalTableScan) — dump the lazy plan it executes
      val df =
        if (name == "q_graph_pagerank")
          graft.ops.Graph.pagerankTop20(spark, sfDir)._1
        else graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"[plan-dump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
