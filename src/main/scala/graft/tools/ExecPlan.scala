package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump the EXECUTED (AQE-final) physical plan of named gate queries —
  * the complement to [[PlanDump]] (pre-execution formatted plan): AQE
  * exchange/stage reuse, runtime join rewrites and coalesced reads only
  * exist in the plan AFTER the query has run, so claims like "the three
  * consumers share one scan via exchange reuse" are only checkable
  * here. Writes <outDir>/<query>_<suffix>.txt per query (the
  * executedPlan tree, ReusedExchange/AQEShuffleRead nodes included).
  * Usage: runMain graft.tools.ExecPlan <outDir> <suffix> <sfDir> <q1> [q2 ...]
  */
object ExecPlan {
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
      val df =
        if (name == "q_graph_pagerank")
          graft.ops.Graph.pagerankTop20(spark, sfDir)._1
        else graft.SparkEntry.queries(name)(spark, sfDir)
      // execute THIS df's own QueryExecution: count() plans a different
      // query and a sink write wraps the plan in its own execution —
      // both leave df's AdaptiveSparkPlan un-finalized. collect() runs
      // the exact plan object whose final form we print (gate outputs
      // are bounded, so the driver-side result is small).
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"[exec-plan] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
