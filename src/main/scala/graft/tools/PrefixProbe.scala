package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduce order-dependent bench anomalies: run the gate queries in
  * Bench's alphabetical order up to (exclusive) a target, then time the
  * target twice, reporting session-state drift (conf diffs, persisted
  * RDDs, temp views) accumulated by the prefix. Optionally restrict the
  * prefix to a sublist for bisection.
  *
  * Usage: runMain graft.tools.PrefixProbe <sfDir> <target> [fromIdx] [toIdx]
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val target = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .takeWhile(_._1 != target)
      .filter(_._1 != "q_dedup_jaccard")
    val from = if (args.length > 2) args(2).toInt else 0
    val to = if (args.length > 3) args(3).toInt else all.size
    val prefix = all.slice(from, to)
    println(s"[prefix] ${prefix.size} queries: ${prefix.headOption.map(_._1)} .. ${prefix.lastOption.map(_._1)}")

    val confBefore = spark.conf.getAll

    prefix.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"[prefix] $name FAILED: ${e.getMessage.take(100)}") }
      val s = (System.nanoTime() - t0) / 1e9
      if (s > 5) println(f"[prefix] $name%-28s ${s}%6.1fs")
    }

    val confAfter = spark.conf.getAll
    val drift = confAfter.filter { case (k, v) => confBefore.get(k) != Some(v) } ++
      confBefore.view.filterKeys(!confAfter.contains(_)).mapValues(_ + " (REMOVED)")
    println(s"[state] conf drift: ${drift.mkString(", ")}")
    println(s"[state] persistent RDDs: ${spark.sparkContext.getPersistentRDDs.size}")
    println(s"[state] temp views: ${spark.catalog.listTables().count()}")
    val sm = java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
    println(f"[state] heap used ${sm.getUsed / 1e9}%.1f GB of ${sm.getMax / 1e9}%.1f GB")

    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(target)(spark, sfDir).count()
      println(f"[target] $target run $i: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
