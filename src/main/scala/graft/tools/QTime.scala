package graft.tools

import org.apache.spark.sql.SparkSession

/** Times individual gate queries at a given dir, N repeats in one JVM —
  * the minimal harness for adjudicating a single query's bench delta
  * without paying a full two-pass stage run.
  * Usage: runMain graft.tools.QTime <dir> <repeats> <q1> [q2 ...]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val repeats = args(1).toInt
    val names = args.drop(2).toSeq
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
    // same warm pass contract as Bench: JIT/codegen at the small sf.
    // Warm dir is configurable and its absence warns (r14 ADVICE —
    // PrefixProbe's pattern): with the exceptions swallowed, a missing
    // hardcoded path would silently no-op the warm pass and report
    // un-warmed timings.
    val warmDir = sys.env.getOrElse("GRAFT_PROBE_WARM_DIR",
      "/root/testdata/sf0.001")
    if (!new java.io.File(warmDir).isDirectory)
      println(s"[qtime] WARNING: warm dir $warmDir does not exist — " +
        "timings will be un-warmed; set GRAFT_PROBE_WARM_DIR")
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => }
    }
    (1 to repeats).foreach { p =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        try graft.SparkEntry.queries(n)(spark, dir).count()
        catch { case e: Throwable => println(s"[qtime] $n FAILED: $e") }
        println(f"[qtime] pass$p $n ${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
    }
    spark.stop()
  }
}
