package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-batch streaming metrics probe: runs the named streaming gate
  * queries and prints each micro-batch's `StreamingQueryProgress` JSON
  * (durationMs phase breakdown, per-state-operator update/commit/
  * removal times, rows/s) — the instrument for attributing a scaled
  * stage's lane cost to a PHASE instead of guessing.
  * Usage: runMain graft.tools.ProgressProbe <sfDir> <q_stream_...>
  */
object ProgressProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q_stream_sessions_v2")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
    graft.streaming.Streaming.progressSink = sink
    try names.foreach { name =>
      sink.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[progress] $name total ${dt}%.2f s")
      import scala.jdk.CollectionConverters._
      sink.asScala.toSeq.sortBy(_._1).foreach { case (qn, ps) =>
        ps.foreach(p => println(s"[progress] $qn $p"))
      }
    } finally graft.streaming.Streaming.progressSink = null
    spark.stop()
  }
}
