package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the state-store provider for a streaming gate query: run it
  * under the session-default HDFSBackedStateStore, then under RocksDB
  * (changelog checkpointing on, via [[graft.streaming.StateV2
  * .withRocksDb]]), and print each run's per-batch state-operator
  * timings — the carried r11 polish item asking whether the built-in
  * `session_window` lane's per-store update/commit time moves under
  * RocksDB at the 100× stage.
  *
  * Usage: runMain graft.tools.RocksProbe <sfDir> <q_stream_...>
  */
object RocksProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_ev100")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q_stream_session_window")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    def stateLine(p: String): String = {
      // pull the state-operator timing fields out of the progress JSON
      def grab(k: String): String =
        ("\"" + k + "\":(\\d+)").r.findFirstMatchIn(p)
          .map(_.group(1)).getOrElse("-")
      s"batch=${grab("batchId")} dur=${grab("batchDuration")}ms " +
        s"updates=${grab("allUpdatesTimeMs")}ms " +
        s"removals=${grab("allRemovalsTimeMs")}ms " +
        s"commit=${grab("commitTimeMs")}ms " +
        s"stateRows=${grab("numRowsTotal")} mem=${grab("memoryUsedBytes")}"
    }

    try names.foreach { name =>
      Seq("default", "rocksdb").foreach { provider =>
        sink.clear()
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val secs =
          if (provider == "rocksdb")
            graft.streaming.StateV2.withRocksDb(spark) { once() }
          else once()
        println(f"[rocks] $name $provider%-8s total ${secs}%.1fs")
        import scala.jdk.CollectionConverters._
        sink.asScala.toSeq.sortBy(_._1).foreach { case (qn, ps) =>
          ps.foreach(p => println(s"[rocks]   $qn ${stateLine(p)}"))
        }
      }
    } finally graft.streaming.Streaming.progressSink = null
    spark.stop()
  }
}
