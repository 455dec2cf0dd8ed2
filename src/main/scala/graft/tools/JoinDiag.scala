package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One-off diagnostic for the q_salted_join ev100 pass-1 tail (VERDICT
  * r10 directive 1): runs the query against a staged dir, dumps the AQE
  * final plan and a per-stage table (duration, task count, shuffle/spill
  * bytes, GC time) for the cold and warm executions, optionally with AQE
  * disabled for comparison.
  *
  * Usage: runMain graft.tools.JoinDiag <sfDir> [query] [noaqe]
  */
object JoinDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_ev100")
    val query = if (args.length > 1) args(1) else "q_salted_join"
    val noAqe = args.contains("noaqe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", (!noAqe).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val m = si.taskMetrics
        val dur = (si.completionTime.getOrElse(0L) -
          si.submissionTime.getOrElse(0L)) / 1e3
        stages += f"stage ${si.stageId}%3d ${si.name.takeWhile(_ != '\n').take(50)}%-52s " +
          f"tasks=${si.numTasks}%4d dur=${dur}%7.2fs " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"spill=${m.diskBytesSpilled / 1e6}%8.1fMB gc=${m.jvmGCTime / 1e3}%6.2fs"
      }
    })

    import org.apache.spark.sql.DataFrame
    // Hint variants delegate to the gate query's own parameterized body
    // (Skew.saltedJoin) so the diagnostic can never drift from what the
    // gate runs (ADVICE r11).
    def saltedVariant(hint: String): (SparkSession, String) => DataFrame =
      (s, dir) => graft.ops.Skew.saltedJoin(s, dir, hint)
    val fn = query match {
      case "salted_merge" => saltedVariant("merge")
      case "salted_shuffle_hash" => saltedVariant("shuffle_hash")
      case "salted_broadcast" => saltedVariant("broadcast")
      case _ => graft.SparkEntry.queries(query)
    }
    (1 to 2).foreach { pass =>
      stages.clear()
      val df = fn(spark, sfDir)
      val t0 = System.nanoTime()
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener drain
      println(s"=== $query pass $pass: rows=$n time=${f"$secs%.2f"}s aqe=${!noAqe} ===")
      stages.foreach(println)
      if (pass == 2) {
        println("=== final (post-AQE) plan ===")
        println(df.queryExecution.executedPlan.toString.take(8000))
      }
    }
    spark.stop()
  }
}
