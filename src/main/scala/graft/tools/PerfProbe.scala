package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Cold/warm per-query timing probe.
  * Usage: runMain graft.tools.PerfProbe <sfDir> <query...>
  *
  * GRAFT_PERF_PLANS=1 additionally captures, for any individual run
  * slower than GRAFT_PERF_PLANS_MIN seconds (default 20), the EXECUTED
  * (post-AQE) plan of every action in that run plus the per-stage
  * wall-clock timeline — the instrument for intermittent single-run
  * cliffs where the plan or one stage, not the query, is the variable.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val capturePlans = sys.env.get("GRAFT_PERF_PLANS").contains("1")
    val planMinSec = sys.env.get("GRAFT_PERF_PLANS_MIN")
      .flatMap(_.toIntOption).getOrElse(20)
    val acc = new Object
    val timeline = ArrayBuffer.empty[String]
    val slowPlans = ArrayBuffer.empty[String]
    var runStartMs = 0L
    if (capturePlans) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
          val si = ev.stageInfo
          val m = si.taskMetrics
          acc.synchronized {
            val sub = (si.submissionTime.getOrElse(0L) - runStartMs) / 1e3
            val fin = (si.completionTime.getOrElse(0L) - runStartMs) / 1e3
            timeline += f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%4d " +
              f"at=${sub}%7.1f..${fin}%7.1fs " +
              f"spill=${m.diskBytesSpilled / 1e6}%6.0fMB gc=${m.jvmGCTime / 1e3}%5.1fs"
          }
        }
      })
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = {
          if (durationNs > planMinSec * 1e9) acc.synchronized {
            slowPlans += s"--- action $funcName took ${durationNs / 1e9}s ---\n" +
              qe.executedPlan.toString.take(12000)
          }
        }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 3).map { i =>
        acc.synchronized {
          timeline.clear(); slowPlans.clear()
          runStartMs = System.currentTimeMillis()
        }
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        if (capturePlans && secs > planMinSec) {
          Thread.sleep(1000) // listener buses drain
          println(f"[slow] $name run $i: ${secs}%.1fs — stage timeline:")
          acc.synchronized {
            timeline.foreach(println)
            slowPlans.foreach(println)
          }
        }
        secs
      }
      println(f"[perf] $name%-28s cold=${times.head}%6.2fs warm=${times.drop(1).min}%6.2fs")
    }
    spark.stop()
  }
}
