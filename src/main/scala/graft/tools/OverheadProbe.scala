package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query overhead census: for every gate query (warm), one timed run
  * recording wall seconds, Spark JOB count, stage count, task count, and
  * shuffle-write bytes. The instrument behind the r18 optimization
  * round's target list — at sf0.1 the data is ~17 MB, so a query whose
  * wall time is large relative to its shuffle bytes is paying fixed
  * per-job/per-exchange cost (AQE stage materialization, broadcast
  * build latency, collect round-trips), which is exactly the plan-shape
  * cost that also multiplies at 100 TB (guide §2.2: block count grows
  * quadratically with map×reduce task counts; every exchange is a
  * barrier). Output: one `[ovh]` line per query, sortable.
  * Usage: runMain graft.tools.OverheadProbe <sfDir> [q1 q2 ...]
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
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

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleW = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(ev: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(ev.stageInfo.numTasks)
        shuffleW.addAndGet(ev.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })

    // bench-parity warm pass: codegen/JIT at the smallest sf, plus one
    // untimed pass of each TIMED query so staging writes (streaming
    // landing zones, bucketed/z-order layouts) land outside the census
    val warmDir = sys.env.getOrElse("GRAFT_PROBE_WARM_DIR",
      "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory)
      names.foreach { n =>
        try graft.SparkEntry.queries(n)(spark, warmDir).count()
        catch { case _: Throwable => }
      }
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => }
    }
    if (names.exists(_.startsWith("q_stream_")))
      graft.streaming.Streaming.retireAll(spark)

    names.foreach { n =>
      // settle the async listener bus so counts don't bleed across queries
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); shuffleW.set(0L)
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"[ovh] $n FAILED: $e") }
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[ovh] $n%-28s ${secs}%7.2fs jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%3d tasks=${tasks.get}%5d " +
        f"shufMB=${shuffleW.get / 1e6}%8.1f")
      if (n.startsWith("q_stream_"))
        graft.streaming.Streaming.retireAll(spark)
    }
    spark.stop()
  }
}
