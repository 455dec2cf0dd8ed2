package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Reproduce order-dependent bench anomalies: run the gate queries in
  * Bench's alphabetical order up to (exclusive) a target, then time the
  * target twice, reporting session-state drift (conf diffs, persisted
  * RDDs, temp views) accumulated by the prefix plus per-run spill/GC
  * attribution for the target. Optionally restrict the prefix to a
  * sublist for bisection.
  *
  * Bench's session differs from a bare prefix in two ways that matter
  * at the 100x stages: the sf0.001 warm pass and the streaming pre-run
  * at the timed dir (which leaves every lane's memory-sink table
  * driver-resident — and in local mode driver heap IS executor heap).
  * Env flags replicate those pieces independently so the interference
  * source can be bisected:
  *   GRAFT_PROBE_WARM=1       run Bench's sf0.001 warm pass first
  *   GRAFT_PROBE_STREAMPRE=1  run Bench's q_stream_* pre-run at sfDir
  *   GRAFT_PROBE_PREFIX=0     skip the alphabetical prefix
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

    val doWarm = sys.env.get("GRAFT_PROBE_WARM").contains("1")
    val doStreamPre = sys.env.get("GRAFT_PROBE_STREAMPRE").contains("1")
    val doPrefix = !sys.env.get("GRAFT_PROBE_PREFIX").contains("0")

    if (doWarm) {
      // warm dir is configurable (r13 ADVICE fix: the hardcoded sf0.001
      // path made the whole pass silently no-op — every query swallowed
      // by the catch — on machines without /root/testdata)
      val warmDir = sys.env.getOrElse("GRAFT_PROBE_WARM_DIR",
        "/root/testdata/sf0.001")
      if (!new java.io.File(warmDir).isDirectory)
        println(s"[warm] WARNING: warm dir $warmDir does not exist — " +
          "every warm query will fail; set GRAFT_PROBE_WARM_DIR")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count()
        catch { case _: Throwable => }
      }
      println(f"[warm] $warmDir pass: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    if (doStreamPre) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries.foreach { case (name, fn) =>
        if (name.startsWith("q_stream_"))
          try fn(spark, sfDir).count() catch { case _: Throwable => }
      }
      println(f"[streampre] q_stream_* at $sfDir: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    val all = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .takeWhile(_._1 != target)
      .filter(_._1 != "q_dedup_jaccard")
    val from = if (args.length > 2) args(2).toInt else 0
    val to = if (args.length > 3) args(3).toInt else all.size
    val prefix = if (doPrefix) all.slice(from, to) else Nil
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
    val views = spark.catalog.listTables().collect()
    println(s"[state] temp views: ${views.length}")
    views.filter(_.isTemporary).foreach { t =>
      try {
        val n = spark.table(t.name).count()
        if (n > 100000) println(f"[state]   view ${t.name}%-40s $n%,12d rows")
      } catch { case _: Throwable => }
    }
    def heapLine(tag: String): Unit = {
      val sm = java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
      println(f"[$tag] heap used ${sm.getUsed / 1e9}%.1f GB of ${sm.getMax / 1e9}%.1f GB")
      // code-cache saturation = the JIT stops compiling and hot codegen
      // runs interpreted — the only known cause of slow-tasks-no-GC
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(p => p.getName.startsWith("CodeHeap") ||
          p.getName.startsWith("CodeCache")) // non-segmented name
        .foreach { p =>
          val u = p.getUsage
          println(f"[$tag] ${p.getName}%-36s ${u.getUsed / 1e6}%7.1f of ${u.getMax / 1e6}%7.1f MB")
        }
    }
    heapLine("state")

    // Per-target-run attribution: task-level spill and GC summed over the
    // stages each run executes, per-stage wall-clock timeline (offsets
    // from run start expose driver-side gaps BETWEEN stages), plus
    // driver-JVM GC wall time across it.
    val acc = new Object
    var spill = 0L; var memSpill = 0L; var gcMs = 0L
    var runStartMs = 0L
    val timeline = ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val m = si.taskMetrics
        acc.synchronized {
          spill += m.diskBytesSpilled; memSpill += m.memoryBytesSpilled
          gcMs += m.jvmGCTime
          val sub = (si.submissionTime.getOrElse(0L) - runStartMs) / 1e3
          val fin = (si.completionTime.getOrElse(0L) - runStartMs) / 1e3
          timeline += f"[stage] ${si.stageId}%4d " +
            f"${si.name.takeWhile(_ != '\n').take(44)}%-46s " +
            f"tasks=${si.numTasks}%4d at=${sub}%7.1f..${fin}%7.1fs " +
            f"spill=${m.diskBytesSpilled / 1e6}%6.0fMB gc=${m.jvmGCTime / 1e3}%5.1fs"
        }
      }
    })
    import scala.jdk.CollectionConverters._
    def jvmGcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

    // Post-AQE plans of slow actions (>20s): when a target run cliffs,
    // the final plan says whether a join strategy or partition count
    // flipped — the r12 tfidf/unigram diagnosis instrument.
    val slowPlans = ArrayBuffer.empty[String]
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          if (durationNs > 20e9) acc.synchronized {
            slowPlans += s"--- action $funcName took ${durationNs / 1e9}s ---\n" +
              qe.executedPlan.toString.take(12000)
          }
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })

    // If a target run stalls past 30s, dump every thread once — the
    // decisive instrument when stage metrics say the time isn't in tasks.
    @volatile var dumpArmed = false
    val watchdog = new Thread(() => {
      while (true) {
        Thread.sleep(30000)
        if (dumpArmed) {
          dumpArmed = false
          println("[watchdog] 30s in-run thread dump:")
          Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            if (st.nonEmpty && !t.getName.contains("watchdog")) {
              val top = st.take(12).map("    " + _).mkString("\n")
              println(s"[watchdog] ${t.getName} ${t.getState}\n$top")
            }
          }
        }
      }
    }, "graft-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()

    val targetRuns = sys.env.get("GRAFT_PROBE_TARGET_RUNS")
      .flatMap(_.toIntOption).getOrElse(2)
    (1 to targetRuns).foreach { i =>
      acc.synchronized {
        spill = 0; memSpill = 0; gcMs = 0; timeline.clear(); slowPlans.clear()
        runStartMs = System.currentTimeMillis()
      }
      dumpArmed = true
      val gc0 = jvmGcMs
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(target)(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      dumpArmed = false
      Thread.sleep(500) // let listener drain
      val (s1, s2, s3) = acc.synchronized { (spill, memSpill, gcMs) }
      println(f"[target] $target run $i: ${secs}%.1fs " +
        f"diskSpill=${s1 / 1e6}%.0fMB memSpill=${s2 / 1e6}%.0fMB " +
        f"taskGc=${s3 / 1e3}%.1fs jvmGc=${(jvmGcMs - gc0) / 1e3}%.1fs")
      if (secs > 20) acc.synchronized {
        timeline.foreach(println)
        slowPlans.foreach(println)
      }
      heapLine("target")
    }
    spark.stop()
  }
}
