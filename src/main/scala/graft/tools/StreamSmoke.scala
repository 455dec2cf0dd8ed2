package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streaming

/** Smoke utility: drives the Structured Streaming pipeline end-to-end over
  * the events table and prints the windowed counts + session totals.
  * Usage: runMain graft.tools.StreamSmoke [sfDir]
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stage = java.nio.file.Files.createTempDirectory("graft-smoke").toString
    Streaming.stageStreamInput(spark, sfDir, stage)

    val hourly = Streaming.runToMemory(
      Streaming.hourlyCounts(spark, stage), "smoke_hourly", OutputMode.Complete())
    println(s"[stream-smoke] hourly windows: ${hourly.count()}")
    hourly.orderBy("window_start", "event_type").show(5, truncate = false)

    val sessions = Streaming.runToMemory(
      Streaming.sessionize(spark, stage).toDF(), "smoke_sessions",
      OutputMode.Update())
    println(s"[stream-smoke] users with sessions: ${sessions.select("user_id").distinct().count()}")
    spark.stop()
  }
}
