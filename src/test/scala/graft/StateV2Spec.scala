package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{StateV2, Streaming}

/** State API v2 (`transformWithState`): the first-touch operator matches
  * its batch formulation, single-batch AND genuinely multi-batch.
  */
class StateV2Spec extends SparkTestBase {

  private def batchAnswer() =
    graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type",
        "CAST(floor(unix_timestamp(ts)) AS BIGINT) AS sec")
      .groupBy("user_id", "event_type")
      .agg(min("sec").as("first_sec"))
      .orderBy("user_id", "event_type")
      .collect().toSeq

  test("first-touch via transformWithState == batch MIN per (user, type)") {
    val got = StateV2.qStreamFirstTouch(spark, sfDir).collect().toSeq
    assert(got.nonEmpty && got == batchAnswer())
  }

  test("first-touch exact under multi-batch execution (cross-batch state + timers)") {
    // Stage into 8 files and feed them ONE per micro-batch: rows for the
    // same user now arrive across many batches in file order (not time
    // order), so this drives the cross-batch MapState reads, the timer
    // delete/re-register dance, and — because later files can hold
    // earlier timestamps — the improvement re-emission that the
    // downstream MIN-merge reconciles. Deterministic: emission order
    // varies with batching, the min-merged RESULT cannot.
    val stage = Files.createTempDirectory("graft-tws-mb").toString
    graft.Tables.events(spark, sfDir).repartition(8)
      .write.mode("overwrite").parquet(stage)
    val got = StateV2.firstTouchOver(spark, stage, maxFilesPerTrigger = Some(1))
      .collect().toSeq
    assert(got.nonEmpty && got == batchAnswer())
  }
}
