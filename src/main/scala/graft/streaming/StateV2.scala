package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary streaming state on the State API v2 (`transformWithState`,
  * SPARK-49070) — the successor to [[Streaming.sessionize]]'s
  * mapGroupsWithState: typed composite state (ValueState / MapState /
  * ListState per key instead of one monolithic case class), explicit
  * event-time timers, per-state TTL, and a RocksDB-only runtime (the
  * provider the 100 TB deployment runs anyway — changelog-checkpointed,
  * spill-free state beyond executor heap).
  *
  * The operator: FIRST-TOUCH DETECTION — for every user, the event-time
  * second at which each event_type was first seen (new-behavior /
  * first-touch attribution, the streaming primitive behind "emit a
  * row the first time a user converts"). Semantics mirror the batch
  * `MIN(sec) GROUP BY user, type`, continuously.
  *
  * Why state is load-bearing: the MapState holds the per-type minimum
  * seen so far, and a row is EMITTED only when it improves that minimum
  * — the state is the re-emission bound (per user per type, emissions =
  * 1 + #improvements, not #events). Correctness does NOT depend on
  * arrival order: emission is monotone-improving and the gate query
  * min-merges emissions downstream, so a late-but-earlier event inside
  * the watermark horizon just emits one more row that wins the MIN.
  * That same algebra is what makes TIMER EVICTION safe: a user idle
  * past [[Streaming.SessionGapSec]] has state deleted by an event-time
  * timer (state stays O(active users × types), not O(lifetime users));
  * if they return, their re-emitted first-touch can only lose the
  * downstream MIN against the rows already emitted. Exactness under
  * eviction is ARITHMETIC, not an assumption — the same deltas-not-
  * totals trick [[Streaming.updateSessions]] uses, transposed to min.
  *
  * Scale shape: one shuffle on user_id per micro-batch; per-batch work
  * per key is O(batch rows for the key); state per key is ≤ one long
  * per DISTINCT type plus one timer handle. The TTLConfig.NONE choice
  * is deliberate — TTL is processing-time-based, and this operator's
  * eviction contract is event-time (the timer); mixing the two would
  * make state lifetime wall-clock-dependent and the gate
  * non-deterministic.
  */
object StateV2 {

  final case class FirstTouch(user_id: Long, event_type: String, first_sec: Long)

  /** Per-user processor: MapState type→min-sec, ValueState of the
    * registered eviction timer (so each data batch can move it instead
    * of accumulating stale timers), event-time timer for eviction.
    */
  final class FirstTouchProcessor
      extends StatefulProcessor[Long, (Long, String, Long), FirstTouch] {

    @transient private var firstSeen: MapState[String, Long] = _
    @transient private var timerAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      firstSeen = getHandle.getMapState[String, Long](
        "firstSeen", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      timerAt = getHandle.getValueState[Long](
        "timerAt", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(uid: Long,
        rows: Iterator[(Long, String, Long)],
        timers: TimerValues): Iterator[FirstTouch] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[FirstTouch]
      var maxSec = Long.MinValue
      rows.foreach { case (_, tpe, sec) =>
        if (sec > maxSec) maxSec = sec
        val better =
          !firstSeen.containsKey(tpe) || sec < firstSeen.getValue(tpe)
        if (better) {
          firstSeen.updateValue(tpe, sec)
          out += FirstTouch(uid, tpe, sec)
        }
      }
      // One live eviction timer per key: delete the previous one before
      // registering the moved target (timers are a SET per key — without
      // the delete every batch would leave one more behind, each firing
      // a spurious eviction). Target must sit strictly beyond the
      // current watermark or registration is rejected at the boundary.
      if (timerAt.exists()) getHandle.deleteTimer(timerAt.get())
      val target = math.max((maxSec + Streaming.SessionGapSec) * 1000L,
        timers.getCurrentWatermarkInMs() + 1L)
      getHandle.registerTimer(target)
      timerAt.update(target)
      out.iterator
    }

    override def handleExpiredTimer(uid: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[FirstTouch] = {
      // Eviction: drop everything for the idle user. Nothing to emit —
      // every minimum this state ever held was emitted when it was set,
      // and the downstream MIN-merge keeps those rows authoritative if
      // the user returns and re-emits.
      firstSeen.clear()
      timerAt.clear()
      Iterator.empty
    }
  }

  /** First-touch per (user, event_type) as a streaming query: watermarked
    * feed → transformWithState (event-time mode, Update output) → exact
    * MIN-merge of the emissions. Runs under the RocksDB state store
    * provider — transformWithState refuses the HDFS-backed default, a
    * constraint (not a tuning choice) of the v2 state machinery.
    * Hash-checked against the batch `MIN(sec) GROUP BY user, type`.
    */
  def qStreamFirstTouch(spark: SparkSession, dir: String): DataFrame = {
    val stage = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_stream_stage_" + dir.replaceAll("[^a-zA-Z0-9]", "_"))
      .getAbsolutePath
    Streaming.stageStreamInput(spark, dir, stage)
    firstTouchOver(spark, stage, maxFilesPerTrigger = None)
  }

  /** The first-touch pipeline over an already-staged landing zone;
    * `maxFilesPerTrigger` throttles the file source so a spec can force
    * GENUINE multi-batch execution (cross-batch MapState reads, timer
    * moves, and the min-merge reconciliation actually firing) — the
    * single-batch AvailableNow run the gate uses exercises none of
    * those paths on its own.
    */
  def firstTouchOver(spark: SparkSession, stage: String,
      maxFilesPerTrigger: Option[Int]): DataFrame = {
    import spark.implicits._
    val reader = spark.readStream.schema(Streaming.eventSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val typed = reader.parquet(stage)
      .withWatermark("ts", "2 hours")
      .select(col("user_id").as[Long], col("event_type").as[String],
        expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)").as[Long])
    val touches = typed
      .groupByKey(_._1)
      .transformWithState(new FirstTouchProcessor,
        TimeMode.EventTime(), OutputMode.Update())
    val res = withRocksDb(spark) {
      Streaming.runToMemory(touches.toDF(),
        s"graft_stream_first_touch_${StateV2.runSeq.incrementAndGet()}",
        OutputMode.Update())
    }
    res.groupBy(col("user_id"), col("event_type"))
      .agg(min(col("first_sec")).as("first_sec"))
      .orderBy("user_id", "event_type")
  }

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run `body` with the RocksDB state store provider — required by
    * transformWithState; restored after, so the rest of the gate keeps
    * the session default.
    */
  def withRocksDb[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  val oracles: Map[String, String] = Map(
    "q_stream_first_touch" ->
      """SELECT user_id, event_type,
        |  MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS first_sec
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
  )
}
