package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Z-order layout: a box predicate over two keys must read far fewer
  * rows from the z-ordered files than from a round-robin layout —
  * parquet row-group skipping from the pushed min/max filters is the
  * mechanism, so the assertion is on the SCAN's actual output rows.
  */
class ZOrderSpec extends SparkTestBase {

  private def scannedRows(df: DataFrame): Long = {
    // run THIS frame's physical plan (df.count() would plan a separate
    // aggregate query and leave these metrics untouched)
    val plan = df.queryExecution.executedPlan
    plan.execute().count()
    // a plan with exchanges arrives wrapped in AdaptiveSparkPlanExec
    // (itself a leaf node) — descend into the executed inner plan, and
    // through materialized query stages, to reach the real scan leaves
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scanLeaves(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => scanLeaves(a.executedPlan)
      case q: QueryStageExec => scanLeaves(q.plan)
      case other => other.collectLeaves().flatMap {
        case n @ (_: AdaptiveSparkPlanExec | _: QueryStageExec) => scanLeaves(n)
        case l => Seq(l)
      }
    }
    scanLeaves(plan)
      .map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
  }

  test("z-ordered layout skips row groups a round-robin layout cannot") {
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-z").toString
    Sources.writeZOrdered(base, s"$tmp/zorder", "l_partkey", "l_suppkey", 16)
    base.repartition(16)
      .write.mode("overwrite").parquet(s"$tmp/plain")

    val maxP = base.agg(max("l_partkey")).head().getLong(0)
    val maxS = base.agg(max("l_suppkey")).head().getLong(0)
    // ~10% x ~10% box -> ~1% of the key plane
    def box(dir: String): DataFrame =
      spark.read.parquet(s"$tmp/$dir")
        .filter(col("l_partkey") <= maxP / 10 &&
          col("l_suppkey") <= maxS / 10)

    val total = base.count()
    val nBox = box("zorder").count()
    assert(nBox == box("plain").count(), "layouts must agree on the answer")

    val zScan = scannedRows(box("zorder"))
    val plainScan = scannedRows(box("plain"))
    // round-robin files span the whole key plane: every row group
    // matches the pushed range and the scan reads ~everything
    assert(plainScan >= total / 2, s"plain layout scanned $plainScan/$total")
    // z-ordered files are tight rectangles: most row groups are skipped
    assert(zScan * 2 <= plainScan,
      s"z-order scanned $zScan vs plain $plainScan")
  }

  // round-11: the staging path is write-once via per-key computeIfAbsent
  // (same-JVM callers block) + unique-temp-dir/atomic-rename publication
  // (cross-JVM). Hammer it from a fresh key: every concurrent caller must
  // see the COMPLETE layout, and no staging debris may survive.
  test("concurrent qZOrderScan callers all observe one complete layout") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-zrace").toString
    Files.copy(Paths.get(s"$sfDir/lineitem.parquet"),
      Paths.get(s"$dir/lineitem.parquet"))

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence((1 to 4).map { _ =>
        Future(Sources.qZOrderScan(spark, dir).collect().toSeq)
      }), 120.seconds)
    assert(results.head.nonEmpty)
    assert(results.forall(_ == results.head),
      "concurrent callers disagreed — a partial layout was read")

    val out = new java.io.File(
      Sources.layoutDir("graft_zorder", dir, "lineitem.parquet"))
    assert(new java.io.File(out, "_SUCCESS").isFile,
      "published layout must carry Spark's completeness marker")
    val debris = out.getParentFile.listFiles()
      .filter(_.getName.startsWith(out.getName + ".stage-"))
    assert(debris.isEmpty, s"staging temp dirs leaked: ${debris.mkString(",")}")
  }

  // r14 ADVICE: the staged layout used to be keyed by the source PATH
  // alone, memoized cross-JVM via _SUCCESS — regenerating the data at
  // the same path (the 100× recipes rebuild in place) silently answered
  // from the stale layout. The fingerprinted path must re-stage and
  // reflect the NEW data.
  test("in-place source regeneration re-stages the layout (no stale reads)") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-zstale").toString
    Files.copy(Paths.get(s"$sfDir/lineitem.parquet"),
      Paths.get(s"$dir/lineitem.parquet"))
    val before = Sources.qZOrderScan(spark, dir).collect().toSeq
    assert(before.nonEmpty)

    // regenerate IN PLACE: same path, different content (half the
    // rows). The rewrite deliberately REUSES the original file's mtime:
    // since r15 the manifest carries a content edge-hash, so the
    // re-stage must trigger on the bytes alone — before that fix this
    // spec had to nudge mtime +2 s to dodge same-granule aliasing
    val origMtime = new java.io.File(s"$dir/lineitem.parquet").lastModified
    val half = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 2 === 0).toDF()
    val tmpOut = Files.createTempDirectory("graft-zstale-w").toString
    half.repartition(1).write.mode("overwrite").parquet(tmpOut)
    val rewritten = new java.io.File(tmpOut).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.delete(Paths.get(s"$dir/lineitem.parquet"))
    Files.copy(rewritten.toPath, Paths.get(s"$dir/lineitem.parquet"))
    new java.io.File(s"$dir/lineitem.parquet").setLastModified(origMtime)

    val after = Sources.qZOrderScan(spark, dir).collect().toSeq
    assert(after != before,
      "layout answered for the OLD data after in-place regeneration")
    // and it answers exactly the fresh data's box (recompute directly)
    val maxP = half.agg(max("l_partkey")).head().getLong(0)
    val maxS = half.agg(max("l_suppkey")).head().getLong(0)
    val expected = half
      .filter(col("l_partkey") <= maxP / 10 && col("l_suppkey") <= maxS / 10)
      .count()
    assert(after.map(_.getLong(1)).sum == expected,
      "re-staged layout must reproduce the fresh data's row counts")
  }

  // r15 ADVICE: name:size:mtime aliased an in-place rewrite that
  // preserved all three (mtime has filesystem granularity — a rewrite
  // inside one granule is invisible). The manifest now folds in an
  // edge-hash of each file's first/last 4 KB, so only the BYTES decide.
  test("layoutDir fingerprints content: same name/size/mtime rewrite re-keys") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-lfp").toString
    val f = new java.io.File(dir, "t.parquet")
    def write(fill: Byte): Unit = {
      val w = new java.io.FileOutputStream(f)
      try w.write(Array.fill[Byte](8192)(fill)) finally w.close()
      f.setLastModified(1700000000000L) // pin mtime: only content differs
    }
    write(1)
    val a = Sources.layoutDir("graft_lfp", dir, "t.parquet")
    write(2)
    val b = Sources.layoutDir("graft_lfp", dir, "t.parquet")
    assert(f.length == 8192 && f.lastModified == 1700000000000L,
      "rewrite must preserve name, size, and mtime for this to test content")
    assert(a != b,
      "same-size same-mtime in-place rewrite aliased to the stale layout path")
    // and an untouched file keys stably (no spurious re-staging)
    assert(b == Sources.layoutDir("graft_lfp", dir, "t.parquet"))
  }

  // the oracle-gated query (q_zorder_scan) must actually EXHIBIT the
  // skipping the layout exists for — pin its own leaf scan metric, not
  // just the synthetic A/B layout above
  test("gate query q_zorder_scan's scan skips most of the table") {
    val df = Sources.qZOrderScan(spark, sfDir)
    val total = Tables.lineitem(spark, sfDir).count()
    val scanned = scannedRows(df)
    assert(scanned > 0, "box scan must produce rows")
    assert(scanned * 2 <= total,
      s"gate scan read $scanned of $total rows — row-group skipping absent")
  }
}
