package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE merge-loop k-sweep: time [[graft.ops.Bpe.bpeMergesOf]] at
  * k = 5, 10, 25, 50 and report total and PER-ITERATION cost. With the
  * per-iteration eager localCheckpoint the loop is two narrow corpus
  * passes per merge, so per-iteration cost must be ~flat in k; before
  * the fix (round ≤7) each iteration re-ran the whole rewrite lineage
  * from the scan, making it grow ~linearly with k (O(k²) total) — the
  * failure this probe exists to catch regressing.
  *
  * The k=50 run follows the scaladoc's own 100 TB recipe: merges are
  * learned on a hash-sampled slice (`pmod(hash(doc_id), s) = 0`) —
  * the merge table converges long before the full corpus is counted —
  * then the 50-rule table is applied corpus-wide in one pass
  * ([[graft.ops.Bpe.bpeApply]]: k chained codegen'd regexp_replace
  * projections + one aggregate, no training on the target).
  *
  * Usage: runMain graft.tools.BpeProbe [sfDir]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    val docs = graft.Tables.documentsSpread(spark, sfDir).cache()
    val nDocs = docs.count()

    // JIT/codegen warmup outside every timed region
    graft.ops.Bpe.bpeMergesOf(docs, 2).collect()

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bpe-probe] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    println(s"[bpe-probe] corpus: $nDocs docs @ $sfDir")
    Seq(5, 10, 25, 50).foreach { k =>
      val t0 = System.nanoTime()
      val m = graft.ops.Bpe.bpeMergesOf(docs, k).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-probe] merges k=$k%-3d total ${sec}%7.2f s  " +
        f"per-iter ${sec / k}%5.3f s  (${m.length} merges)")
    }

    // 100 TB recipe end-to-end: train k=50 on a 1-in-4 hash slice,
    // apply the shipped table corpus-wide in one pass.
    val slice = docs.filter(pmod(hash(col("doc_id")), lit(4)) === 0)
    val table = time("train k=50 on 1/4 slice")(
      graft.ops.Bpe.bpeMergesOf(slice, 50).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)
    val applied = time("apply 50-rule corpus-wide")(
      graft.ops.Bpe.bpeApply(docs, table).collect())
    applied.foreach(r => println(s"[bpe-probe]   $r"))
    docs.unpersist()
    spark.stop()
  }
}
