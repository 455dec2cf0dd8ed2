package graft.ops

import org.apache.spark.sql.DataFrame

/** Storage hygiene for pinned frames (localCheckpoint or Dataset
  * cache). A pin stores every partition in executor storage and
  * nothing drops it until the context dies — fine for one query, fatal
  * for a gate that runs 163 queries back-to-back twice: at the 100×
  * events stage the PageRank edge pin alone is an O(edges) block set
  * per call, and the second bench pass OOM'd on the accumulation.
  * Callers that pin, release when the answer is materialized (BPE's
  * per-iteration loop pioneered the idiom; PageRank releases after its
  * bounded top-20 collect).
  */
object Checkpoints {

  /** Free the storage blocks of a pinned frame the caller no longer
    * references (best-effort: the ContextCleaner would reclaim them on
    * GC anyway — this bounds PEAK storage). A localCheckpoint'ed
    * frame's data lives in the RDD behind its LogicalRDD leaf —
    * `Dataset.unpersist` can't reach it (it only talks to the
    * CacheManager); a `persist`ed frame is the CacheManager's case.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => df.unpersist(blocking = false)
    }
}
