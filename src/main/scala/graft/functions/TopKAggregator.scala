package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k by score: a bounded-state `Aggregator` — the
  * clean UDAF form of "top k per key" (the reference could only express
  * this as a reducer exe over a sorted group).
  *
  * State is a sorted list capped at k, so partial aggregation carries at
  * most k elements per group per partition — O(groups·k) shuffle bytes
  * instead of the full data, which is the whole point at scale (the
  * window-function formulation shuffles every row).
  *
  * Ordering: score DESC, then id ASC — fully deterministic under any
  * merge order.
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Double), List[(Long, Double)], Seq[(Long, Double)]] {

  private def insert(buf: List[(Long, Double)],
    x: (Long, Double)): List[(Long, Double)] = {
    val merged = (x :: buf).sortBy { case (id, score) => (-score, id) }
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[(Long, Double)] = Nil

  override def reduce(buf: List[(Long, Double)],
    x: (Long, Double)): List[(Long, Double)] = insert(buf, x)

  override def merge(a: List[(Long, Double)],
    b: List[(Long, Double)]): List[(Long, Double)] =
    (a ++ b).sortBy { case (id, score) => (-score, id) }.take(k)

  override def finish(r: List[(Long, Double)]): Seq[(Long, Double)] = r

  override def bufferEncoder: Encoder[List[(Long, Double)]] =
    ExpressionEncoder[List[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
