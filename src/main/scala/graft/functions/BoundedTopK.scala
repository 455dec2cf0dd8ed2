package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Generic bounded-state per-group top-k: the [[TopKAggregator]] idea
  * (state capped at k, so partial aggregation ships O(groups·k) rows
  * per partition instead of the whole group) for ANY element type with
  * a serializable `Ordering`.
  *
  * This exists because "top k per group" over a LOW-cardinality group
  * key is the one shape a window cannot survive at scale: row_number()
  * OVER (PARTITION BY source) hashes an entire stratum — at 100 TB,
  * trillions of rows — into ONE task and sorts it there. A bounded
  * Aggregator reduces each map partition to ≤ k candidates before the
  * exchange, so the shuffle and the final merge are O(partitions·k)
  * per group no matter how big the stratum is, and no task ever
  * materializes a full group.
  *
  * Ordering must be total and deterministic (break ties on a unique
  * id) so the result is identical under any merge order. The caller
  * supplies it smallest-first for "keep" — i.e. `Ordering.by(x =>
  * (-x.score, x.id))` keeps the k highest scores.
  */
class BoundedTopK[T: TypeTag](k: Int, ord: Ordering[T])
  extends Aggregator[T, List[T], Seq[T]] {

  private def top(xs: List[T]): List[T] = {
    val sorted = xs.sorted(ord)
    if (sorted.length > k) sorted.take(k) else sorted
  }

  override def zero: List[T] = Nil

  override def reduce(buf: List[T], x: T): List[T] = top(x :: buf)

  override def merge(a: List[T], b: List[T]): List[T] = top(a ++ b)

  override def finish(r: List[T]): Seq[T] = r

  override def bufferEncoder: Encoder[List[T]] = ExpressionEncoder[List[T]]()

  override def outputEncoder: Encoder[Seq[T]] = ExpressionEncoder[Seq[T]]()
}
