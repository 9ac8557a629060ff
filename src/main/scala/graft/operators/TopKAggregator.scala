package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator surface (SURVEY §2.6/§7.3): bounded top-k of
  * (id, score) pairs — the building block for distributed similarity
  * search when the consumer wants "k best per group" rather than a global
  * sort.
  *
  * Scale design: the buffer is a bounded min-heap of size k, so partial
  * aggregation ships at most k pairs per task regardless of input size —
  * the same communication pattern as TakeOrderedAndProject but usable
  * inside any groupBy. Merge is O(k log k).
  */
case class ScoredId(id: Long, score: Double)

class TopKByScore(k: Int)
    extends Aggregator[ScoredId, mutable.PriorityQueue[ScoredId], Seq[ScoredId]] {

  // min-heap by score (then id desc so ties evict the larger id first,
  // keeping the result deterministic)
  private def ord: Ordering[ScoredId] =
    Ordering.by[ScoredId, (Double, Long)](s => (-s.score, s.id))

  override def zero: mutable.PriorityQueue[ScoredId] =
    mutable.PriorityQueue.empty[ScoredId](ord)

  override def reduce(buf: mutable.PriorityQueue[ScoredId], a: ScoredId):
      mutable.PriorityQueue[ScoredId] = {
    buf.enqueue(a)
    while (buf.size > k) buf.dequeue()
    buf
  }

  override def merge(a: mutable.PriorityQueue[ScoredId],
      b: mutable.PriorityQueue[ScoredId]): mutable.PriorityQueue[ScoredId] = {
    b.foreach(a.enqueue(_))
    while (a.size > k) a.dequeue()
    a
  }

  override def finish(buf: mutable.PriorityQueue[ScoredId]): Seq[ScoredId] =
    buf.toSeq.sortBy(s => (-s.score, s.id))

  override def bufferEncoder: Encoder[mutable.PriorityQueue[ScoredId]] =
    Encoders.kryo[mutable.PriorityQueue[ScoredId]]

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
