package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters summary as a typed Aggregator — the
  * bounded-memory, mergeable at-scale replacement for an exact vocabulary
  * count (q84's plan keeps one row per DISTINCT token alive through the
  * shuffle; at 100 TB of web text that distinct set is itself enormous,
  * while this buffer is ≤ k entries per task regardless of input).
  *
  * Classic streaming summary (Misra & Gries 1982): resident items
  * increment; a non-resident item either takes a free slot or decrements
  * every counter (dropping zeros). Merge is the mergeable-summaries form
  * (Agarwal et al., PODS 2012): add counts pointwise, then subtract the
  * (k+1)-th largest count from everything and drop non-positives — at most
  * k survive, and total decrement mass stays bounded.
  *
  * Guarantee carried through any partitioning/merge tree: every counter
  * underestimates its item's true count by at most n/k (n = total items),
  * so any item with true count > n/k is PRESENT in the summary — the
  * superset property [[FrequentItems.exactHeavyHitters]] verifies
  * end-to-end. Estimates themselves are partitioning-dependent (decrement
  * order differs); only presence is contractual, which is why the
  * gate-facing plan re-counts candidates exactly.
  */
class MisraGries(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
  require(k >= 2, s"k ($k) must be >= 2")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long], item: String):
      mutable.Map[String, Long] = {
    buf.get(item) match {
      case Some(c) => buf(item) = c + 1
      case None if buf.size < k => buf(item) = 1L
      case None =>
        // decrement-all step: O(k), only on a miss with a full buffer
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]):
      mutable.Map[String, Long] = {
    b.foreach { case (t, c) => a(t) = a.getOrElse(t, 0L) + c }
    if (a.size > k) {
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      // keep strictly-above-cut (≤ k items can exceed the (k+1)-th
      // largest), then subtract the cut — survivors stay ≥ 1
      a.filterInPlace((_, c) => c > cut)
      a.mapValuesInPlace((_, c) => c - cut)
    }
    a
  }

  override def finish(buf: mutable.Map[String, Long]): Map[String, Long] =
    buf.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object FrequentItems {

  /** One-pass MG summary of `itemCol`: ≤ k (item, estimate) entries.
    * Partials are ≤ k entries per task; the shuffle moves sketches, never
    * the distinct-item set. */
  def sketch(items: DataFrame, itemCol: String, k: Int): Map[String, Long] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(itemCol).cast("string")).as[String]
      .select(new MisraGries(k).toColumn).head()
  }

  /** EXACT items with true count strictly > n/k, via the canonical two-pass
    * sketch-then-verify plan: pass 1 builds the MG summary (whose superset
    * guarantee means no qualifying item can be missing from it) AND the
    * total n in the SAME scan — MG cannot recover n, and a separate
    * count() would be a third full read of the input; pass 2 re-counts
    * ONLY the ≤ k candidates exactly (map-side literal isin filter, tiny
    * aggregate) and keeps those with cnt·k > n — integer arithmetic, no
    * float threshold. Output is exact and deterministic even though sketch
    * ESTIMATES are partitioning-dependent; a broken sketch (lost
    * candidate) surfaces as a missing output row. The driver-side collects
    * are k-bounded (CONFIG, not data).
    *
    * Input contract: `items` must be DETERMINISTIC across jobs — the two
    * passes are separate Spark jobs over the same plan, so a source whose
    * contents change between them (rand()/sample-derived frames, a live
    * external table) can make the candidate set and the re-count disagree,
    * silently voiding the superset guarantee. For such inputs the caller
    * must snapshot first (`df.persist()` + materialize, or
    * `df.localCheckpoint(eager = true)`) and pass the snapshot; this
    * library does not persist internally because pass 2 is LAZY — the
    * returned DataFrame executes at the caller's discretion, after any
    * scope this function could safely unpersist in. */
  def exactHeavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val (sk, n) = items.select(col(itemCol).cast("string")).as[String]
      .select(new MisraGries(k).toColumn, count(lit(1)).as[Long])
      .head()
    val candidates = sk.keys.toSeq.sorted
    items.filter(col(itemCol).isin(candidates: _*))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > lit(n))
  }
}
