package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary as a typed UDAF — the candidate
  * PREFILTER for exact heavy-hitter queries at corpus scale.
  *
  * The frequent-items problem at 100 TB: `GROUP BY token` shuffles the
  * entire vocabulary (billions of distinct keys) to answer a question
  * whose output is a handful of rows. Misra–Gries keeps k counters per
  * partition in one map-side pass, merges k-sized summaries (a few KB) at
  * the driver-side aggregate, and GUARANTEES the summary contains every
  * item with true count > n/(k+1) (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012). Exact counts are
  * then recovered with a second pass that aggregates ONLY the ≤k candidate
  * tokens (a broadcast semi-join) — so the token-granularity shuffle never
  * happens, and the result is still EXACT, not approximate.
  *
  * Counter semantics: `reduce` decrements all k counters when a new item
  * arrives at a full summary (each decrement "cancels" k+1 distinct
  * occurrences, which bounds undercount by n/(k+1)); `merge` sums
  * counters pointwise, then subtracts the (k+1)-th largest value and
  * drops non-positives — the smallest uniform decrement that restores
  * |summary| ≤ k, preserving the additive error bound. Estimated counts
  * are LOWER bounds on true counts; the containment guarantee is what the
  * two-pass plan relies on, never the estimates themselves.
  */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"Misra-Gries needs at least one counter, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] = {
    if (tok == null) return b
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1L)
      case None if b.size < k => b.updated(tok, 1L)
      case None =>
        // full summary, unseen item: decrement ALL counters by one (the
        // arriving item's implicit counter hits 0 and is not stored)
        b.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long])
      : Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val sum = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest counter value from everything;
      // ≤ k survive (values strictly above the cut), error stays additive
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
