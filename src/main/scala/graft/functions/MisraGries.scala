package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed [[Aggregator]] — the
  * mergeable heavy-hitters sketch (Agarwal et al., "Mergeable Summaries",
  * PODS'12): each partition folds its rows into at most `k` counters, the
  * shuffle carries one ≤k-entry map per partition instead of an NDV-sized
  * histogram, and merged summaries keep the one-sided guarantee
  *
  *   trueCount(x) − n/(k+1)  ≤  estimate(x)  ≤  trueCount(x)
  *
  * so EVERY item with true count > n/(k+1) is guaranteed present in the
  * final summary. The estimates themselves are processing-order-dependent
  * (any MG is); the guarantee is not — which is exactly what
  * [[graft.operators.Profile.frequentItems]] builds on: MG prunes the
  * candidate space, an exact confirm pass over ≤k candidates makes the
  * thresholded result deterministic and engine-replayable (the
  * [[BloomAggregator]] prune-then-confirm discipline).
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  /** Classic MG step: hit → increment; room → insert; full → decrement
    * every counter (dropping zeros), the arriving item included — each
    * decrement round retires k+1 occurrences, which is where the n/(k+1)
    * error bound comes from.
    */
  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < k => m.updated(x, 1L)
      case None =>
        m.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
    }

  /** Mergeable-summaries merge: sum counts, and if more than k survive,
    * subtract the (k+1)-th largest count from all and drop the
    * non-positive — at most k entries can exceed that cut, and the
    * subtraction adds the two inputs' error bounds, preserving the
    * combined n/(k+1) guarantee.
    */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (m.size <= k) m
    else {
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (key, c) => if (c > cut) Some(key -> (c - cut)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Map[String, Long] = m

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
