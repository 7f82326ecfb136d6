package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (the modern UDAF surface, SURVEY.md §2.5's
  * "set-returning bodies → Aggregator[IN, BUF, OUT]"): exact top-k
  * **(key, value)** pairs per group with a BOUNDED buffer — the argument
  * order is (key, value), ranking by the SECOND element.
  *
  * Scale rationale: `row_number() OVER (... ORDER BY v)` top-k sorts every
  * group in full; this aggregator keeps at most k elements per partition
  * and merges k-vs-k map-side, so memory and shuffle are O(k·groups)
  * regardless of group size — the right shape when groups are huge and k
  * is small (top-k per user over years of events). Determinism: ordered by
  * (value DESC, key ASC), key unique ⇒ unique result. Inputs must be
  * non-null (the tuple encoder is non-nullable): filter NULLs upstream.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  // value desc then key asc via explicit comparison — NOT negation, which
  // would map Long.MinValue onto itself and rank it as the maximum
  private val ord: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._2, a._2)
      if (c != 0) c else java.lang.Long.compare(a._1, b._1)
    }
  }

  // buffer invariant: sorted by (value desc, key asc), size <= k
  private def trim(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    xs.sorted(ord).take(k)

  override def zero: Seq[(Long, Long)] = Nil
  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    trim(b :+ a)
  override def merge(b1: Seq[(Long, Long)], b2: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(b1 ++ b2)
  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
