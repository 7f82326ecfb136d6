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

  // first index whose element ranks strictly after `a` (binary search over
  // the sorted buffer)
  private def insertionPoint(b: Seq[(Long, Long)], a: (Long, Long)): Int = {
    var lo = 0; var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.compare(b(mid), a) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def zero: Seq[(Long, Long)] = Vector.empty

  /** Per-row path: O(log k) compare with early reject when the candidate
    * ranks at/after the current k-th element, O(k) slice-insert otherwise —
    * not a full O(k log k) re-sort per input row. */
  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] = {
    if (b.length >= k && (b.isEmpty || ord.compare(a, b.last) >= 0)) return b
    val i = insertionPoint(b, a)
    val inserted = (b.take(i) :+ a) ++ b.drop(i)
    if (inserted.length > k) inserted.take(k) else inserted
  }

  override def merge(b1: Seq[(Long, Long)], b2: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(b1 ++ b2) // k-vs-k, cold path (once per partition pair)
  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
