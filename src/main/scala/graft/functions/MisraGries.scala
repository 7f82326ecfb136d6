package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter sketch as a typed `Aggregator` (the mergeable-
  * summaries formulation of Agarwal et al., PODS'12): at most `k` counters
  * per buffer, guaranteed to retain EVERY item whose true frequency exceeds
  * N/(k+1). The output is the candidate set plus the exact total count, so
  * a second, candidate-filtered pass can recount exactly — candidate
  * generation never shuffles the full key space, which is the point at
  * 100 TB: a raw `groupBy(word)` moves the whole vocabulary; this moves at
  * most k strings per map partition.
  *
  * reduce: standard MG — increment a present counter, insert if below k,
  * otherwise decrement all counters by one and drop zeros (the new item is
  * absorbed by the decrement). merge: counter-wise sum, then subtract the
  * (k+1)-th largest value and drop non-positives — the mergeable-summary
  * rule that preserves the N/(k+1) error bound across partials.
  *
  * The buffer also carries the running total N, so one aggregation job
  * yields both the candidates and the threshold denominator.
  */
class MisraGries(k: Int)
    extends Aggregator[String, (Map[String, Long], Long), (Seq[String], Long)] {

  override def zero: (Map[String, Long], Long) = (Map.empty, 0L)

  override def reduce(b: (Map[String, Long], Long), w: String): (Map[String, Long], Long) = {
    val (m, n) = b
    val m2 =
      if (m.contains(w)) m.updated(w, m(w) + 1L)
      else if (m.size < k) m.updated(w, 1L)
      else m.flatMap { case (x, c) => if (c > 1L) Some(x -> (c - 1L)) else None }
    (m2, n + 1L)
  }

  override def merge(b1: (Map[String, Long], Long), b2: (Map[String, Long], Long)): (Map[String, Long], Long) = {
    val (m1, n1) = b1; val (m2, n2) = b2
    val sum = (m1.keySet ++ m2.keySet).iterator
      .map(w => w -> (m1.getOrElse(w, 0L) + m2.getOrElse(w, 0L))).toMap
    val trimmed =
      if (sum.size <= k) sum
      else {
        // (k+1)-th largest counter value; subtracting it keeps at most k
        // strictly-positive counters and preserves the MG error bound
        val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
        sum.flatMap { case (w, c) => if (c > cut) Some(w -> (c - cut)) else None }
      }
    (trimmed, n1 + n2)
  }

  /** Sorted for determinism — the candidate list feeds an exact recount, so
    * its order carries no information, but stable output simplifies tests. */
  override def finish(r: (Map[String, Long], Long)): (Seq[String], Long) =
    (r._1.keys.toSeq.sorted, r._2)

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    ExpressionEncoder[(Map[String, Long], Long)]()
  override def outputEncoder: Encoder[(Seq[String], Long)] =
    ExpressionEncoder[(Seq[String], Long)]()
}
