package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Mutable Misra–Gries state. Counter values are stored ABSOLUTE; an entry
  * is live iff stored > base, and its effective count is stored − base —
  * so "decrement every counter" is `base += 1`, O(1) instead of an O(k)
  * rebuild per untracked token. `hist` maps a stored value to the number
  * of live entries holding it, which makes the deaths at a base bump
  * (entries whose stored value the base just reached) an O(1) lookup.
  * Dead entries linger in `counts` as garbage and are purged when the map
  * doubles past k (amortized O(1): each purge removes what insertions
  * created). Kryo-encoded: serialization happens only at partial-agg
  * boundaries, never per row.
  */
final class MGBuffer(
    val counts: mutable.HashMap[String, Long],
    val hist: mutable.HashMap[Long, Long],
    var base: Long,
    var live: Long,
    var total: Long) extends Serializable {
  def effective: Map[String, Long] =
    counts.iterator.collect { case (w, v) if v > base => w -> (v - base) }.toMap
}

/** Misra–Gries heavy-hitter sketch as a typed `Aggregator` (the mergeable-
  * summaries formulation of Agarwal et al., PODS'12): at most `k` live
  * counters per buffer, guaranteed to retain EVERY item whose true
  * frequency exceeds N/(k+1). The output is the candidate set plus the
  * exact total count, so a second, candidate-filtered pass can recount
  * exactly — candidate generation never shuffles the full key space, which
  * is the point at 100 TB: a raw `groupBy(word)` moves the whole
  * vocabulary; this moves at most k strings per map partition.
  *
  * reduce: standard MG — increment a live counter, insert if below k live,
  * otherwise decrement all counters by one (a base bump — the new item is
  * absorbed by the decrement). Every path is O(1) amortized. merge:
  * counter-wise sum of effective counts, then subtract the (k+1)-th
  * largest value and drop non-positives — the mergeable-summary rule that
  * preserves the N/(k+1) error bound across partials (cold path: once per
  * partition pair).
  *
  * The buffer also carries the running total N, so one aggregation job
  * yields both the candidates and the threshold denominator.
  */
class MisraGries(k: Int)
    extends Aggregator[String, MGBuffer, (Seq[String], Long)] {

  override def zero: MGBuffer =
    new MGBuffer(mutable.HashMap.empty, mutable.HashMap.empty, 0L, 0L, 0L)

  private def histInc(b: MGBuffer, v: Long): Unit =
    b.hist.update(v, b.hist.getOrElse(v, 0L) + 1L)
  private def histDec(b: MGBuffer, v: Long): Unit = {
    val n = b.hist.getOrElse(v, 0L) - 1L
    if (n <= 0L) b.hist.remove(v) else b.hist.update(v, n)
  }

  override def reduce(b: MGBuffer, w: String): MGBuffer = {
    b.total += 1L
    b.counts.get(w) match {
      case Some(v) if v > b.base => // live counter: increment
        histDec(b, v); histInc(b, v + 1L); b.counts.update(w, v + 1L)
      case _ => // absent, or a dead remnant below the base
        if (b.live < k) { // room (possibly overwriting a dead remnant)
          b.counts.update(w, b.base + 1L); histInc(b, b.base + 1L); b.live += 1L
          if (b.counts.size > 2 * k) // purge dead garbage, amortized O(1)
            b.counts.filterInPlace((_, v) => v > b.base)
        } else { // decrement-all = base bump; stored == new base dies
          b.base += 1L
          b.live -= b.hist.remove(b.base).getOrElse(0L)
        }
    }
    b
  }

  override def merge(b1: MGBuffer, b2: MGBuffer): MGBuffer = {
    val m1 = b1.effective; val m2 = b2.effective
    val sum = (m1.keySet ++ m2.keySet).iterator
      .map(w => w -> (m1.getOrElse(w, 0L) + m2.getOrElse(w, 0L))).toMap
    val trimmed =
      if (sum.size <= k) sum
      else {
        // (k+1)-th largest counter value; subtracting it keeps at most k
        // strictly-positive counters and preserves the MG error bound
        val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
        sum.collect { case (w, c) if c > cut => w -> (c - cut) }
      }
    val out = zero
    out.total = b1.total + b2.total
    out.live = trimmed.size.toLong
    trimmed.foreach { case (w, c) => out.counts.update(w, c); histInc(out, c) }
    out
  }

  /** Sorted for determinism — the candidate list feeds an exact recount, so
    * its order carries no information, but stable output simplifies tests. */
  override def finish(r: MGBuffer): (Seq[String], Long) =
    (r.effective.keys.toSeq.sorted, r.total)

  override def bufferEncoder: Encoder[MGBuffer] = Encoders.kryo[MGBuffer]
  override def outputEncoder: Encoder[(Seq[String], Long)] =
    ExpressionEncoder[(Seq[String], Long)]()
}
