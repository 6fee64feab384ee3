package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch (SURVEY.md §2.5 sketch family, with
  * HLL distinct counts and the quantile sketch): at most `k` counters;
  * an unseen item beyond capacity decrements every counter instead of
  * evicting one. Classic guarantees, preserved under MERGE (the merge is
  * counter-wise addition followed by the same decrement compaction, per
  * Agarwal et al.'s mergeable-summaries result):
  *
  *   - every stored count underestimates the true frequency by at most
  *     n/(k+1) (n = stream length);
  *   - every TRUE heavy hitter (frequency > n/(k+1)) is guaranteed to be
  *     in the sketch — recall 1.0 for heavy hitters, certified
  *     driver-visibly by q110.
  *
  * The buffer is a bounded map (≤ k entries): partial aggregation works,
  * shuffle volume is O(k) per group regardless of data size — the 100 TB
  * shape for "top terms per corpus slice". Exact per-key counting
  * (q68-style) stays the fixture-scale reference.
  */
class FrequentItems(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {

  private def compact(m: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    if (m.size <= k) return m
    // decrement all by the smallest excess count; drop zeros — the
    // batched form of per-item decrements (same bound, fewer passes)
    while (m.size > k) {
      val dec = m.values.min
      val dead = m.collect { case (key, c) if c <= dec => key }.toSeq
      m.mapValuesInPlace((_, c) => c - dec)
      dead.foreach(m.remove)
    }
    m
  }

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long], a: String): mutable.Map[String, Long] = {
    b.updateWith(a) { case prev => Some(prev.getOrElse(0L) + 1L) }
    compact(b)
  }

  override def merge(x: mutable.Map[String, Long], y: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    y.foreach { case (key, c) =>
      x.updateWith(key) { case prev => Some(prev.getOrElse(0L) + c) }
    }
    compact(x)
  }

  override def finish(m: mutable.Map[String, Long]): Map[String, Long] = m.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
