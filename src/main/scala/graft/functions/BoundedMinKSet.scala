package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (h, s) candidate for [[BoundedMinKSet]] — h is the deterministic
  * h60 cap order, s the payload id.
  */
final case class HsPair(h: Long, s: Long)

/** Bounded distinct-min-K typed aggregate: keeps the K smallest DISTINCT
  * (h, s) pairs per group, ordered by (h ASC, s ASC), and finishes to the
  * member s values sorted ascending — exactly
  * `array_sort(transform(slice(array_sort(collect_set(struct(h, s))), 1, K),
  * x -> x.s))`, but with O(K) per-group state at EVERY stage: each
  * mapper's partial buffer, the partial→final shuffle rows, and the merge
  * buffer all hold at most K entries, where the collect_set formulation
  * buffers a group's ENTIRE distinct set before the slice (VERDICT r14
  * "what's wrong #1": a zipf hub with 10⁶–10⁷ distinct members is a
  * multi-GB single-key aggregation buffer; here it is K entries
  * regardless).
  *
  * Correctness of the bound: a pair in the global K smallest distinct set
  * has fewer than K distinct pairs below it in ANY single partition, so it
  * survives that partition's partial top-K; the merge of partials
  * therefore contains every global top-K member, and re-capping yields
  * exactly the global answer. Duplicate-insensitive by construction
  * (reduce rejects buffer members; merge dedups), so pre-aggregation
  * `DISTINCT` is subsumed.
  */
class BoundedMinKSet(k: Int) extends Aggregator[HsPair, Seq[HsPair], Seq[Long]] {

  private def lt(a: HsPair, b: HsPair): Boolean =
    a.h < b.h || (a.h == b.h && a.s < b.s)

  override def zero: Seq[HsPair] = Vector.empty

  // The buffer invariant — (h, s)-ascending, distinct, ≤ k entries — makes
  // the per-row path one O(1) reject test for the common case (a full
  // buffer whose worst member is no worse than the candidate, which also
  // covers duplicates of the kth entry) and one O(log k) binary search
  // otherwise (dedup test and insertion point in the same search; no
  // linear contains, no re-sort per insert).
  override def reduce(b: Seq[HsPair], a: HsPair): Seq[HsPair] = {
    val n = b.length
    if (n >= k && !lt(a, b(n - 1))) return b
    var lo = 0
    var hi = n
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (lt(b(m), a)) lo = m + 1 else hi = m
    }
    if (lo < n && b(lo) == a) return b // already a member
    val grown = (b.take(lo) :+ a) ++ b.drop(lo)
    if (grown.length > k) grown.take(k) else grown
  }

  override def merge(x: Seq[HsPair], y: Seq[HsPair]): Seq[HsPair] =
    ((x ++ y).distinct.sortWith(lt)).take(k)

  override def finish(b: Seq[HsPair]): Seq[Long] = b.map(_.s).sorted

  override def bufferEncoder: Encoder[Seq[HsPair]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
