package graft.rank

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-K typed aggregate (SURVEY.md §4.3's optional custom
  * aggregate): keeps the K best (score DESC, item ASC) pairs per group in
  * a K-bounded buffer, so per-group state is O(K) regardless of group
  * size — the window/row_number formulation ranks every candidate before
  * filtering (Spark's WindowGroupLimit mitigates, but state is still the
  * partition's rows; this aggregate also merges map-side, shrinking the
  * shuffle to K rows per group per mapper).
  *
  * Ordering matches the metric window exactly: score descending, item_id
  * ascending tiebreak (np.argsort-stable analogue, SURVEY.md §7 risk 3).
  */
final case class ScoredItem(score: Long, item_id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredItem, Seq[ScoredItem], Seq[ScoredItem]] {

  private val ord: Ordering[ScoredItem] =
    Ordering.by((s: ScoredItem) => (-s.score, s.item_id))

  override def zero: Seq[ScoredItem] = Vector.empty

  override def reduce(b: Seq[ScoredItem], a: ScoredItem): Seq[ScoredItem] =
    if (b.lengthCompare(k) >= 0 && ord.gteq(a, b.last)) b
    else ((b :+ a).sorted(ord)).take(k)

  override def merge(x: Seq[ScoredItem], y: Seq[ScoredItem]): Seq[ScoredItem] =
    ((x ++ y).sorted(ord)).take(k)

  override def finish(b: Seq[ScoredItem]): Seq[ScoredItem] = b

  override def bufferEncoder: Encoder[Seq[ScoredItem]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredItem]] = ExpressionEncoder()
}

/** Bounded top-K buffer for manual partial aggregation: a fixed-K
  * insertion-sorted (score DESC, item ASC) top list with is-positive
  * flags and an O(1) reject fast path. Used by
  * [[Metrics.posRanksDigest]], the network-optimal rank formulation —
  * each mapper reduces its rows to ≤K-entry digests per group, so the
  * metric shuffle carries a bounded digest instead of every candidate
  * row. Hand-rolled rather than a typed `Aggregator` because
  * `ObjectHashAggregate` falls back to sort-based aggregation past 128
  * groups per partition (spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold), which re-sorts every input row.
  */
final class TopBuf(k: Int) {
  val scores = new Array[Long](k)
  val items = new Array[Long](k)
  val pos = new Array[Boolean](k)
  var n = 0

  private def beats(s: Long, i: Long, idx: Int): Boolean =
    s > scores(idx) || (s == scores(idx) && i < items(idx))

  def insert(s: Long, i: Long, p: Boolean): Unit = {
    if (n == k && !beats(s, i, n - 1)) return
    var idx = if (n < k) n else k - 1
    while (idx > 0 && beats(s, i, idx - 1)) {
      scores(idx) = scores(idx - 1); items(idx) = items(idx - 1)
      pos(idx) = pos(idx - 1)
      idx -= 1
    }
    scores(idx) = s; items(idx) = i; pos(idx) = p
    if (n < k) n += 1
  }

  /** 1-based rank of the positive within the buffer, 0 if it fell out. */
  def rank: Int = {
    var j = 0
    while (j < n) { if (pos(j)) return j + 1; j += 1 }
    0
  }
}
