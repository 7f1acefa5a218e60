package graft.rank

import org.apache.spark.sql.{Encoder, Encoders}
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
