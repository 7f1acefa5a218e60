package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** BPE merge-learning + BM25 retrieval behavior checks (the cross-engine
  * bit-parity itself is oracle-gated; these pin the semantics).
  */
class BpeSpec extends SparkSpec {

  test("q_bpe_merges: round-1 merge is the true most-frequent weighted char pair") {
    val merges = SparkEntry.defs("q_bpe_merges").build(spark, sf()).collect()
    assert(merges.length == BpeQueries.Rounds)
    assert(merges.map(_.getInt(0)).toSeq == (1 to BpeQueries.Rounds))
    // recompute round 1 independently: weighted adjacent-char counts
    // over the distinct-token vocabulary
    val words = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    words.foreach { case (w, c) =>
      w.sliding(2).foreach { p =>
        if (p.length == 2) {
          val k = (p.substring(0, 1), p.substring(1, 2))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
        }
      }
    }
    val (bestPair, bestCnt) = pairCounts.toSeq
      .sortBy { case ((l, r), c) => (-c, l, r) }.head
    assert((merges.head.getString(1), merges.head.getString(2)) == bestPair)
    assert(merges.head.getLong(3) == bestCnt)
    // later rounds never beat earlier ones (greedy picks max each time)
    assert(merges.sliding(2).forall {
      case Array(a, b) => a.getLong(3) >= b.getLong(3); case _ => true })
  }

  test("q_bpe_vocab: merged symbols appear and mass is conserved") {
    val vocab = SparkEntry.defs("q_bpe_vocab").build(spark, sf()).collect()
    assert(vocab.nonEmpty && vocab.length <= BpeQueries.TopV)
    assert(vocab.exists(_.getString(0).length > 1), "expected a merged multi-char symbol")
    // ordered by weighted count desc
    assert(vocab.sliding(2).forall {
      case Array(a, b) => a.getLong(1) >= b.getLong(1); case _ => true })
  }

  test("q_bpe_apply: symbol counts shrink vs chars and cover every doc") {
    val r = SparkEntry.defs("q_bpe_apply").build(spark, sf()).collect()
    val nDocs = spark.read.parquet(s"${sf()}/documents.parquet").count()
    assert(r.length.toLong == nDocs, "every doc must be counted")
    r.foreach { row =>
      val (nTok, nBpe, nChars) = (row.getLong(1), row.getLong(2), row.getLong(3))
      // merges only ever shrink: tokens <= BPE symbols <= chars
      assert(nTok <= nBpe && nBpe <= nChars, s"$nTok <= $nBpe <= $nChars")
      assert(row.getDouble(4) >= 1.0, "chars per symbol >= 1 by construction")
    }
    // the two learned merges must actually compress somewhere
    assert(r.exists(row => row.getLong(2) < row.getLong(3)))
  }

  test("q_lm_perplexity: fixed-point nll matches a driver-side recompute") {
    val r = SparkEntry.defs("q_lm_perplexity").build(spark, sf()).collect()
    assert(r.nonEmpty)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(row => row.getLong(0) -> row.getString(1).split(" ", -1).toSeq)
    val pairs = docs.flatMap { case (_, ts) => ts.sliding(2).collect {
      case Seq(a, b) => (a, b) } }
    val big = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val tot = big.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val v = docs.flatMap(_._2).distinct.length.toDouble
    val top = r.head
    val toks = docs.toMap.apply(top.getLong(0))
    val nll = toks.sliding(2).collect { case Seq(a, b) =>
      // HALF_UP like Spark/DuckDB round(), not rint's half-even
      math.floor(math.log((tot(a).toDouble + v) / (big((a, b)).toDouble + 1.0))
        * 1000000.0 + 0.5).toLong
    }.sum
    assert(top.getLong(2) == nll, s"engine ${top.getLong(2)} vs direct $nll")
    assert(r.forall(_.getDouble(3) >= 1.0), "perplexity >= 1")
  }

  test("q_text_bm25: scores match a driver-side Okapi computation") {
    val r = SparkEntry.defs("q_text_bm25").build(spark, sf()).collect()
    assert(r.nonEmpty && r.length <= 50)
    assert(r.sliding(2).forall {
      case Array(a, b) =>
        a.getDouble(2) > b.getDouble(2) ||
          (a.getDouble(2) == b.getDouble(2) && a.getLong(0) < b.getLong(0))
      case _ => true })
    // independent recompute for the top doc
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(row => row.getLong(0) -> row.getString(1).split(" ").toSeq)
    val terms = Seq("spark", "hash", "merge", "scan")
    val nd = docs.length.toDouble
    val avgNum = docs.map(_._2.length.toLong).sum.toDouble
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val top = r.head
    val toks = docs.toMap.apply(top.getLong(0))
    val dl = toks.length.toDouble
    val expected = terms.map { t =>
      val tf = toks.count(_ == t).toDouble
      if (tf == 0) 0.0
      else math.log(1.0 + (nd - df(t) + 0.5) / (df(t) + 0.5)) *
        (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl * nd / avgNum)))
    }.sum
    assert(math.abs(top.getDouble(2) - expected) < 1e-5,
      s"engine ${top.getDouble(2)} vs direct $expected")
  }
}
