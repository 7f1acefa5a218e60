package graft.ext

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BPE tokenizer training — the merge-learning loop every LLM pipeline
  * runs before it can even count tokens. Two merge rounds are unrolled
  * (like GraphQueries' PageRank rounds) and replayed bit-for-bit in
  * DuckDB CTEs.
  *
  * The classic BPE trick IS the 100 TB story: the corpus-sized work is
  * ONE token-count aggregate (`words`); every later step — char
  * explode, pair counting, merging — runs over the (word, count)
  * VOCABULARY, which is bounded by distinct-token count, not corpus
  * size. The best-pair choice per round is a 1-row
  * TakeOrderedAndProject broadcast, never a driver-side scan.
  *
  * Greedy left-to-right merging (the BPE contract: in "aaaa" the pair
  * "aa" merges at positions 1 and 3, not 2) is expressed relationally:
  * match positions form runs of consecutive p; within a run keep every
  * other match starting at the run head —
  *   m    = [s(p), s(p+1)] = best pair
  *   grp  = p − (running count of matches)     — run id: constant inside
  *                                               a run of consecutive
  *                                               matches, unique across
  *   take = m ∧ (p − min(match p in run)) even — greedy selection
  * then absorbed right-halves (rows whose predecessor was taken) drop
  * and positions renumber. All window passes share the (word, p) sort.
  *
  * Determinism: pair counts are exact integer sums; the best-pair
  * tie-break is (count DESC, left, right) over lowercase-ASCII symbols
  * — binary collation, identical in both engines.
  */
object BpeQueries {

  /** Unrolled merge rounds (a production run does thousands; two prove
    * the fixpoint machinery and keep the oracle SQL readable).
    */
  val Rounds = 2
  /** Final-vocabulary report size. */
  val TopV = 30

  // ---------------------------------------------------------------- SQL

  private def duckRound(t: Int): String =
    s"""pr$t AS (
       |  SELECT word, wc, p, s,
       |    lead(s) OVER (PARTITION BY word ORDER BY p) AS r
       |  FROM syms${t - 1}
       |), pc$t AS (
       |  SELECT s AS l, r, CAST(SUM(wc) AS BIGINT) AS cnt FROM pr$t
       |  WHERE r IS NOT NULL GROUP BY s, r
       |), best$t AS (
       |  SELECT l AS bl, r AS br, cnt AS bcnt FROM pc$t
       |  ORDER BY cnt DESC, l, r LIMIT 1
       |), fl$t AS (
       |  SELECT f.word, f.wc, f.p, f.s, b.bl, b.br,
       |    CASE WHEN f.s = b.bl AND f.r = b.br THEN 1 ELSE 0 END AS m
       |  FROM pr$t f CROSS JOIN best$t b
       |), cg$t AS (
       |  SELECT word, wc, p, s, bl, br, m,
       |    p - SUM(m) OVER (PARTITION BY word ORDER BY p
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |  FROM fl$t
       |), tk$t AS (
       |  SELECT word, wc, p, s, bl, br, m,
       |    CASE WHEN m = 1 AND (p - MIN(CASE WHEN m = 1 THEN p END)
       |        OVER (PARTITION BY word, grp)) % 2 = 0
       |      THEN 1 ELSE 0 END AS take
       |  FROM cg$t
       |), syms$t AS (
       |  SELECT word, wc,
       |    row_number() OVER (PARTITION BY word ORDER BY p) AS p,
       |    CASE WHEN take = 1 THEN bl || br ELSE s END AS s
       |  FROM (SELECT *, lag(take) OVER (PARTITION BY word ORDER BY p) AS pt
       |        FROM tk$t)
       |  WHERE pt IS NULL OR pt = 0
       |)""".stripMargin

  private def duckChain: String =
    s"""${TextOps.duckTokensCte},
       |words AS (
       |  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS wc
       |  FROM tokens WHERE tok <> '' GROUP BY tok
       |), pos0 AS (
       |  SELECT word, wc,
       |    unnest(generate_series(1, CAST(length(word) AS BIGINT))) AS p
       |  FROM words
       |), syms0 AS (
       |  SELECT word, wc, p, substr(word, CAST(p AS INT), 1) AS s FROM pos0
       |),
       |${(1 to Rounds).map(duckRound).mkString(",\n")}""".stripMargin

  private val mergesSql: String =
    s"""WITH $duckChain
       |${(1 to Rounds).map(t =>
            s"SELECT $t AS it, bl AS left_sym, br AS right_sym, bcnt AS pair_count FROM best$t")
          .mkString("\nUNION ALL\n")}
       |ORDER BY it""".stripMargin

  private val vocabSql: String =
    s"""WITH $duckChain
       |SELECT s AS sym, CAST(SUM(wc) AS BIGINT) AS cnt,
       |  CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
       |FROM syms$Rounds GROUP BY s
       |ORDER BY cnt DESC, sym LIMIT $TopV""".stripMargin

  private val applySql: String =
    s"""WITH $duckChain,
       |nsyms AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_syms
       |  FROM syms$Rounds GROUP BY word
       |)
       |SELECT t.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_tok,
       |  CAST(SUM(n.n_syms) AS BIGINT) AS n_bpe,
       |  CAST(SUM(length(t.tok)) AS BIGINT) AS n_chars,
       |  round(CAST(SUM(length(t.tok)) AS DOUBLE) / SUM(n.n_syms), 6)
       |    AS chars_per_sym
       |FROM tokens t JOIN nsyms n ON n.word = t.tok
       |WHERE t.tok <> ''
       |GROUP BY t.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // -------------------------------------------------------------- Spark

  /** Best pair of a round — split from the merge application (r14) so
    * the chain can memoize each piece; expressions unchanged.
    */
  private def mergeBest(syms: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("word").orderBy("p")
    val pr = syms.withColumn("r", lead(col("s"), 1).over(wOrd))
    pr.filter(col("r").isNotNull)
      .groupBy(col("s").as("l"), col("r"))
      .agg(sum(col("wc")).cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("l"), col("r"))
      .limit(1)
      .select(col("l").as("bl"), col("r").as("br"), col("cnt").as("bcnt"))
  }

  /** One merge round's application of a (memoized) best pair. */
  private def mergeApply(syms: DataFrame, best: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("word").orderBy("p")
    val pr = syms.withColumn("r", lead(col("s"), 1).over(wOrd))
    val fl = pr.crossJoin(broadcast(best))
      .withColumn("m",
        when(col("s") === col("bl") && col("r") === col("br"), 1).otherwise(0))
    val cg = fl.withColumn("grp", col("p") - sum(col("m")).over(
      wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tk = cg
      .withColumn("runmin", min(when(col("m") === 1, col("p")))
        .over(Window.partitionBy("word", "grp")))
      .withColumn("take",
        when(col("m") === 1 && (col("p") - col("runmin")) % 2 === 0, 1)
          .otherwise(0))
    val merged = tk
      .withColumn("pt", lag(col("take"), 1).over(wOrd))
      .filter(col("pt").isNull || col("pt") === 0)
      .withColumn("s2",
        when(col("take") === 1, concat(col("bl"), col("br"))).otherwise(col("s")))
      .withColumn("p2", row_number().over(wOrd).cast("long"))
      .select(col("word"), col("wc"), col("p2").as("p"), col("s2").as("s"))
    merged
  }

  /** Char-exploded weighted vocabulary: (word, wc, p, s). */
  private def syms0(spark: SparkSession, d: String): DataFrame =
    TextOps.tokens(spark, d)
      .filter(col("tok") =!= "")
      .groupBy(col("tok").as("word"))
      .agg(count(lit(1)).cast("long").as("wc"))
      .select(col("word"), col("wc"),
        posexplode(sequence(lit(1L), length(col("word")).cast("long")))
          .as(Seq("i0", "p")))
      .select(col("word"), col("wc"), col("p"),
        expr("substring(word, CAST(p AS INT), 1)").as("s"))

  /** Runs the unrolled chain; returns per-round bests and final syms.
    *
    * Per-round relations are memoized (r14, the q_candidates rule):
    * three suite consumers (q_bpe_merges / q_bpe_vocab / q_bpe_apply)
    * each rebuilt the whole unrolled chain, and within one build round
    * k's LAZY plan nested round k-1's plan in BOTH the pair-count and
    * the merge-application branches — the same exponential re-evaluation
    * the CC multi-hop probe measured. Persisting each round's (tiny)
    * symbol table and 1-row best makes every branch read the previous
    * round once, and the second and third consumers ride the memo.
    */
  private def chain(spark: SparkSession, d: String): (Seq[DataFrame], DataFrame) = {
    var syms = graft.Memo.cached(spark, d, "bpe.syms0") {
      syms0(spark, d).persist()
    }
    val bests = (1 to Rounds).map { i =>
      val s = syms
      val best = graft.Memo.cached(spark, d, s"bpe.best$i") {
        mergeBest(s).persist()
      }
      syms = graft.Memo.cached(spark, d, s"bpe.syms$i") {
        mergeApply(s, best).persist()
      }
      best
    }
    (bests, syms)
  }

  val defs: Map[String, QueryDef] = Map(

    // ---- the learned merge table (the tokenizer artifact itself) ----
    "q_bpe_merges" -> QueryDef(mergesSql) { (spark, d) =>
      val (bests, _) = chain(spark, d)
      bests.zipWithIndex.map { case (b, i) =>
        b.select(lit(i + 1).as("it"), col("bl").as("left_sym"),
          col("br").as("right_sym"), col("bcnt").as("pair_count"))
      }.reduce(_ unionAll _).orderBy("it")
    },

    // ---- the symbol inventory after the merges (vocab head) ----
    "q_bpe_vocab" -> QueryDef(vocabSql) { (spark, d) =>
      val (_, syms) = chain(spark, d)
      syms.groupBy(col("s").as("sym"))
        .agg(sum(col("wc")).cast("long").as("cnt"),
          countDistinct(col("word")).cast("long").as("n_words"))
        .orderBy(col("cnt").desc, col("sym"))
        .limit(TopV)
    },

    // ---- tokenizer APPLICATION (train → apply, the full story): count
    //      each doc's tokens under the learned merges. The per-word
    //      symbol count is vocabulary-sized → broadcast; the corpus pass
    //      is one narrow join + one doc_id hash agg — counting tokens
    //      with a learned tokenizer costs the same as q_text_tokens ----
    "q_bpe_apply" -> QueryDef(applySql) { (spark, d) =>
      val (_, syms) = chain(spark, d)
      val nsyms = syms.groupBy("word")
        .agg(count(lit(1)).cast("long").as("n_syms"))
      TextOps.tokens(spark, d)
        .filter(col("tok") =!= "")
        .select(col("doc_id"), col("tok"))
        .join(broadcast(nsyms), col("tok") === col("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_tok"),
          sum(col("n_syms")).cast("long").as("n_bpe"),
          sum(length(col("tok"))).cast("long").as("n_chars"))
        .select(col("doc_id"), col("n_tok"), col("n_bpe"), col("n_chars"),
          round(col("n_chars").cast("double") / col("n_bpe"), 6)
            .as("chars_per_sym"))
        .orderBy("doc_id")
    })
}
