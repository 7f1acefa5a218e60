package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Record-linkage and corpus-diversity operators: blocked edit-distance
  * fuzzy join, and per-source token entropy.
  *
  * Fuzzy join is the edit-distance member of the dedup/linkage family
  * (MinHash/SimHash/n-gram cover set similarity; this covers TYPO-class
  * near-identity — titles, URLs, names). The scalable shape is the same
  * as every LSH family here: a cheap BLOCKING key turns the O(n²) pair
  * space into an equi-join (shuffle on the block key), and the exact —
  * more expensive — verifier runs only inside blocks. At 100 TB the
  * block key would be a SimHash byte-block or normalized prefix exactly
  * as below; the verify is Spark's `levenshtein(l, r, threshold)`, which
  * early-abandons the DP at the bound (O(len·k) not O(len²)).
  *
  * Entropy is the token-diversity quality signal (low-entropy sources =
  * TEMPLATE/boilerplate farms — a standard pretraining-corpus filter
  * axis). Exact counts aggregate distributedly; the log-sum is
  * fixed-pointed per TERM (round(c·log2(c)·1e6) as BIGINT) so the
  * accumulation is integer-exact and order-independent — only the final
  * one-row expression is IEEE, mirrored in the oracle.
  */
object LinkQueries {

  /** Blocking prefix length (exact-match chars) for the fuzzy join. */
  val BlockLen = 12
  /** Compared head length and max edit distance. */
  val HeadLen = 60
  val MaxDist = 5

  val defs: Map[String, QueryDef] = Map(

    // ---- q_fuzzy_join: near-identical document heads via blocked
    //      levenshtein. Candidates = docs sharing a $BlockLen-char
    //      prefix (equi-join — ONE shuffle on the block key, block
    //      sizes bounded by prefix cardinality); verify = edit distance
    //      over the $HeadLen-char head ≤ $MaxDist. Spark side passes the
    //      threshold to levenshtein so the DP abandons early; retained
    //      pairs carry the true distance, so the result is identical to
    //      the unthresholded oracle ----
    "q_fuzzy_join" -> QueryDef(
      s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  levenshtein(substr(a.text, 1, $HeadLen),
        |              substr(b.text, 1, $HeadLen)) AS dist
        |FROM documents a JOIN documents b
        |  ON substr(a.text, 1, $BlockLen) = substr(b.text, 1, $BlockLen)
        | AND a.doc_id < b.doc_id
        |WHERE levenshtein(substr(a.text, 1, $HeadLen),
        |                  substr(b.text, 1, $HeadLen)) <= $MaxDist
        |ORDER BY doc_a, doc_b""".stripMargin) { (spark, d) =>
      // REPRESENTATIVE factoring (r11, same proof shape as
      // minhashVerifiedPairs): dist depends only on the two HEADS, and
      // the block is a prefix of the head — so the DP runs once per
      // distinct-head pair and the full relation is an output-sized
      // expansion (within-group pairs are dist 0 by definition). On the
      // 100× hot-source axis (~100 identical copies per text) this
      // replaces C(100,2) levenshtein calls per group with zero.
      // Null text never joins in the oracle (= on NULL) — excluded.
      val docs = Tables.documents(spark, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), substring(col("text"), 1, BlockLen).as("blk"),
          substring(col("text"), 1, HeadLen).as("head"),
          graft.Hashing.h60(substring(col("text"), 1, HeadLen)).as("hh"))
      val groups = docs.groupBy("hh").agg(min(col("doc_id")).as("rep"))
      val members = docs.select(col("hh"), col("doc_id")).join(groups, "hh")
      val reps = docs.join(groups.select(col("rep").as("doc_id")), "doc_id")
      val repPairs = reps.as("a").join(reps.as("b"),
          col("a.blk") === col("b.blk") && col("a.hh") < col("b.hh"))
        .withColumn("dist", expr(s"levenshtein(a.head, b.head, $MaxDist)"))
        .filter(col("dist") >= 0 && col("dist") <= MaxDist)
        .select(col("a.hh").as("ha"), col("b.hh").as("hb"), col("dist"))
      val cross = repPairs
        .join(members.select(col("hh").as("ha"), col("doc_id").as("a")), "ha")
        .join(members.select(col("hh").as("hb"), col("doc_id").as("b")), "hb")
        .select(least(col("a"), col("b")).as("doc_a"),
          greatest(col("a"), col("b")).as("doc_b"), col("dist"))
      val within = members.select(col("hh"), col("doc_id").as("doc_a"))
        .join(members.select(col("hh"), col("doc_id").as("doc_b")), "hh")
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), lit(0).as("dist"))
      within.unionByName(cross).orderBy("doc_a", "doc_b")
    },

    // ---- q_entropy: per-source Shannon entropy of the token unigram
    //      distribution, plus size/vocab. H = log2(N) − Σc·log2(c)/N over
    //      exact counts; the Σ term is integer fixed-point so no float
    //      ever ACCUMULATES. Residual cross-engine exposure: the per-term
    //      round(c·log2 c·1e6) trusts JVM and libm log2 to agree through
    //      the rounding boundary — same accepted risk class as the
    //      suite's ln-based tfidf/ndcg oracles (a half-ULP flip at an
    //      exact x.5 would move one BIGINT term); the log-free exact
    //      alternative (PMI's monotone-ratio trick) doesn't apply since
    //      entropy SUMS log terms rather than ranking by them. 100 TB:
    //      two hash aggregates (token counts, then per-source roll-up) —
    //      both map-side combinable; nothing is ever collected ----
    "q_entropy" -> QueryDef(
      s"""WITH ${TextOps.duckTokensCte},
        |c AS (
        |  SELECT source, tok, COUNT(*) AS c FROM tokens GROUP BY source, tok
        |), s AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS vocab,
        |    CAST(SUM(CAST(round(c * log2(c) * 1e6) AS BIGINT)) AS BIGINT)
        |      AS clogc6
        |  FROM c GROUP BY source
        |)
        |SELECT source, n, vocab,
        |  round(log2(CAST(n AS DOUBLE))
        |    - (CAST(clogc6 AS DOUBLE) / 1e6) / n, 6) AS h_bits
        |FROM s ORDER BY source""".stripMargin) { (spark, d) =>
      TextOps.tokens(spark, d)
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum("c").as("n"), count(lit(1)).as("vocab"),
          sum(expr("CAST(round(c * log2(c) * 1e6) AS BIGINT)")).as("clogc6"))
        .select(col("source"), col("n"), col("vocab"),
          round(log2(col("n").cast("double"))
            - (col("clogc6").cast("double") / lit(1e6)) / col("n"), 6)
            .as("h_bits"))
        .orderBy("source")
    })
}
