package graft.ext

import graft.{Hashing, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-data-pipeline operators (the
  * north-star extensions, BASELINE.json): tokenization, word k-gram
  * shingling, and character k-gram shingling over `documents.text`.
  *
  * Every primitive is a plain codegen'd expression chain (split /
  * transform / explode) with a DuckDB CTE computing the identical
  * relation, so all downstream dedup/similarity/text-analysis queries are
  * oracle-checkable end to end.
  *
  * 100 TB: tokenize/shingle are narrow (no shuffle) — they scale linearly
  * with input and pipeline into whatever aggregation follows. Explosion
  * factor is bounded (≤ one row per token/character), and the follow-up
  * group-bys all key on doc_id or the shingle itself, which is exactly how
  * a cluster would partition a document corpus.
  */
object TextOps {

  /** One row per token occurrence: (doc_id, lang, source, i, tok) with i
    * 1-based.
    */
  def tokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        posexplode(split(col("text"), " ")).as(Seq("i0", "tok")))
      .select(col("doc_id"), col("lang"), col("source"),
        (col("i0") + 1).as("i"), col("tok"))

  val duckTokensCte: String =
    """tokens AS (
      |  SELECT doc_id, lang, source,
      |         generate_subscripts(string_split(text, ' '), 1) AS i,
      |         unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |)""".stripMargin

  /** Distinct word k-gram shingles per doc: (doc_id, sh). */
  def wordShingles(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val parts = (0 until k).map(o => s"element_at(w, CAST(i + $o AS INT))")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(w) >= $k
           |THEN transform(sequence(1, size(w) - ${k - 1}),
           |              i -> concat_ws(' ', ${parts.mkString(", ")}))
           |ELSE array() END""".stripMargin)).as("sh"))
      .distinct()
  }

  def duckWordShinglesCte(k: Int): String = {
    val parts = (0 until k).map(o => s"w[i + $o]").mkString(" || ' ' || ")
    s"""shingles AS (
       |  SELECT DISTINCT doc_id, sh FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(generate_series(1, greatest(len(w) - ${k - 1}, 0)),
       |             i -> $parts)) AS sh
       |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
       |)""".stripMargin
  }

  /** One row per character k-gram occurrence: (doc_id, p, h) where p is
    * the 1-based start position and h = h60 of the k-gram — the rolling
    * hash stream a fingerprinting pass consumes.
    */
  def charShingleHashes(spark: SparkSession, sfDir: String, k: Int): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN length(text) >= $k
           |THEN sequence(1, length(text) - ${k - 1})
           |ELSE array() END""".stripMargin)).as("p"),
        col("text"))
      .select(col("doc_id"), col("p"),
        Hashing.h60(expr(s"substring(text, p, $k)")).as("h"))

  def duckCharShingleHashesCte(k: Int): String =
    s"""char_hashes AS (
       |  SELECT doc_id, p, ${Hashing.duckH60(s"substr(text, CAST(p AS BIGINT), $k)")} AS h
       |  FROM (
       |    SELECT doc_id, text,
       |      unnest(generate_series(1, greatest(length(text) - ${k - 1}, 0))) AS p
       |    FROM documents)
       |)""".stripMargin
}
