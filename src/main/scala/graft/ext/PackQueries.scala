package graft.ext

import graft.{Hashing, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing / length bucketing — the standard LLM-training-data
  * step the reference (an offline recommender ETL) has no analogue for,
  * added as a first-class pipeline operator: pack documents into
  * fixed-token-budget training rows so padding waste is bounded.
  *
  * Discipline (deterministic, closed-form, oracle-replayable):
  *  1. token counts per doc (whitespace tokens, same contract as
  *     q_text_tokens);
  *  2. LENGTH BUCKETS: stratify by `n_tokens DIV bucketWidth` so docs of
  *     similar length pack together — this bounds per-bin overflow by the
  *     bucket's max doc length and is what makes step 3 closed-form safe;
  *  3. PARALLEL PACKERS: salt each bucket into `packers` independent
  *     streams by `h60(doc_id) % packers` — packing is order-dependent, so
  *     a single global order would serialize; P streams per bucket give
  *     cluster-wide parallelism at the cost of ≤ P partially-filled tail
  *     bins per bucket (negligible against a 100 TB corpus);
  *  4. BIN ASSIGNMENT: within each (bucket, packer) stratum, order docs by
  *     (h60(doc_id), doc_id) and take the running token sum; a doc's bin is
  *     `floor(exclusive_cumsum / budget)`. The doc straddling a budget
  *     boundary stays in the earlier bin (bins overflow by < bucketWidth
  *     tokens, then truncate/pad downstream — the standard greedy-fill
  *     approximation).
  *
  * 100 TB shape: ONE hash shuffle on (len_bucket, packer); the in-stratum
  * sort is per-partition; the running-sum frame
  * (UnboundedPreceding→CurrentRow) is a streaming frame — WindowExec keeps
  * O(1) aggregation state per row, never buffering the frame. Stratum size
  * is |corpus| / (buckets × packers); `packers` is the parallelism dial (a
  * real deployment sizes it to cores, not 4). No driver-side state at all.
  */
object PackQueries {

  /** Token budget per packed training row (demo-sized for 10–99-token
    * docs; a real pipeline passes its context length, e.g. 8192).
    */
  val Budget = 512L

  /** Length-bucket width in tokens. Also the bin-overflow bound. */
  val BucketWidth = 32L

  /** Independent packing streams per length bucket. */
  val Packers = 4L

  /** Chunk size / stride (tokens) for q_chunk_docs — 8-token overlap. */
  val ChunkTok = 32L
  val ChunkStride = 24L

  /** Shared stratified-running-sum CTE body, DuckDB spelling. */
  private def duckPackedCte: String =
    s"""tok AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         ${Hashing.duckH60("doc_id")} AS ord
       |  FROM documents
       |), strat AS (
       |  SELECT doc_id, n_tokens, ord,
       |         n_tokens // $BucketWidth AS len_bucket,
       |         ord % $Packers AS packer
       |  FROM tok
       |), packed AS (
       |  SELECT doc_id, n_tokens, len_bucket, packer,
       |         CAST(SUM(n_tokens) OVER (
       |           PARTITION BY len_bucket, packer ORDER BY ord, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |           AS cum_tokens
       |  FROM strat
       |)""".stripMargin

  /** Spark twin of [[duckPackedCte]]: doc_id, n_tokens, len_bucket,
    * packer, cum_tokens.
    */
  private def packed(spark: org.apache.spark.sql.SparkSession, d: String) = {
    val ord = Hashing.h60(col("doc_id"))
    val w = Window.partitionBy("len_bucket", "packer")
      .orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("ord", ord)
      .withColumn("len_bucket", expr(s"n_tokens DIV $BucketWidth"))
      .withColumn("packer", col("ord") % Packers)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
  }

  val defs: Map[String, QueryDef] = Map(

    // ---- per-doc bin assignment: the packing plan itself. bin_id is
    //      per-(len_bucket, packer); (len_bucket, packer, bin_id) is the
    //      physical training row ----
    "q_pack_sequences" -> QueryDef(
      s"""WITH $duckPackedCte
         |SELECT doc_id, n_tokens, len_bucket, packer,
         |       CAST((cum_tokens - n_tokens) // $Budget AS BIGINT) AS bin_id,
         |       cum_tokens
         |FROM packed
         |ORDER BY doc_id""".stripMargin) { (spark, d) =>
      packed(spark, d)
        .withColumn("bin_id", expr(s"(cum_tokens - n_tokens) DIV $Budget"))
        .select("doc_id", "n_tokens", "len_bucket", "packer", "bin_id",
          "cum_tokens")
        .orderBy("doc_id")
    },

    // ---- fixed-size token chunking with overlap: the step BEFORE
    //      packing when documents exceed the context budget (and the
    //      retrieval-index standard). Chunk size 32 tokens, stride 24
    //      (8-token overlap); the last chunk takes the remainder. Chunk
    //      count and starts are closed-form integer math (identical in
    //      both engines); each chunk is identified by the h60 of its
    //      token span, so reconstruction is hash-gated without dumping
    //      text. Scale shape: scan → project → explode — zero shuffles,
    //      perfectly linear; output rows ≈ n_tokens/stride per doc. ----
    "q_chunk_docs" -> QueryDef(
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |  WHERE text IS NOT NULL
         |), k AS (
         |  SELECT doc_id, w, len(w) AS n,
         |         1 + greatest(CAST((len(w) - $ChunkTok + $ChunkStride - 1)
         |                           // $ChunkStride AS BIGINT), 0) AS nk
         |  FROM d
         |), c AS (
         |  SELECT doc_id, w, n,
         |         unnest(generate_series(0, (nk - 1) * $ChunkStride,
         |                                $ChunkStride)) AS s
         |  FROM k
         |)
         |SELECT doc_id, CAST(s // $ChunkStride AS BIGINT) AS chunk_idx,
         |       CAST(s AS BIGINT) AS start_tok,
         |       CAST(least($ChunkTok, n - s) AS BIGINT) AS n_tok,
         |       ${Hashing.duckH60(s"array_to_string(w[s + 1 : s + $ChunkTok], ' ')")}
         |         AS chunk_h
         |FROM c
         |ORDER BY doc_id, chunk_idx""".stripMargin) { (spark, d) =>
      Tables.documents(spark, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ", -1).as("w"))
        .withColumn("n", size(col("w")).cast("long"))
        .withColumn("nk", lit(1L) + greatest(
          expr(s"(n - $ChunkTok + $ChunkStride - 1) DIV $ChunkStride"), lit(0L)))
        .select(col("doc_id"), col("w"), col("n"),
          explode(expr(s"sequence(0L, (nk - 1) * $ChunkStride, $ChunkStride)"))
            .as("s"))
        .select(col("doc_id"),
          expr(s"s DIV $ChunkStride").as("chunk_idx"),
          col("s").as("start_tok"),
          least(lit(ChunkTok), col("n") - col("s")).as("n_tok"),
          Hashing.h60(expr(s"concat_ws(' ', slice(w, s + 1, $ChunkTok))"))
            .as("chunk_h"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ---- chunk → pack COMPOSITION: the full LLM-data shape. Docs over
    //      the context budget are tiled into ≤32-token chunks (the
    //      q_chunk_docs pass), and the CHUNKS are packed into 512-token
    //      training rows (the q_pack_sequences pass) — so no training row
    //      ever truncates more than a chunk tail, the property neither
    //      step has alone. Two deliberate deltas from the standalone
    //      steps: (1) the pack order key is h60(doc_id, chunk_idx) —
    //      content-INdependent — so duplicate chunks (near-dup docs share
    //      chunk hashes) scatter across bins instead of stacking into one
    //      training row; (2) the chunk pass drops the per-chunk text hash
    //      entirely — packing needs only (doc_id, chunk_idx, n_tok), so
    //      the compose is CHEAPER than q_chunk_docs itself (no md5 over
    //      token spans). Scale shape: narrow explode (zero shuffle) →
    //      ONE hash shuffle on (len_bucket, packer) → streaming-frame
    //      running sum. Chunking collapses the length spread to buckets
    //      {0, 1} (tails vs full chunks), so stratum parallelism is the
    //      Packers dial alone — a real deployment sizes Packers to
    //      cores × shuffle partitions, not 4. ----
    "q_pack_chunks" -> QueryDef(
      s"""WITH d AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
         |  WHERE text IS NOT NULL
         |), k AS (
         |  SELECT doc_id, n,
         |         1 + greatest(CAST((n - $ChunkTok + $ChunkStride - 1)
         |                           // $ChunkStride AS BIGINT), 0) AS nk
         |  FROM d
         |), c AS (
         |  SELECT doc_id, n,
         |         unnest(generate_series(0, (nk - 1) * $ChunkStride,
         |                                $ChunkStride)) AS s
         |  FROM k
         |), ch AS (
         |  SELECT doc_id, CAST(s // $ChunkStride AS BIGINT) AS chunk_idx,
         |         CAST(least($ChunkTok, n - s) AS BIGINT) AS n_tok
         |  FROM c
         |), strat AS (
         |  SELECT doc_id, chunk_idx, n_tok,
         |         ${Hashing.duckH60("doc_id", "chunk_idx")} AS ord,
         |         n_tok // $BucketWidth AS len_bucket
         |  FROM ch
         |), strat2 AS (
         |  SELECT *, ord % $Packers AS packer FROM strat
         |), packedc AS (
         |  SELECT doc_id, chunk_idx, n_tok, len_bucket, packer,
         |         CAST(SUM(n_tok) OVER (
         |           PARTITION BY len_bucket, packer
         |           ORDER BY ord, doc_id, chunk_idx
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |           AS cum_tok
         |  FROM strat2
         |)
         |SELECT doc_id, chunk_idx, n_tok, len_bucket, packer,
         |       CAST((cum_tok - n_tok) // $Budget AS BIGINT) AS bin_id,
         |       cum_tok
         |FROM packedc
         |ORDER BY doc_id, chunk_idx""".stripMargin) { (spark, d) =>
      val ord = Hashing.h60(col("doc_id"), col("chunk_idx"))
      val w = Window.partitionBy("len_bucket", "packer")
        .orderBy(col("ord"), col("doc_id"), col("chunk_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(spark, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("n"))
        .withColumn("nk", lit(1L) + greatest(
          expr(s"(n - $ChunkTok + $ChunkStride - 1) DIV $ChunkStride"), lit(0L)))
        .select(col("doc_id"),
          explode(expr(s"sequence(0L, (nk - 1) * $ChunkStride, $ChunkStride)"))
            .as("s"),
          col("n"))
        .select(col("doc_id"),
          expr(s"s DIV $ChunkStride").as("chunk_idx"),
          least(lit(ChunkTok), col("n") - col("s")).as("n_tok"))
        .withColumn("ord", ord)
        .withColumn("len_bucket", expr(s"n_tok DIV $BucketWidth"))
        .withColumn("packer", col("ord") % Packers)
        .withColumn("cum_tok", sum(col("n_tok")).over(w))
        .select(col("doc_id"), col("chunk_idx"), col("n_tok"),
          col("len_bucket"), col("packer"),
          expr(s"(cum_tok - n_tok) DIV $Budget").as("bin_id"), col("cum_tok"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ---- mixture rebalancing (data mixing): downsample every language
    //      slice to the smallest slice's size with a DETERMINISTIC
    //      Bernoulli keep — keep iff h60(doc_id) % 1e6 < floor(min_n *
    //      1e6 / n_lang), the integer threshold exact in both engines.
    //      Scale shape: the per-slice counts are ONE tiny hash agg whose
    //      3-row result broadcasts back as thresholds; the 100 TB corpus
    //      side is a NARROW filter — no shuffle, no window, no sort.
    //      (The exact-count alternative is q_sample_capped's
    //      WindowGroupLimit; this is the zero-shuffle statistical form a
    //      mixture-weights pass uses when ±√n slice error is fine.) ----
    "q_mix_sample" -> QueryDef(
      s"""WITH n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
         |m AS (SELECT MIN(n) AS mn FROM n),
         |thr AS (SELECT n.lang, CAST((m.mn * 1000000) // n.n AS BIGINT) AS t
         |        FROM n, m)
         |SELECT d.doc_id, d.lang
         |FROM documents d JOIN thr ON thr.lang = d.lang
         |WHERE ${Hashing.duckH60("d.doc_id")} % 1000000 < thr.t
         |ORDER BY d.doc_id""".stripMargin) { (spark, d) =>
      val docs = Tables.documents(spark, d)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val thr = counts
        .crossJoin(broadcast(counts.agg(min(col("n")).as("mn"))))
        .select(col("lang"), expr("(mn * 1000000) DIV n").as("t"))
      docs.join(broadcast(thr), "lang")
        .filter(Hashing.h60(col("doc_id")) % 1000000L < col("t"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // ---- bin-level fill report: doc count, token fill, and utilization
    //      per packed row — the number a pipeline owner actually watches
    //      (padding waste). Same single-shuffle lineage + one hash agg ----
    "q_pack_bins" -> QueryDef(
      s"""WITH $duckPackedCte
         |SELECT len_bucket, packer,
         |       CAST((cum_tokens - n_tokens) // $Budget AS BIGINT) AS bin_id,
         |       COUNT(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
         |       round(CAST(SUM(n_tokens) AS DOUBLE) / $Budget, 6) AS fill
         |FROM packed
         |GROUP BY 1, 2, 3
         |ORDER BY len_bucket, packer, bin_id""".stripMargin) { (spark, d) =>
      packed(spark, d)
        .withColumn("bin_id", expr(s"(cum_tokens - n_tokens) DIV $Budget"))
        .groupBy("len_bucket", "packer", "bin_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("bin_tokens"),
          round(sum(col("n_tokens")).cast("double") / Budget, 6).as("fill"))
        .orderBy("len_bucket", "packer", "bin_id")
    },

    // ---- TEMPERATURE-weighted mixture (α = 0.5): per-language keep
    //      probability p_l = sqrt(min_n / n_l) — the standard p_l ∝
    //      n_l^(α−1) multilingual rebalance, flattening the size
    //      distribution without q_mix_sample's hard floor-to-min.
    //      α = 0.5 keeps every float op exactly-rounded IEEE (sqrt,
    //      one divide, one multiply, floor) so the integer threshold is
    //      bit-identical cross-engine; the h60 keep rule is the same
    //      deterministic coin as every sampler here. 100 TB: thresholds
    //      are a per-language broadcast dimension; the corpus side is
    //      one narrow filtered scan, zero shuffles. ----
    "q_mix_temperature" -> QueryDef(
      s"""WITH n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
         |m AS (SELECT MIN(n) AS mn FROM n),
         |thr AS (SELECT n.lang,
         |          CAST(floor(1000000.0 * sqrt(CAST(m.mn AS DOUBLE))
         |               / sqrt(CAST(n.n AS DOUBLE))) AS BIGINT) AS t
         |        FROM n, m)
         |SELECT d.doc_id, d.lang
         |FROM documents d JOIN thr ON thr.lang = d.lang
         |WHERE ${Hashing.duckH60("d.doc_id", "'mixT'")} % 1000000 < thr.t
         |ORDER BY d.doc_id""".stripMargin) { (spark, d) =>
      val docs = Tables.documents(spark, d)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val thr = counts
        .crossJoin(broadcast(counts.agg(min(col("n")).as("mn"))))
        .select(col("lang"),
          floor(lit(1000000.0) * sqrt(col("mn").cast("double"))
            / sqrt(col("n").cast("double"))).as("t"))
      docs.join(broadcast(thr), "lang")
        .filter(Hashing.h60(col("doc_id"), lit("mixT")) % 1000000L < col("t"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // ---- data-recipe EPOCH assignment: given a target mixture (here:
    //      uniform across sources), each doc gets a repeat factor
    //      e_s = T / (|S| · n_s) epochs — whole part deterministic,
    //      fractional part a per-doc h60 Bernoulli — so over-target
    //      sources downsample (<1 epoch) and under-target sources
    //      repeat (the UPSAMPLING half no plain sampler expresses).
    //      All integer math on a 1e6 fixed-point grid: exact
    //      cross-engine, and the realized mixture is within one doc of
    //      target per source BY CONSTRUCTION. 100 TB: the epoch table
    //      is |S| rows broadcast back; the corpus side is one narrow
    //      pass computing its own repeat factor — zero shuffles before
    //      the per-source report agg. ----
    "q_mix_epochs" -> QueryDef(
      s"""WITH n AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t, COUNT(*) AS s FROM n),
         |ep AS (SELECT n.source, (tot.t * 1000000) // (tot.s * n.n) AS e6
         |       FROM n, tot),
         |rep AS (
         |  SELECT d.source,
         |    ep.e6 // 1000000
         |      + CASE WHEN ${Hashing.duckH60("d.doc_id", "'ep'")} % 1000000
         |                  < ep.e6 % 1000000 THEN 1 ELSE 0 END AS r
         |  FROM documents d JOIN ep ON ep.source = d.source
         |)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(r) AS BIGINT) AS total_repeats,
         |  round(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS realized_epochs
         |FROM rep GROUP BY source
         |ORDER BY source""".stripMargin) { (spark, d) =>
      val docs = Tables.documents(spark, d)
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      val ep = counts
        .crossJoin(broadcast(counts.agg(
          sum(col("n")).as("t"), count(lit(1)).as("s"))))
        .select(col("source"), expr("(t * 1000000) DIV (s * n)").as("e6"))
      docs.join(broadcast(ep), "source")
        .select(col("source"),
          expr("e6 DIV 1000000") // non-negative: truncating DIV = floor
            .plus(when(Hashing.h60(col("doc_id"), lit("ep")) % 1000000L
              < col("e6") % 1000000L, 1L).otherwise(0L)).as("r"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("r")).as("total_repeats"),
          round(sum(col("r")).cast("double") / count(lit(1)), 6)
            .as("realized_epochs"))
        .orderBy("source")
    })
}
