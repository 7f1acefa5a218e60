package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extensions): image/audio/video
  * as opaque `binary` payloads with typed metadata, plus a batched
  * decode / feature-extract pass.
  *
  * The container has no media codecs, so the DECODE step is a
  * deterministic STUB (`fakeDecode` — byte histogram + header-derived
  * dimensions); everything around it — the binary column, the metadata
  * schema, the mapPartitions batch shape (fixed-size decode batches, the
  * way a GPU/codec worker consumes them), the partition-parallel
  * execution — is real and tested (MultimodalSpec).
  *
  * Payloads are synthesized from `documents.text` bytes so the pipeline
  * is reproducible against the driver tables; swap [[media]]'s payload
  * expression for a real binary column at integration time.
  *
  * 100 TB: payload rows are large, so the scan relies on parquet column
  * pruning (metadata-only queries never read payload bytes) and the
  * decode pass is embarrassingly parallel per partition; batch size
  * bounds decoder memory, and `spark.sql.files.maxPartitionBytes` bounds
  * per-task payload volume.
  */
object Multimodal {

  val BATCH = 64

  /** The typed media table: (doc_id, kind, meta struct, payload binary). */
  def media(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' " +
        "ELSE 'video' END").as("kind"),
      struct(col("source"), col("lang"), col("n_chars").as("raw_len")).as("meta"),
      encode(col("text"), "UTF-8").as("payload"))

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, hist: Array[Long],
      resized_w: Int, resized_h: Int, frame_samples: Array[Long])

  /** Target edge for the resize stub (aspect-preserving fit). */
  val RESIZE_TO = 64
  /** Frame-sample stride: one "frame" per 256-byte block. */
  val FRAME_BLOCK = 256
  val MAX_FRAMES = 8

  /** Deterministic stand-in for a real codec covering the full stub
    * surface — decode ("dimensions" from header bytes), feature-extract
    * (16-bin byte histogram), resize (aspect-preserving fit to
    * [[RESIZE_TO]]), frame-sample (checksum of every [[FRAME_BLOCK]]-byte
    * block, first [[MAX_FRAMES]]). A real integration replaces ONLY this
    * function; schema, batching and partitioning stay.
    */
  def fakeDecode(r: MediaRow): DecodedRow = {
    val b = r.payload
    val w = 64 + (if (b.length > 0) (b(0) & 0xff) % 192 else 0)
    val h = 64 + (if (b.length > 1) (b(1) & 0xff) % 192 else 0)
    val hist = new Array[Long](16)
    var i = 0
    while (i < b.length) { hist((b(i) & 0xff) % 16) += 1; i += 1 }
    // aspect-preserving fit: longest edge -> RESIZE_TO. Integer HALF_UP
    // rounding (floor((2·e·RESIZE_TO + m) / 2m) ≡ round(e·RESIZE_TO/m))
    // so the arithmetic replays exactly in integer SQL — double rounding
    // is engine-internal, integer division is not.
    val m = math.max(w, h)
    val (rw, rh) = (math.max(1, (2 * w * RESIZE_TO + m) / (2 * m)),
      math.max(1, (2 * h * RESIZE_TO + m) / (2 * m)))
    val nFrames = math.min(MAX_FRAMES, (b.length + FRAME_BLOCK - 1) / FRAME_BLOCK)
    val frames = Array.tabulate(nFrames) { f =>
      var s = 0L
      var j = f * FRAME_BLOCK
      val end = math.min(b.length, j + FRAME_BLOCK)
      while (j < end) { s += (b(j) & 0xff); j += 1 }
      s
    }
    DecodedRow(r.doc_id, r.kind, b.length, w, h, hist, rw, rh, frames)
  }

  /** Batched decode: partitions stream through [[fakeDecode]] in
    * fixed-size batches (the decoder-worker shape — a real codec amortizes
    * model/codec setup across the batch).
    */
  def decodeFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    media(spark, sfDir)
      // a null payload (null source text) is undecodable — drop it, like
      // the oracle's WHERE text IS NOT NULL
      .filter(col("payload").isNotNull)
      .select("doc_id", "kind", "payload").as[MediaRow]
      .repartition(spark.sparkContext.defaultParallelism) // decode in parallel
      .mapPartitions(_.grouped(BATCH).flatMap(batch => batch.map(fakeDecode)))
      .toDF()
  }

  val defs: Map[String, QueryDef] = Map(

    // ---- metadata + content hashing over the binary column ----
    "q_mm_meta" -> QueryDef(
      """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |            ELSE 'video' END AS kind,
        |  COUNT(*) AS n,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
        |  COUNT(DISTINCT md5(text)) AS n_distinct_content,
        |  MIN(md5(text)) AS min_md5
        |FROM documents
        |GROUP BY 1
        |ORDER BY kind""".stripMargin) { (spark, d) =>
      media(spark, d)
        .select(col("kind"), length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("h"))
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          max(col("n_bytes")).cast("long").as("max_bytes"),
          countDistinct(col("h")).as("n_distinct_content"),
          min(col("h")).as("min_md5"))
        .orderBy("kind")
    },

    // ---- batched stub decode, ORACLE-GATED ----
    // fakeDecode is deterministic byte math over the UTF-8 payload, so
    // DuckDB replays it from hex(encode(text)): byte i is the i-th hex
    // pair. The histogram checksum collapses algebraically —
    // Σ_k hist[k]·(k+1) = Σ_bytes (b%16 + 1) — and frames_sum is the sum
    // of bytes in the first MAX_FRAMES·FRAME_BLOCK positions. Array
    // columns (hist, frame_samples) are projected to these scalar
    // checksums: the driver's pandas-based compare cannot sort/hash
    // ndarray cells (CORRECTNESS_r02 `err`). Raw arrays stay covered by
    // ExtSpec's decode invariants.
    "q_mm_features" -> QueryDef(
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |         ELSE 'video' END AS kind,
         |    hex(encode(text)) AS hx,
         |    CAST(octet_length(encode(text)) AS INT) AS n_bytes
         |  FROM documents WHERE text IS NOT NULL
         |), dims AS (
         |  SELECT doc_id, kind, n_bytes,
         |    64 + CASE WHEN n_bytes > 0
         |      THEN CAST(('0x' || substr(hx, 1, 2)) AS INT) % 192 ELSE 0 END AS width,
         |    64 + CASE WHEN n_bytes > 1
         |      THEN CAST(('0x' || substr(hx, 3, 2)) AS INT) % 192 ELSE 0 END AS height
         |  FROM m
         |), bytes AS (
         |  SELECT doc_id, i, CAST(('0x' || substr(hx, 2 * CAST(i AS INT) - 1, 2)) AS INT) AS b
         |  FROM (SELECT doc_id, hx, unnest(generate_series(1, n_bytes)) AS i FROM m)
         |), agg AS (
         |  SELECT doc_id,
         |    CAST(SUM(b % 16 + 1) AS BIGINT) AS hist_checksum,
         |    CAST(SUM(CASE WHEN i <= ${MAX_FRAMES * FRAME_BLOCK} THEN b ELSE 0 END)
         |         AS BIGINT) AS frames_sum
         |  FROM bytes GROUP BY doc_id
         |)
         |SELECT d.doc_id, d.kind, d.n_bytes, d.width, d.height,
         |  COALESCE(a.hist_checksum, 0) AS hist_checksum,
         |  CAST(16 AS INT) AS hist_bins,
         |  CAST(greatest(1, (2 * width * $RESIZE_TO + greatest(width, height))
         |       // (2 * greatest(width, height))) AS INT) AS resized_w,
         |  CAST(greatest(1, (2 * height * $RESIZE_TO + greatest(width, height))
         |       // (2 * greatest(width, height))) AS INT) AS resized_h,
         |  CAST(least($MAX_FRAMES, (d.n_bytes + ${FRAME_BLOCK - 1}) // $FRAME_BLOCK) AS INT)
         |    AS n_frames,
         |  COALESCE(a.frames_sum, 0) AS frames_sum
         |FROM dims d LEFT JOIN agg a ON a.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (spark, d) =>
      decodeFeatures(spark, d)
        .select(col("doc_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"),
          // position-weighted checksum so any bin permutation changes it
          expr("aggregate(zip_with(hist, sequence(1, size(hist)), (h, i) -> h * i), " +
            "0L, (acc, x) -> acc + x)").as("hist_checksum"),
          size(col("hist")).as("hist_bins"),
          col("resized_w"), col("resized_h"),
          size(col("frame_samples")).as("n_frames"),
          expr("aggregate(frame_samples, 0L, (acc, x) -> acc + x)").as("frames_sum"))
        .orderBy("doc_id")
    })
}
