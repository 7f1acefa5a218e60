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
    // aspect-preserving fit: longest edge -> RESIZE_TO
    val scale = RESIZE_TO.toDouble / math.max(w, h)
    val (rw, rh) = (math.max(1, math.round(w * scale).toInt),
      math.max(1, math.round(h * scale).toInt))
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

    // ---- batched stub decode: rows-only (mapPartitions is not SQL) ----
    // Array columns (hist, frame_samples) are projected to scalar
    // checksums here: the driver's pandas-based compare cannot sort/hash
    // ndarray cells (CORRECTNESS_r02 `err`). The raw arrays stay covered
    // by MultimodalSpec.
    "q_mm_features" -> QueryDef.noOracle { (spark, d) =>
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
