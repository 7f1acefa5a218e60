package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Sequence-packing invariants: the properties that make the greedy
  * stratified fill a valid packing, plus the plan shape that makes it
  * scale (one hash shuffle, streaming running-sum frame).
  */
class PackSpec extends SparkSpec {

  private lazy val assign =
    graft.SparkEntry.defs("q_pack_sequences").build(spark, sf()).cache()

  test("every doc is packed exactly once") {
    val docs = graft.Tables.documents(spark, sf()).count()
    assert(assign.count() == docs)
    assert(assign.select("doc_id").distinct().count() == docs)
  }

  test("bins are contiguous from 0 within each stratum") {
    val bad = assign.groupBy("len_bucket", "packer")
      .agg(min("bin_id").as("lo"), max("bin_id").as("hi"),
        countDistinct("bin_id").as("n"))
      .filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1)
      .count()
    assert(bad == 0, "bin ids must be dense 0..max per stratum")
  }

  test("bin overflow is bounded by the length-bucket width") {
    // a bin's exclusive cumsums all fall in [b*Budget, (b+1)*Budget), so
    // its token total is < Budget + (max doc tokens in bucket); bucket b
    // holds docs of < (b+1)*BucketWidth tokens
    val bad = assign
      .groupBy("len_bucket", "packer", "bin_id")
      .agg(sum("n_tokens").as("bin_tokens"))
      .filter(col("bin_tokens") >=
        lit(PackQueries.Budget) + (col("len_bucket") + 1) * PackQueries.BucketWidth)
      .count()
    assert(bad == 0, "bin total must stay under budget + bucket width")
  }

  test("only the LAST bin of a stratum may be under-filled") {
    val lastBin = assign.groupBy("len_bucket", "packer")
      .agg(max("bin_id").as("last_bin"))
    val bad = assign.groupBy("len_bucket", "packer", "bin_id")
      .agg(sum("n_tokens").as("bin_tokens"))
      .join(lastBin, Seq("len_bucket", "packer"))
      // a non-last bin was closed because its running sum crossed the
      // budget boundary, so its fill is ≥ Budget - (bucket max - 1)
      .filter(col("bin_id") =!= col("last_bin") &&
        col("bin_tokens") < lit(PackQueries.Budget) -
          (col("len_bucket") + 1) * PackQueries.BucketWidth)
      .count()
    assert(bad == 0, "interior bins must be filled to the budget boundary")
  }

  test("chunks tile every document: start 0, stride 24, remainder covered") {
    val chunks = graft.SparkEntry.defs("q_chunk_docs").build(spark, sf())
    val docs = graft.Tables.documents(spark, sf())
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(col("text"), " ", -1)).cast("long").as("n"))
    val bad = chunks.groupBy("doc_id")
      .agg(min("start_tok").as("first"),
        max(col("start_tok") + col("n_tok")).as("covered"),
        count(lit(1)).as("nk"),
        max("start_tok").as("last_start"))
      .join(docs, "doc_id")
      .filter(col("first") =!= 0 ||
        col("covered") =!= col("n") ||
        // starts are an arithmetic progression: last = (nk-1) * stride
        col("last_start") =!= (col("nk") - 1) * PackQueries.ChunkStride)
      .count()
    assert(bad == 0, "every doc must be tiled from 0 with stride 24 to its end")
    assert(chunks.filter(col("n_tok") <= 0).count() == 0)
  }

  test("chunk→pack composition: every chunk packed once, bins bounded by a chunk") {
    val packed = graft.SparkEntry.defs("q_pack_chunks").build(spark, sf()).cache()
    val chunks = graft.SparkEntry.defs("q_chunk_docs").build(spark, sf())
    // same chunk universe as q_chunk_docs, each packed exactly once
    assert(packed.count() == chunks.count())
    assert(packed.select("doc_id", "chunk_idx").distinct().count() == packed.count())
    // the composition's point: no input row exceeds a chunk, so bin
    // overflow is bounded by ChunkTok (vs a whole doc when packing raw)
    assert(packed.filter(col("n_tok") > PackQueries.ChunkTok).count() == 0)
    val overflowed = packed.groupBy("len_bucket", "packer", "bin_id")
      .agg(sum("n_tok").as("bin_tok"))
      .filter(col("bin_tok") >= PackQueries.Budget + PackQueries.ChunkTok)
      .count()
    assert(overflowed == 0, "bin total must stay under budget + one chunk")
    packed.unpersist()
  }

  test("packing plans one hash shuffle and a streaming running-sum frame") {
    spark.catalog.clearCache()
    for (q <- Seq("q_pack_sequences", "q_pack_chunks")) {
      val p = graft.SparkEntry.defs(q).build(spark, sf())
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      // exchanges: ONE hash partition on (len_bucket, packer) + the final
      // presentation sort's range exchange — nothing else (in particular
      // the chunk explode upstream of q_pack_chunks stays narrow)
      val ex = """\(\d+\) Exchange""".r.findAllIn(p).size
      assert(ex <= 2, s"$q: expected <=2 exchanges (stratum hash + output sort):\n$p")
      assert(p.contains("unboundedpreceding") && p.contains("currentrow"),
        s"$q: running-sum must be an UnboundedPreceding..CurrentRow streaming frame:\n$p")
    }
  }
}
