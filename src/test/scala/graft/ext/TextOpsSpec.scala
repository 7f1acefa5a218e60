package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the text primitives: short/degenerate documents must
  * not break shingling or fingerprinting (the CASE guards).
  */
class TextOpsSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("word shingles: short docs produce empty sets, not errors") {
    import spark.implicits._
    val df = docsDF(Seq((1L, "a b c d e f"), (2L, "a b"), (3L, "solo")))
    df.createOrReplaceTempView("x")
    // reuse the builder expression via a local copy of the k=5 transform
    val sh = df.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(w) >= 5
          |THEN transform(sequence(1, size(w) - 4),
          |  i -> concat_ws(' ', element_at(w, CAST(i AS INT)),
          |       element_at(w, CAST(i + 1 AS INT)), element_at(w, CAST(i + 2 AS INT)),
          |       element_at(w, CAST(i + 3 AS INT)), element_at(w, CAST(i + 4 AS INT))))
          |ELSE array() END""".stripMargin)).as("sh"))
    val byDoc = sh.collect().groupBy(_.getLong(0))
    assert(byDoc(1L).length == 2) // 6 words -> 2 shingles
    assert(!byDoc.contains(2L) && !byDoc.contains(3L))
  }

  test("tokens carry 1-based positions and full coverage") {
    val t = TextOps.tokens(spark, sf()).filter(col("doc_id") === 0)
      .orderBy("i").collect()
    assert(t.head.getAs[Int]("i") == 1)
    assert(t.map(_.getAs[Int]("i")).toSeq == (1 to t.length))
  }

  test("charShingleHashes: guards texts shorter than k") {
    val df = docsDF(Seq((1L, "abcdefgh"), (2L, "short"), (3L, "abcdefghi")))
    df.createOrReplaceTempView("documents_tmp")
    val h = df.select(col("doc_id"), explode(expr(
      """CASE WHEN length(text) >= 8
        |THEN sequence(1, length(text) - 7) ELSE array() END""".stripMargin)).as("p"))
    val counts = h.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.get(1L).contains(1L))
    assert(!counts.contains(2L))
    assert(counts.get(3L).contains(2L))
  }
}
