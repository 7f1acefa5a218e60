package graft

import org.apache.spark.sql.functions._

/** The neardup mutator is measurement infrastructure — if its edit
  * distances drift, every dedup scale table silently changes meaning.
  * Pin the contract: replica 0 is identity, in-capacity replicas differ
  * from base in ≤2 token positions (same length), out-of-capacity
  * replicas rewrite every 3rd token, and the whole thing is
  * deterministic.
  */
class ScaleGenSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf()).limit(50)

  test("replica 0 is the identity") {
    val out = docs.withColumn("m", ScaleGen.mutateText(0))
      .filter(!(col("m") <=> col("text"))).count()
    assert(out == 0)
  }

  test("mutations are deterministic") {
    val a = docs.withColumn("m", ScaleGen.mutateText(3)).select("doc_id", "m").collect()
    val b = docs.withColumn("m", ScaleGen.mutateText(3)).select("doc_id", "m").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("in-capacity replicas differ in at most 2 token positions, same length") {
    val diffs = docs.withColumn("m", ScaleGen.mutateText(1))
      .withColumn("cap", expr("100 DIV (pmod(xxhash64(doc_id), 100) + 1)"))
      .filter(lit(1) < col("cap")) // the near-dup branch
      .select(
        size(split(col("text"), " ", -1)).as("n0"),
        size(split(col("m"), " ", -1)).as("n1"),
        expr("""size(filter(zip_with(split(text, ' ', -1), split(m, ' ', -1),
                 (a, b) -> a <> b), x -> x))""").as("nd"))
      .collect()
    assert(diffs.nonEmpty)
    diffs.foreach { r =>
      assert(r.getAs[Int]("n0") == r.getAs[Int]("n1"), "length must be preserved")
      val nd = r.getAs[Int]("nd")
      assert(nd >= 1 && nd <= 2, s"expected 1-2 substitutions, got $nd")
    }
  }

  test("out-of-capacity replicas rewrite every 3rd token exactly") {
    val i = 99L // i >= cap for every u >= 1; docs with u = 0 stay near-dup
    val rows = docs.withColumn("m", ScaleGen.mutateText(i))
      .withColumn("cap", expr("100 DIV (pmod(xxhash64(doc_id), 100) + 1)"))
      .filter(lit(i) >= col("cap"))
      .select(expr(s"""size(filter(zip_with(split(text, ' ', -1), split(m, ' ', -1),
                 (a, b) -> a <> b), x -> x))""").as("nd"),
        expr(s"size(filter(sequence(0, size(split(text, ' ', -1)) - 1), j -> j % 3 = ${i % 3}))")
          .as("expected"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("nd") == r.getAs[Int]("expected"),
        "distinct replicas must rewrite exactly the j % 3 positions")
    }
  }
}
