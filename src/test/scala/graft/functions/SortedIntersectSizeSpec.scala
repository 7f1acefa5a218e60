package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** sorted_intersect_size: agrees with the builtin
  * size(array_intersect(...)) on sorted set inputs (seeded generated
  * cases — plain scalacheck, the scalatest bridge is not vendored),
  * codegen path compiles, edge cases hold.
  */
class SortedIntersectSizeSpec extends SparkSpec {

  private val setGen: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted)

  test("matches size(array_intersect) on generated sorted sets") {
    import spark.implicits._
    SortedIntersectSize.ensureRegistered(spark)
    val cases = (1 to 40).flatMap { k =>
      for {
        a <- setGen(Gen.Parameters.default, Seed(k.toLong))
        b <- setGen(Gen.Parameters.default, Seed(k.toLong + 1000))
      } yield (a, b)
    }
    assert(cases.size >= 30)
    val rows = cases.toDF("a", "b")
      .select(expr("sorted_intersect_size(a, b)").as("native"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("empty and disjoint inputs; whole-stage codegen path compiles") {
    import spark.implicits._
    SortedIntersectSize.ensureRegistered(spark)
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false") // fail, don't mask
    try {
      val r = Seq((Seq(1L, 3L, 5L), Seq(2L, 3L, 4L, 5L)))
        .toDF("a", "b")
        .select(expr("sorted_intersect_size(a, b)").as("s1"),
          expr("sorted_intersect_size(a, CAST(array() AS ARRAY<BIGINT>))").as("s2"),
          expr("sorted_intersect_size(a, array(7L, 9L))").as("s3"))
        .collect().head
      assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.getLong(2) == 0L)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("a null array element raises instead of silently counting as 0") {
    // the SQL function is session-registered and callable on any
    // ARRAY<BIGINT>; a null slot reads as 0 through ArrayData.getLong, so
    // the contract is machine-enforced with a runtime error (compiled in
    // only for containsNull=true inputs — collect_list shapes keep the
    // branch-free loop)
    import spark.implicits._
    SortedIntersectSize.ensureRegistered(spark)
    val err = intercept[Exception] {
      Seq((Seq(1L, 3L), 0)).toDF("a", "x")
        .select(expr("sorted_intersect_size(array(1L, NULL), a)"))
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(err).exists(_.getMessage != null) &&
      causes(err).exists(c =>
        c.getMessage != null && c.getMessage.contains("null array element")))
  }
}
