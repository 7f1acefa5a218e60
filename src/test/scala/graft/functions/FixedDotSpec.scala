package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** fixed_dot: codegen and interpreted paths agree with the HOF
  * formulation; registration works both imperatively and via
  * SparkSessionExtensions.
  */
class FixedDotSpec extends SparkSpec {

  test("fixed_dot equals the interpreted HOF dot product") {
    import spark.implicits._
    FixedDot.ensureRegistered(spark)
    val df = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (2L, Seq(-7L, 0L), Seq(2L, 9L)),
      (3L, Seq.empty[Long], Seq.empty[Long]))
      .toDF("id", "a", "b")
    val out = df.select(col("id"),
      expr("fixed_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, x) -> s + x)").as("hof"))
      .collect()
    out.foreach(r => assert(r.getLong(1) == r.getLong(2)))
    assert(out.find(_.getLong(0) == 1L).get.getLong(1) == 32L)
  }

  test("null elements contribute zero; mismatched lengths use the min") {
    import spark.implicits._
    FixedDot.ensureRegistered(spark)
    val out = Seq((Seq(Some(2L), None, Some(4L)), Seq(Some(10L), Some(10L))))
      .toDF("a", "b")
      .select(expr("fixed_dot(a, b)")).collect().head.getLong(0)
    assert(out == 20L) // 2*10 + (null skipped, len capped at 2)
  }

  test("SparkSessionExtensions registers fixed_dot at session build") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // newSession shares the extensions-injected registry
      val rows = s2.sql("SELECT fixed_dot(array(1L, 2L), array(3L, 4L)) AS d").collect()
      assert(rows.head.getLong(0) == 11L)
    } finally {
      // do not stop: shared SparkContext with the suite session
    }
  }
}
