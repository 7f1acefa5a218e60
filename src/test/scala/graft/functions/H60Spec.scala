package graft.functions

import graft.{Hashing, SparkSpec}
import org.apache.spark.sql.functions._

/** The native H60Expr is bit-identical to the SQL chain it replaced
  * (`conv(substring(md5(s),1,15),16,10) CAST long`) — the chain whose
  * DuckDB parity every sampler oracle already proves, so transitively
  * the native hash keeps the cross-engine contract.
  */
class H60Spec extends SparkSpec {

  test("native h60 equals the md5/conv SQL chain on randomized inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { i =>
      val s = rnd.alphanumeric.take(rnd.nextInt(40)).mkString +
        (if (i % 7 == 0) ":unicode✓é" else "") + s":$i"
      s
    } :+ "" // empty string (concat_ws of all-null inputs)
    H60Expr.ensureRegistered(spark)
    val df = rows.toDF("s")
      .select(col("s"),
        call_function("graft_h60", col("s")).as("native"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("chain"))
    val bad = df.filter(col("native") =!= col("chain")).count()
    assert(bad == 0)
    // non-negative 60-bit range
    assert(df.filter(col("native") < 0 ||
      col("native") >= (1L << 60)).count() == 0)
  }

  test("Hashing.h60 column routes through the native expression and keeps null-skip semantics") {
    import spark.implicits._
    val df = Seq((Some(1L), Some("a")), (None, Some("b")), (Some(3L), None))
      .toDF("x", "y")
    // concat_ws skips nulls: (null, "b") hashes "b", (3, null) hashes "3"
    val got = df.select(Hashing.h60(col("x"), col("y")).as("h")).collect()
    val exp = df.select(
      conv(substring(md5(concat_ws(":", col("x").cast("string"),
        col("y").cast("string"))), 1, 15), 16, 10).cast("long").as("h"))
      .collect()
    assert(got.map(_.getLong(0)).toSeq == exp.map(_.getLong(0)).toSeq)
  }
}
