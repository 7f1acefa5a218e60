package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** Append-log sink semantics (S4): appends accumulate, reads aggregate. */
class MetricsSinkSpec extends SparkSpec {

  test("parquet metrics log accumulates across appends") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mlog").toString + "/metrics"
    MetricsSink.appendParquet(Seq((1, "hr", 0.25)).toDF("epoch", "metric", "value"), dir)
    MetricsSink.appendParquet(Seq((2, "hr", 0.5)).toDF("epoch", "metric", "value"), dir)
    val log = MetricsSink.readParquet(spark, dir)
    assert(log.count() == 2)
    val best = log.orderBy(org.apache.spark.sql.functions.col("value").desc)
      .collect().head
    assert(best.getAs[Int]("epoch") == 2)
  }

  test("csv log writes a readable header") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mlogc").toString + "/metrics"
    MetricsSink.appendCsv(Seq((1, 0.125)).toDF("epoch", "hr"), dir)
    val first = spark.read.option("header", "true").csv(dir).collect().head
    assert(first.getString(0) == "1")
  }
}
