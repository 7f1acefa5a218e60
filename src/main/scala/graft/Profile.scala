package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiler: time named queries (all if none given) against a
  * scale dir, optionally dumping the formatted physical plan first.
  *
  *   sbt "runMain graft.Profile /root/testdata/sf0.1 explain q_candidates"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val explain = args.contains("explain")
    val names = args.drop(1).filterNot(_ == "explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val d = df
      if (explain) { println(s"==== $name plan"); d.explain("formatted") }
      val t0 = System.nanoTime()
      val n = d.count()
      println(f"==== $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    if (names.contains("probe")) {
      import org.apache.spark.sql.functions._
      import graft.etl.{Interactions, Splits}
      val inter = Interactions(spark, sfDir)
      val itemsByDomain = inter.groupBy("domain")
        .agg(sort_array(collect_set(col("item_id"))).as("items_arr"))
      val upos = inter
        .groupBy("user_id", "domain")
        .agg(collect_set(col("item_id")).as("pos"))
        .join(broadcast(itemsByDomain), "domain")
      time("userPositives", upos)
      val hL = "CAST(conv(substring(md5(concat_ws(':', CAST(user_id AS STRING), " +
        "CAST(r AS STRING), domain, 'neg')), 1, 15), 16, 10) AS BIGINT)"
      time("draws.md5only", upos.select(expr(
        s"aggregate(transform(sequence(1, 160), r -> $hL), 0L, (a, x) -> a + x) AS s")))
      time("draws.mod", upos.select(expr(
        s"size(array_distinct(transform(sequence(1, 160), r -> $hL % size(items_arr)))) AS s")))
      time("full.sizeonly", Splits.negativeSampleScalable(spark, sfDir)
        .groupBy("domain").agg(count(lit(1))))
      time("full.again", Splits.negativeSampleScalable(spark, sfDir)
        .groupBy("domain").agg(count(lit(1))))
    } else {
      val picked =
        if (names.isEmpty) SparkEntry.defs.keys.toSeq.sorted
        else names.toSeq
      picked.foreach { name =>
        time(name, SparkEntry.defs(name).build(spark, sfDir))
      }
    }
    spark.stop()
  }
}
