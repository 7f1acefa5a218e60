package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // the test layout is one FILE per table, so scan parallelism comes
      // entirely from row-group split points; the 128 MB default made
      // every first stage of a 30× run 1-4 tasks on 32 cores
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session-wide memoization of the shared interaction-log subtree
    // (the reference memoizes its derived dicts the same way, S2).
    // CacheManager substitutes the persisted plan into every query that
    // contains an identical subtree — ~10 queries rebuild it otherwise.
    if (!sys.env.contains("SPARK_GRAFT_NOCACHE")) etl.Interactions(spark, sfDir).persist()
    var errors = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // a failed query must be LOUD — a swallowed error reads as a
          // suspiciously fast query in the timings
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          errors ::= name
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(json)
    // full, untruncated artifact: the driver's log tail drops entries
    // past its window (8 of 74 in r5), so round-over-round comparisons
    // need a file the builder commits (bench_r{N}.json)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
