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
    // Byte budget for the Memo registry's LRU (suite-wide cached storage
    // stays under budget + one entry). Default: a third of the heap —
    // at the 100× probe's 48g that leaves execution memory untouched.
    val memoBudget = sys.env.get("SPARK_GRAFT_MEMO_BUDGET_MB")
      .map(_.toLong * 1024 * 1024)
      .getOrElse(Runtime.getRuntime.maxMemory / 3)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage
    var errors = List.empty[String]
    var refused = List.empty[String]
    var evictions = 0
    // dev-only exclusion for stress runs (the driver never sets it):
    // lets a skewed-data suite run the queries whose OUTPUT stays
    // well-posed under the skew, skipping ones that are output-quadratic
    // in a hot key BY SEMANTICS (see SCALING.md on q_stream_join @ zipf)
    val skip: Set[String] = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").toSet).getOrElse(Set.empty)
    val results = SparkEntry.orderedQueries.filterNot(q => skip(q._1)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: QueryRefusedException =>
          // a refusal is the query KEEPING its documented output-budget
          // contract on data where the contract is ill-posed (see
          // QueryRefusedException) — recorded, but distinct from errors
          System.err.println(s"[bench] $name REFUSED: ${e.getMessage}")
          refused ::= name
        case e: Throwable =>
          // a failed query must be LOUD — a swallowed error reads as a
          // suspiciously fast query in the timings
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          errors ::= name
      }
      val sec = (System.nanoTime() - t0) / 1e9
      evictions += Memo.enforceBudget(spark, memoBudget).size
      // co-tenant noise is the dominant variance source in driver runs
      // (r8: q_outliers 14.6s under load 18-27 vs 0.6s quiet) — record
      // the 1-min load at each query's completion so the artifact alone
      // explains its own outliers
      name -> (sec, osBean.getSystemLoadAverage)
    }
    // locale-pinned %.1f: the default-locale f"" interpolator emits
    // "18,3" under comma-decimal locales (de_DE), malformed JSON
    def f1(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val loads = results
      .map { case (k, (_, l)) => s"\"" + k + "\":" + f1(l) }
      .mkString("{", ",", "}")
    val errs = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val refusedJson = refused.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2._1).sum else 0.0
    // per-entry memoization telemetry: peak cached bytes + rebuild count
    // (builds > 1 = LRU thrash) — the zero-eviction claim is reproducible
    // from the artifact alone
    val memoEntries = Memo.telemetry(spark)
      .map { case (n, b, c) =>
        "\"" + n + "\":{\"peak_mb\":" + (b / 1024 / 1024) +
          ",\"builds\":" + c + "}"
      }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"refused":$refusedJson,"sf":"$sfDir","load_avg_start":${f1(loadStart)},"loads":$loads,"cpus":$cpus,"memo_budget_mb":${memoBudget / 1024 / 1024},"memo_evictions":$evictions,"memo_entries":$memoEntries}"""
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
