package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once parquet memoization — the engine's version of the
  * reference's split cache (S2, Dataset_CDAE.py:91-145: compute splits +
  * negatives once, pickle them, reload on every later run).
  *
  * Because every derived relation here is deterministic (seeded h60
  * order), recompute ≡ cache: `mode("ignore")` writes only if the path is
  * absent, so concurrent/repeated pipelines converge on identical bytes.
  *
  * 100 TB: this is the pattern for all expensive derived tables —
  * materialize once behind a content-addressed path, let every downstream
  * job scan parquet instead of recomputing the pipeline.
  */
object SplitCache {

  /** Materialize `df` at `path` unless already present AND complete;
    * return a scan of the materialized table (never the in-memory plan,
    * so downstream consumers get identical data regardless of who wrote
    * it).
    *
    * Cache validity = the `_SUCCESS` marker, not bare path existence: a
    * crashed partial write leaves a directory without the marker, and
    * treating that as authoritative would silently poison every later
    * run. Recovery never overwrites in place — the recompute lands in a
    * sibling temp directory and is RENAMED over the (absent or partial)
    * destination, so a COMMITTED directory is never deleted out from
    * under a concurrent reader: a racing writer whose rename loses finds
    * the destination complete and just discards its temp output.
    */
  def writeOnce(spark: SparkSession, df: => DataFrame, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def complete = fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    // completeness check BEFORE touching df: a cache hit must not even
    // build the recompute plan (mirrors the reference's `if exists: load`
    // gate, Dataset_CDAE.py:92-93)
    if (!complete) {
      val tmp = new org.apache.hadoop.fs.Path(
        p.getParent, s".${p.getName}.__tmp.${java.util.UUID.randomUUID}")
      df.write.mode("overwrite").parquet(tmp.toString)
      // Commit loop: only a PARTIAL destination (no marker) is ever
      // deleted, and the marker is re-checked IMMEDIATELY before each
      // destructive step — a racing writer that commits between checks
      // wins (its identical deterministic bytes stand) and our temp is
      // discarded. Rename only targets an ABSENT destination (HDFS
      // renames INTO an existing directory — nesting, not replacing),
      // and success is judged by the marker landing at the destination
      // root, not by rename's return value; a failed round cleans any
      // stray nested copy and retries.
      var attempts = 0
      while (!complete && attempts < 3) {
        attempts += 1
        if (!complete) {
          if (fs.exists(p) && !complete) fs.delete(p, true)
          if (!fs.exists(p)) fs.rename(tmp, p)
          if (!complete) {
            val stray = new org.apache.hadoop.fs.Path(p, tmp.getName)
            if (fs.exists(stray)) fs.delete(stray, true)
          }
        }
      }
      if (fs.exists(tmp)) fs.delete(tmp, true)
      // never hand a partial directory to the caller: surface commit
      // failure loudly instead of silently scanning half a cache
      require(complete, s"writeOnce: $path has no _SUCCESS marker after commit")
    }
    spark.read.parquet(path)
  }

  /** The reference's six cached relations in one call: splits, negatives
    * and train for a scale dir, memoized under `cacheDir`.
    *
    * The three relations are independent, so on a cache miss they
    * materialize CONCURRENTLY (three driver threads submitting jobs into
    * the same scheduler — the standard multi-job pattern; on a cluster
    * the FAIR scheduler interleaves their stages). They share one
    * persisted interactions scan instead of re-deriving the
    * orders⋈lineitem distinct three times. Measured at sf0.1: the e1
    * cache build dropped 18.1s → 4.8s warm (12.9s first-in-JVM), taking
    * q_lifecycle from 35s to 13.4s warm. On a warm cache the futures are
    * three `_SUCCESS` stats — no job, no persist.
    */
  def cachedPipeline(spark: SparkSession, sfDir: String, cacheDir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    def complete(path: String) = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    }
    val paths = Seq(s"$cacheDir/splits", s"$cacheDir/negatives", s"$cacheDir/train")
    val allCached = paths.forall(complete)
    // interactions feed all three recomputes — persist once, drop after
    val inter =
      if (allCached) null
      else Interactions(spark, sfDir).persist()
    val builders: Seq[() => DataFrame] = Seq(
      () => Splits.leaveTwoOutFrom(inter),
      () => Splits.negativeSampleScalableFrom(inter),
      () => Splits.trainSubsampleFrom(inter, Splits.TRAIN_PCT))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = paths.zip(builders).map { case (p, b) =>
        Future(writeOnce(spark, b(), p))
      }
      val Seq(splits, negatives, train) =
        fs.map(Await.result(_, Duration.Inf))
      (splits, negatives, train)
    } finally {
      pool.shutdown()
      if (inter != null) inter.unpersist(false)
    }
  }
}
