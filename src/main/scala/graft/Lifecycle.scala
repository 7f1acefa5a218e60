package graft

import graft.etl.{Interactions, MetricsSink, SplitCache, Splits}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's flagship lifecycle (SURVEY.md §3 E1, main_my.py) as
  * one composed engine run:
  *
  *   load interactions → memoized splits/negatives/train (S2) →
  *   candidate assembly → batch scoring → HR/NDCG/MRR\@K (E3) →
  *   append to the metrics log (S4) → keep-first best-epoch selection
  *   over the accumulated log (A7 / S3's checkpoint-selection logic).
  *
  * Gradient descent is out of scope (SURVEY.md §7 risk 5) — an "epoch"
  * here is a scoring round whose scores vary by the epoch salt exactly
  * the way retrained weights would; everything around the training step
  * is the reference's data path, run end to end.
  */
object Lifecycle {

  /** One epoch: score candidates (epoch-salted), compute ranking metrics,
    * append them to the log. Returns this epoch's metrics.
    */
  def runEpoch(spark: SparkSession, sfDir: String, workDir: String,
      epoch: Int): DataFrame = {
    val (splits, negatives, _) = SplitCache.cachedPipeline(spark, sfDir, s"$workDir/cache")
    // candidates come from the MEMOIZED negatives scan — epochs must not
    // re-run the sampler (that is the point of the S2 cache)
    val cands = negatives
      .select(col("user_id"), col("domain"), col("item_id"), lit(0).as("is_positive"))
      .unionAll(splits.select(col("user_id"), col("domain"),
        col("test_item").as("item_id"), lit(1).as("is_positive")))
    val scored = cands
      .select(col("user_id"), col("domain"), col("item_id"), col("is_positive"),
        (Hashing.h60(col("user_id"), col("item_id"), col("domain"),
          lit(s"epoch$epoch")) % 1000000L).as("score"))
    val metrics = graft.rank.Metrics.rankingMetrics(scored, Seq(5, 10))
      .withColumn("epoch", lit(epoch))
    MetricsSink.appendParquet(metrics, s"$workDir/metrics_log")
    metrics
  }

  /** Keep-first best epoch per (domain, k, metric) over the accumulated
    * log — the reference's checkpoint-selection rule (strict improvement,
    * main_my.py:302-320).
    */
  def bestEpochs(spark: SparkSession, workDir: String): DataFrame = {
    val log = MetricsSink.readParquet(spark, s"$workDir/metrics_log")
    val metrics = Seq("hr", "ndcg", "mrr")
    metrics.map { m =>
      log.select(col("domain"), col("k"), lit(m).as("metric"),
        col(m).as("value"), col("epoch"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("domain", "k")
            .orderBy(col("value").desc, col("epoch"))))
        .filter(col("rn") === 1).drop("rn")
    }.reduce(_ unionAll _)
      .orderBy("domain", "k", "metric")
  }

  /** Deterministic per-epoch scorer weights — the stand-in for the
    * retrained tensors an epoch would produce (training itself is out of
    * scope; what matters is that each epoch has DISTINCT weights whose
    * bytes survive the checkpoint round-trip).
    */
  def epochWeights(epoch: Int): Map[String, Array[Array[Double]]] = {
    import score.Scorer.rat
    Map(
      "W" -> Array.tabulate(score.Scorer.K, score.Scorer.K)(
        (i, j) => rat(s"epoch$epoch", "w", i.toString, j.toString)),
      "E" -> Array.tabulate(score.Scorer.NUM_ITEMS, score.Scorer.K)(
        (j, i) => rat(s"epoch$epoch", "iv", j.toString, i.toString)))
  }

  /** S3 persist step (main_my.py:304-320): one checkpoint per (domain,
    * metric) at K=10 — the reference's six best_{hr,ndcg,mrr}{1,2}.pkl
    * files — each holding the SELECTED epoch's weights as a parquet
    * state_dict. Returns (domain, metric) → (epoch, checkpoint path).
    */
  def checkpointBest(spark: SparkSession, workDir: String)
      : Map[(String, String), (Int, String)] = {
    bestEpochs(spark, workDir)
      .filter(col("k") === 10).collect()
      .map { r =>
        val (domain, metric, epoch) =
          (r.getAs[String]("domain"), r.getAs[String]("metric"),
            r.getAs[Int]("epoch"))
        val path = s"$workDir/ckpt/best_${metric}_$domain"
        score.Checkpoint.save(spark, path, epochWeights(epoch))
        (domain, metric) -> (epoch, path)
      }.toMap
  }

  /** S3 reload step (main_my.py:351-370): load one saved checkpoint and
    * score users with the RELOADED weights — the reference's
    * "load_state_dict then test_process" flow.
    */
  def scoreFromCheckpoint(spark: SparkSession, ckptPath: String,
      users: DataFrame): DataFrame = {
    val loaded = score.Checkpoint.load(spark, ckptPath)
    score.Scorer.scoreUsersWith(spark, users, loaded("W"), loaded("E"))
  }

  /** Dev main: run `epochs` scoring rounds and print the selection. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val epochs = args.lift(1).map(_.toInt).getOrElse(3)
    val workDir = java.nio.file.Files.createTempDirectory("lifecycle").toString
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to epochs).foreach(e => runEpoch(spark, sfDir, workDir, e))
    bestEpochs(spark, workDir).show(50, false)
    spark.stop()
  }
}
