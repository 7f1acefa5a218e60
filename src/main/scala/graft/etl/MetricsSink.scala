package graft.etl

import org.apache.spark.sql.DataFrame

/** Append-mode metrics/log sink (S4, main_my.py:278-281: the reference
  * appends formatted per-epoch metric lines to `log/tmp.txt`).
  *
  * Spark-shaped equivalent: append small result DataFrames to a
  * partitioned log table — CSV for eyeballing, parquet for querying.
  * Appends are atomic per job, and at any scale the log stays a normal
  * table the engine itself can read back and aggregate (unlike the
  * reference's flat text file).
  */
object MetricsSink {

  /** Append `df` under `path` as CSV with a header (human-readable log). */
  def appendCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("append").option("header", "true").csv(path)

  /** Append `df` under `path` as parquet (queryable log). */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Read a parquet metrics log back. */
  def readParquet(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
