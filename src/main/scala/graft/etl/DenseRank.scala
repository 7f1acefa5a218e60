package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global dense indexing: assign 0-based consecutive ranks in
  * `orderCols` order WITHOUT a single-partition window.
  *
  * `row_number() OVER (ORDER BY …)` funnels every row through one task —
  * the classic scale cliff for global rankings (fine at 60k rows, dead at
  * 10⁹). This is the textbook alternative: range-repartition on the order
  * key (so partition i holds keys strictly below partition i+1), sort
  * within partitions, then `zipWithIndex` — which computes per-partition
  * counts in one lightweight job and adds prefix offsets, preserving the
  * global order at full parallelism.
  *
  * Rows must be unique on `orderCols` (ranks would otherwise be
  * tie-ambiguous) — callers rank DISTINCT id sets.
  */
object DenseRank {
  def zipIndex(df: DataFrame, orderCols: Seq[String], out: String): DataFrame = {
    val spark = df.sparkSession
    val cols = orderCols.map(df.col)
    val sorted = df.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema)
  }
}
