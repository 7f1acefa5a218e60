package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting for hot join keys: when one key holds a disproportionate
  * share of a fact table, a plain shuffle join lands that key's entire
  * volume on one task. Salting splits the hot side's rows across
  * `salts` sub-keys and EXPLODES the other side across all of them, so
  * the hot key's work spreads over `salts` tasks.
  *
  * AQE's skew-join handling (on by default, statistics-driven) covers
  * sort-merge joins at runtime; explicit salting remains the tool when
  * the skewed relation feeds an aggregation or the optimizer lacks
  * statistics (streaming state, custom sources). Deterministic salt
  * (hash of a unique column, not rand()) keeps plans replayable.
  */
object Salting {

  /** Inner-join `big ⋈ dim` on `key`, salting `big`'s keys `salts` ways.
    * `bigUnique` is any column making big's rows distinct (salt source).
    * Result equals `big.join(dim, key)` row-for-row.
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
      bigUnique: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(xxhash64(bigUnique), lit(salts)))
    val saltedDim = dim
      .withColumn("_salt0", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt0").cast("bigint")).drop("_salt0")
    saltedBig.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
