package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's interaction log — the long-form DataFrame equivalent of the
  * reference's `dict[user_id → list[item_id]]` pickles per domain
  * (Dataset_CDAE.py:26-33, SURVEY.md §1.1).
  *
  * Derived from the star schema: user = `o_custkey`, item = `l_partkey`,
  * and the two cross-domain item spaces ('x'/'y', movie/book in the
  * reference) are the even/odd partkey halves — every user naturally
  * appears in both domains, replicating the paper's overlapping-user
  * assumption (Dataset_CDAE.py:11, main_my.py:81-95).
  *
  * 100 TB: one shuffled join on the fact key + a distinct (hash
  * aggregate). At cluster scale both fact tables would be bucketed by
  * orderkey making the join shuffle-free; the distinct partial-aggregates
  * map-side. Never densified to a U×I matrix (SURVEY.md §4.3:
  * `main_my.py:83,88` is the scale-fatal step we deliberately avoid).
  */
object Interactions {

  /** Long-form distinct (user_id, item_id, domain).
    *
    * The explicit repartition BEFORE the distinct is the relation's
    * pay-the-shuffle-once move (r10): (user_id, domain) co-locates every
    * (user_id, item_id, domain) group, so the dedup hash-aggregate runs
    * exchange-free on it — and (user_id, domain) is THE downstream key
    * (leave-two-out window, train re-rank, positives collect, user
    * aggregates all partition on it), so every such consumer — including
    * scans of the session-persisted cache, whose stored partitioning is
    * this one — plans zero further exchanges. The r9 shape distinct'd on
    * (u, i, d) first and re-exchanged for the (u, d) window: two
    * full-log exchanges where one suffices (measured at the 100× dir,
    * equal ambient load: ranked materialize 52.8 → 24.5s inside
    * q_lifecycle's cold build; cachedPipeline 95.5 → 59.8s).
    */
  def apply(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(
        col("o_custkey").as("user_id"),
        col("l_partkey").as("item_id"),
        when(col("l_partkey") % 2 === 0, "x").otherwise("y").as("domain"))
      .repartition(col("user_id"), col("domain"))
      .distinct()

  /** [[apply]] persisted for the session — the interaction log is the
    * pipeline's shared base relation (every E2/E3 operator reads it), so
    * the first query materializes it once and the rest scan memory. The
    * CacheManager keys the entry by canonicalized plan, so each sfDir
    * caches independently and every identical subtree in later queries is
    * substituted automatically. The storageLevel gate makes the call
    * idempotent: a plan already cached (e.g. by the Bench/Verify harness
    * up front) is returned as-is, so callers can never double-persist —
    * and, critically, must never unpersist what they didn't cache.
    */
  def cached(spark: SparkSession, sfDir: String): DataFrame = {
    val df = apply(spark, sfDir)
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist()
    else df
  }

  /** DuckDB CTE computing the identical relation (for oracle SQL reuse). */
  val duckCte: String =
    """interactions AS (
      |  SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id,
      |         CASE WHEN l_partkey % 2 = 0 THEN 'x' ELSE 'y' END AS domain
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |)""".stripMargin

  /** Distinct items of one domain with a dense 0-based index
    * (`dense_rank()-1` ordered by raw id) — the id-contiguity invariant the
    * reference merely *assumes* (main_my.py:81-92), produced here as an
    * explicit operator (SURVEY.md §1.3).
    *
    * Scale note: the window partitions per domain, so parallelism equals
    * the domain count — acceptable because item catalogs are bounded
    * (~10⁶ even at web scale). The UNBOUNDED axis (users) is ranked with
    * [[DenseRank.zipIndex]] instead (see q_id_densify).
    */
  def denseItems(spark: SparkSession, sfDir: String): DataFrame =
    denseItemsFrom(apply(spark, sfDir))

  /** [[denseItems]] over an explicit interactions relation. */
  def denseItemsFrom(inter: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    inter
      .select("domain", "item_id").distinct()
      .withColumn("dense_id",
        row_number().over(Window.partitionBy("domain").orderBy("item_id")) - 1)
  }

  val duckDenseItemsCte: String =
    """dense_items AS (
      |  SELECT domain, item_id,
      |         row_number() OVER (PARTITION BY domain ORDER BY item_id) - 1 AS dense_id
      |  FROM (SELECT DISTINCT domain, item_id FROM interactions)
      |)""".stripMargin
}
