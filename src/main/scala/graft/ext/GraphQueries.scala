package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-analysis centrality over a derived graph — the PageRank-style
  * quality weighting a web-crawl pipeline runs over its host graph before
  * sampling a training mix (in-link mass ≈ trustworthiness prior).
  *
  * The graph here is the purchase bipartite graph (customer → supplier via
  * orders ⋈ lineitem, distinct pairs) because the corpus tables carry no
  * hyperlinks; the operator — iterative damped rank propagation with
  * dangling-mass redistribution — is the deliverable, and it is exactly
  * the shape a host graph needs.
  *
  * Determinism contract (why this replays bit-for-bit in DuckDB):
  * all rank arithmetic is fixed-point BIGINT on a 1e12 total-mass grid,
  * every division is integer division of NON-NEGATIVE operands (so Spark's
  * truncating `div`, DuckDB's floor `//`, and Scala's driver-side `/` all
  * agree), and the iteration is unrolled into identical CTE rounds:
  *   share(u→v)  = rank(u) div outdeg(u)          (per-edge, BEFORE damping)
  *   rank'(v)    = tele + (85·(Σ shares + dang div N)) div 100
  *   tele        = (15·1e12) div (100·N),  dang = Σ rank over dangling nodes
  *
  * 100 TB shape: per iteration ONE shuffle — the contribution aggregate
  * keyed on dst (edges stay partitioned by src; a cluster co-partitions
  * ranks with them, the standard Pregel layout). The dangling-node SET is
  * static and computed once; its per-iteration MASS is a 1-row aggregate
  * (the only driver-side value, not a data axis). Ranks are
  * `localCheckpoint`ed each round so the logical plan stays O(1) in
  * iterations — the same lineage rule as [[DedupCluster]]'s propagation.
  */
object GraphQueries {

  /** Total rank mass on the fixed-point grid (1e12 ⇒ ~12 significant
    * digits survive the per-iteration floor losses).
    */
  val SCALE: Long = 1000000000000L
  private val ITERS = 3
  private val DAMP_NUM = 85L // damping d = 0.85 as the ratio 85/100
  private val DAMP_DEN = 100L

  private def duckIter(t: Int): String =
    s"""sh$t AS (
       |  SELECT e.dst AS node, CAST(SUM(r.r // o.od) AS BIGINT) AS contrib
       |  FROM edges e JOIN r${t - 1} r ON r.node = e.src
       |  JOIN outdeg o ON o.src = e.src
       |  GROUP BY e.dst
       |), dg$t AS (
       |  SELECT CAST(COALESCE(SUM(r.r), 0) AS BIGINT) AS dg
       |  FROM r${t - 1} r LEFT JOIN outdeg o ON o.src = r.node
       |  WHERE o.src IS NULL
       |), r$t AS (
       |  SELECT n0.node,
       |    ($DAMP_DEN - $DAMP_NUM) * $SCALE // ($DAMP_DEN * nn.n)
       |      + ($DAMP_NUM * (COALESCE(s.contrib, 0) + dg$t.dg // nn.n))
       |        // $DAMP_DEN AS r
       |  FROM nodes n0 LEFT JOIN sh$t s ON s.node = n0.node
       |  CROSS JOIN nn CROSS JOIN dg$t
       |)""".stripMargin

  private val pagerankSql: String =
    s"""WITH edges AS (
       |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
       |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |), nodes AS (
       |  SELECT src AS node FROM edges UNION SELECT dst FROM edges
       |), outdeg AS (
       |  SELECT src, COUNT(*) AS od FROM edges GROUP BY src
       |), nn AS (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS (SELECT node, $SCALE // n AS r FROM nodes CROSS JOIN nn),
       |${(1 to ITERS).map(duckIter).mkString(",\n")}
       |SELECT node, r AS rank_fp FROM r$ITERS
       |ORDER BY rank_fp DESC, node""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q_pagerank" -> QueryDef(pagerankSql) { (spark, d) => pagerank(spark, d) })

  private def pagerank(spark: SparkSession, d: String): DataFrame = {
    val edges = Tables.orders(spark, d)
      .join(Tables.lineitem(spark, d),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("od"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the two bounded scalars of the whole computation: node count and,
    // per round, the 1-row dangling mass — never a per-node collect
    val n = nodes.count()
    val tele = (DAMP_DEN - DAMP_NUM) * SCALE / (DAMP_DEN * n)
    val danglers = nodes
      .join(outdeg, nodes("node") === outdeg("src"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // (src, dst, od), pinned to HashPartitioning(src) and persisted ONCE:
    // each iteration's rank join then shuffles only the (small) rank
    // table — the big edge relation never moves again, the same
    // "pay the shuffle once" layout a cluster gets from bucketing
    val srcRanked = edges.join(outdeg, "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var ranks = nodes.select(col("node"), lit(SCALE / n).as("r"))
      .localCheckpoint()
    for (_ <- 1 to ITERS) {
      val dang = ranks.join(danglers, "node", "left_semi")
        .agg(coalesce(sum(col("r")), lit(0L))).first().getLong(0)
      val contrib = srcRanked
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r div od").as("share"))
        .groupBy("node").agg(sum(col("share")).as("contrib"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(tele) + expr(
            s"($DAMP_NUM * (coalesce(contrib, CAST(0 AS BIGINT)) + ${dang / n})) div $DAMP_DEN"))
            .cast("long").as("r"))
        .localCheckpoint()
    }
    edges.unpersist(false)
    nodes.unpersist(false)
    danglers.unpersist(false)
    srcRanked.unpersist(false)
    ranks.select(col("node"), col("r").as("rank_fp"))
      .orderBy(col("rank_fp").desc, col("node"))
  }
}
