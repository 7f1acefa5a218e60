package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-Flat approximate nearest neighbor — the coarse-quantizer scale
  * path (complementing the hyperplane-LSH variant): K deterministic seed
  * centroids → one Lloyd refinement → corpus assigned to Voronoi cells →
  * queries probe the `NPROBE` nearest cells → exact cosine re-rank of the
  * probed candidates.
  *
  * Everything is integer-exact so DuckDB replays it bit-for-bit:
  * distances are Σ(e−c)² over fixed-point longs (≤1e17, no overflow), and
  * refined centroids are rounded back INTO the fixed-point grid
  * (`round(Σe/n)` as BIGINT) — fractional centroids would force
  * double-sum distances whose association order is engine-internal.
  *
  * 100 TB shape: centroid tables are tiny broadcasts; assignment is one
  * narrow pass over the corpus (shuffle keyed by vec_id only for the
  * argmin aggregate); the candidate join is bucketed by cell — the
  * standard IVF inverted-list layout. Quality/cost dial = K × NPROBE.
  */
object IvfQueries {

  val K = 16
  val NPROBE = 2
  val TOP_K = 3
  private val querySlice = "vec_id % 20 = 0"

  val defs: Map[String, QueryDef] = Map(
    "q_sim_ivf" -> QueryDef(
      s"""WITH ${VectorOps.duckElemsCte},
         |${VectorOps.duckNormsCte},
         |seed_ids AS (
         |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS cent_id
         |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $K)
         |), cent0 AS (
         |  SELECT s.cent_id, e.i, e.e AS c
         |  FROM seed_ids s JOIN elems e ON e.vec_id = s.vec_id
         |), d0 AS (
         |  SELECT e.vec_id, c.cent_id,
         |         CAST(SUM((e.e - c.c) * (e.e - c.c)) AS BIGINT) AS d2
         |  FROM elems e JOIN cent0 c ON e.i = c.i
         |  GROUP BY e.vec_id, c.cent_id
         |), assign0 AS (
         |  SELECT vec_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rn
         |    FROM d0) WHERE rn = 1
         |), cent1 AS (
         |  SELECT a.cent_id, e.i,
         |    CAST(round(CAST(SUM(e.e) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
         |  FROM assign0 a JOIN elems e ON e.vec_id = a.vec_id
         |  GROUP BY a.cent_id, e.i
         |), d1 AS (
         |  SELECT e.vec_id, c.cent_id,
         |         CAST(SUM((e.e - c.c) * (e.e - c.c)) AS BIGINT) AS d2
         |  FROM elems e JOIN cent1 c ON e.i = c.i
         |  GROUP BY e.vec_id, c.cent_id
         |), assign1 AS (
         |  SELECT vec_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rn
         |    FROM d1) WHERE rn = 1
         |), probes AS (
         |  SELECT vec_id AS query_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rn
         |    FROM d1 WHERE $querySlice) WHERE rn <= $NPROBE
         |), pairs AS (
         |  SELECT DISTINCT p.query_id, a.vec_id
         |  FROM probes p JOIN assign1 a ON a.cent_id = p.cent_id
         |  WHERE a.vec_id <> p.query_id
         |), ${VectorOps.duckCosineCte}
         |SELECT query_id, vec_id, round(cos, 6) AS cos, rn FROM (
         |  SELECT query_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, vec_id) AS rn
         |  FROM cosines)
         |WHERE rn <= $TOP_K
         |ORDER BY query_id, rn""".stripMargin) { (spark, d) =>
      val el = VectorOps.elems(spark, d).select("vec_id", "i", "e")

      val seedIds = Tables.embeddings(spark, d).select("vec_id")
        .orderBy("vec_id").limit(K)
        .withColumn("cent_id", row_number().over(Window.orderBy("vec_id")))
      val cent0 = el.join(broadcast(seedIds), "vec_id")
        .select(col("cent_id"), col("i"), col("e").as("c"))

      def dists(cent: org.apache.spark.sql.DataFrame) = el
        .join(broadcast(cent), "i")
        .groupBy("vec_id", "cent_id")
        .agg(sum((col("e") - col("c")) * (col("e") - col("c"))).as("d2"))
      def argmin(d: org.apache.spark.sql.DataFrame) = d
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("d2"), col("cent_id"))))
        .filter(col("rn") === 1).select("vec_id", "cent_id")

      val assign0 = argmin(dists(cent0))
      val cent1 = assign0.join(el, "vec_id")
        .groupBy("cent_id", "i")
        .agg(round(sum(col("e")).cast("double") / count(lit(1)), 0)
          .cast("long").as("c"))
      val d1 = dists(cent1)
      val assign1 = argmin(d1)
      val probes = d1.filter(expr(querySlice))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("d2"), col("cent_id"))))
        .filter(col("rn") <= NPROBE)
        .select(col("vec_id").as("query_id"), col("cent_id"))
      val pairs = probes.join(assign1, "cent_id")
        .filter(col("vec_id") =!= col("query_id"))
        .select("query_id", "vec_id").distinct()

      VectorOps.cosineByBroadcast(spark, d, pairs)
        .withColumn("rn", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rn") <= TOP_K)
        .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("cos"), col("rn"))
        .orderBy("query_id", "rn")
    })
}
