package graft.score

import graft.Hashing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The linear-algebra/scoring layer (SURVEY.md §1 "scoring layer", §2.10):
  * the reference's dual-autoencoder forward pass — embedding → linear →
  * ReLU → linear → sigmoid (model_my.py:52-64) — re-expressed as a
  * `mapPartitions` over a `Dataset` of users with driver-broadcast weight
  * matrices. This is the Spark shape for batch model scoring: weights are
  * small (k×k) and broadcast once per executor; users stream through
  * partitions; no U×I matrix ever materializes (SURVEY.md §4.3).
  *
  * Weights and user/item vectors here are *deterministic* rationals derived
  * from [[Hashing]]'s md5 hash (q/1000 with q ∈ [-1000,1000]) so the DuckDB
  * oracle can replay the identical forward pass as an explicit SQL
  * expression tree: double +,*,max are exactly rounded IEEE ops, so the
  * only non-portable step is exp(), absorbed by round(…, 6).
  *
  * A real deployment swaps [[userVec]]/weights for trained parquet-loaded
  * matrices (S3/S5 checkpoint source, main_my.py:304-320) — the execution
  * plan is unchanged.
  */
object Scorer {

  val K = 8        // embedding size (EMBED_SIZE analog)
  val NUM_ITEMS = 20 // scored item slice per user in the demo query

  /** JVM-side twin of [[Hashing.h60]] (same md5 → same value). */
  def h60Local(parts: String*): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(parts.mkString(":").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Deterministic rational in [-1, 1] with 3 decimal digits. */
  private def rat(parts: String*): Double = ((h60Local(parts: _*) % 2001L) - 1000L) / 1000.0

  /** k×k first-layer weights W, row-major. */
  def weightsW: Array[Array[Double]] =
    Array.tabulate(K, K)((i, j) => rat("w", i.toString, j.toString))

  /** Item embedding matrix E: NUM_ITEMS × k. */
  def itemVecs: Array[Array[Double]] =
    Array.tabulate(NUM_ITEMS, K)((j, i) => rat("iv", j.toString, i.toString))

  def userVec(userId: Long): Array[Double] =
    Array.tabulate(K)(j => rat(userId.toString, "uv", j.toString))

  /** Forward pass for one user: h = relu(W·u); score_j = σ(h·e_j).
    * Sums run in ascending index order — the oracle SQL is generated with
    * the same left-to-right association, so partial sums are bit-identical.
    */
  def forward(u: Array[Double], w: Array[Array[Double]],
      items: Array[Array[Double]]): Array[Double] = {
    val h = Array.tabulate(K) { i =>
      var s = 0.0
      var j = 0
      while (j < K) { s += w(i)(j) * u(j); j += 1 }
      math.max(0.0, s)
    }
    items.map { e =>
      var s = 0.0
      var i = 0
      while (i < K) { s += h(i) * e(i); i += 1 }
      1.0 / (1.0 + math.exp(-s))
    }
  }

  /** Distributed batch scoring: users → (user_id, item_j, score).
    * `mapPartitions` + broadcast weights is the fast path (SURVEY.md §2.10);
    * the rounding to 6 decimals matches the oracle's.
    */
  def scoreUsers(spark: SparkSession, users: DataFrame): DataFrame = {
    import spark.implicits._
    val bcW = spark.sparkContext.broadcast(weightsW)
    val bcE = spark.sparkContext.broadcast(itemVecs)
    users.select(col("user_id").cast("long")).as[Long]
      .mapPartitions { it =>
        val w = bcW.value; val e = bcE.value
        it.flatMap { uid =>
          val scores = forward(userVec(uid), w, e)
          scores.iterator.zipWithIndex.map { case (s, j) =>
            // HALF_UP to match round(score, 6) in both engines (σ > 0).
            (uid, j, math.floor(s * 1e6 + 0.5) / 1e6)
          }
        }
      }
      .toDF("user_id", "item_j", "score")
  }

  // ---- oracle SQL generation: the same forward pass as expression text ----

  /** Literal SQL for rat() of dynamic user column: ((h60 % 2001) - 1000)/1000.0 */
  private def duckUserVecExpr(j: Int): String =
    s"((${Hashing.duckH60("user_id", "'uv'", s"'$j'")} % 2001) - 1000)/1000.0"

  /** Render a double so both engines parse back the identical IEEE value. */
  private def dlit(d: Double): String =
    if (d == d.toLong.toDouble) s"${d.toLong}.0" else d.toString

  /** SQL computing score for item j of column `user_id`, mirroring
    * [[forward]]'s association order exactly.
    */
  def duckScoreExpr(j: Int): String = {
    val w = weightsW; val e = itemVecs
    val hExprs = (0 until K).map { i =>
      val sum = (0 until K).map(jj => s"(${dlit(w(i)(jj))} * u$jj)").mkString(" + ")
      s"greatest(0.0, $sum)"
    }
    val dot = (0 until K).map(i => s"(h$i * ${dlit(e(j)(i))})").mkString(" + ")
    val us = (0 until K).map(jj => s"${duckUserVecExpr(jj)} AS u$jj").mkString(", ")
    val hs = hExprs.zipWithIndex.map { case (x, i) => s"$x AS h$i" }.mkString(", ")
    s"""SELECT user_id, $j AS item_j,
       |  round(1.0/(1.0 + exp(-($dot))), 6) AS score
       |FROM (SELECT user_id, $hs FROM (SELECT user_id, $us FROM score_users))""".stripMargin
  }
}
