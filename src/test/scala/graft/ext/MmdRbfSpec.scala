package graft.ext

import graft.SparkSpec

/** Mathematical properties of the RBF MMD statistic, complementing the
  * fixed-point oracle gate on q_mmd_rbf (which hash-checks values but not
  * the statistic's semantics).
  */
class MmdRbfSpec extends SparkSpec {

  private def vecs(seed: Int, n: Int, shift: Double): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(8)(rnd.nextGaussian() + shift))
  }

  test("identical samples give (near) zero; separated samples give more") {
    val a = vecs(1, 40, 0.0)
    val b = vecs(2, 40, 0.0)   // same distribution, different draw
    val c = vecs(3, 40, 3.0)   // shifted distribution
    val self = MmdRbf.mmd2(a, a)
    val near = MmdRbf.mmd2(a, b)
    val far = MmdRbf.mmd2(a, c)
    assert(math.abs(self) < 1e-12)
    assert(near > 0 && near < far)
  }

  test("estimator is symmetric in its arguments") {
    val a = vecs(4, 30, 0.0)
    val b = vecs(5, 25, 1.0)
    assert(math.abs(MmdRbf.mmd2(a, b) - MmdRbf.mmd2(b, a)) < 1e-12)
  }

  test("query emits one row per unordered label pair incl. self") {
    import org.apache.spark.sql.functions.{col, size}
    val rows = graft.SparkEntry.defs("q_mmd_rbf").build(spark, sf()).collect()
    // labels present in the query's deterministic minibatch (every label
    // with at least one non-empty embedding contributes a batch)
    val labels = spark.read.parquet(sf() + "/embeddings.parquet")
      .filter(size(col("embedding")) > 0)
      .select("label").distinct().count().toInt
    assert(rows.length == labels * (labels + 1) / 2)
    rows.foreach { r =>
      val (a, b) = (r.getInt(0), r.getInt(1))
      val v = r.getDouble(2)
      assert(a <= b)
      if (a == b) assert(math.abs(v) < 1e-9) else assert(v >= 0)
    }
  }
}
