package graft

import org.apache.spark.sql.SparkSession

/** Dev-only recall probe for the LSH-banded embedding-dedup path
  * (VERDICT r9 #6): on a neardup-mutated scale dir (ScaleGen plants
  * in-capacity replicas at E[cos]≈0.69 and sibling pairs straddling the
  * 0.4 threshold), measure the banded candidate generator's recall
  * against the exact all-pairs anchor — overall, by cosine band, and at
  * the CLUSTER level (transitive closure can recover pairs the banding
  * misses, which is the property q_dedup_embed_cluster actually relies
  * on). Results land in SCALING.md's recall table.
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.RecallProbe /tmp/sf1nd"
  */
object RecallProbe {

  /** Union-find over pair lists (driver-side: the probe dirs hold ≤20k
    * vectors / ≤1M pairs — bounded by the probe, not the corpus).
    */
  private final class UF {
    private val p = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (p.getOrElse(r, r) != r) r = p.getOrElse(r, r)
      var c = x
      while (p.getOrElse(c, c) != c) { val n = p.getOrElse(c, c); p(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Unit = { val ra = find(a); val rb = find(b); if (ra != rb) p(ra) = rb }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1nd")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // mass-only mode: candidate/verified counts + stage wall times, no
    // exact anchor — usable on dirs too large for the all-pairs loop
    // (e.g. the 100× axes), where MASS is the question and recall is
    // extrapolated from the anchored 10×/30× tables
    if (args.contains("--mass")) {
      args.drop(1).filterNot(_ == "--mass").foreach { mode =>
        val t = System.nanoTime()
        val cand = ext.SimilarityQueries.nearDupCandidates(spark, dir, mode)
        val nCand = cand.count()
        val tc = (System.nanoTime() - t) / 1e9
        val nVer = ext.SimilarityQueries.verifiedNearDup(spark, dir, cand)
          .count()
        println(f"[recall] MASS mode=$mode%-8s candidates=$nCand%12d (${tc}%.1fs) verified=$nVer%10d (${(System.nanoTime() - t) / 1e9}%.1fs total)")
      }
      spark.stop()
      return
    }

    val t0 = System.nanoTime()
    val exact =                               // broadcast all-pairs anchor
      ext.SimilarityQueries.embedNearDup(spark, dir, Long.MaxValue)
        .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)]
        .collect().map { case (a, b, c) => (a, b) -> c }.toMap
    val tExact = (System.nanoTime() - t0) / 1e9
    println(f"[recall] dir=$dir exact=${exact.size} (${tExact}%.1fs)")

    val bins = Seq(
      ("identical (cos>0.999999)", (c: Double) => c > 0.999999),
      ("near [0.9,0.999999]", (c: Double) => c >= 0.9 && c <= 0.999999),
      ("near [0.6,0.9)", (c: Double) => c >= 0.6 && c < 0.9),
      ("weak [0.4,0.6)", (c: Double) => c >= 0.4 && c < 0.6))

    // ablation over the past-ceiling candidate arms; "union" is the
    // path q_dedup_embed actually runs past the ceiling. "ivfp<n>"
    // forces the product-regime quantizer (the past-flat-cap form) at
    // probe count n — its recall price vs the flat arm sets
    // IvfQueries.PAIR_NPROBE_PRODUCT.
    // modes may be passed after the dir (ablation subsets re-run fast)
    val modes = if (args.length > 1) args.drop(1).toSeq
      else Seq("banded", "ivf", "union", "ivfp8", "ivfp16", "ivfp32")
    val byMode = modes.map { mode =>
      val t = System.nanoTime()
      val cand = ext.SimilarityQueries.nearDupCandidates(spark, dir, mode)
      val nCand = cand.count()
      val got = ext.SimilarityQueries.verifiedNearDup(spark, dir, cand)
        .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)]
        .collect().map { case (a, b, c) => (a, b) -> c }.toMap
      val sec = (System.nanoTime() - t) / 1e9
      val notInExact = got.keySet -- exact.keySet
      println(f"[recall] mode=$mode%-6s candidates=$nCand%9d pairs=${got.size}%7d (${sec}%.1fs) not-in-exact(should be 0): ${notInExact.size}")
      bins.foreach { case (name, in) =>
        val e = exact.count { case (_, c) => in(c) }
        val b = exact.count { case (k, c) => in(c) && got.contains(k) }
        println(f"[recall] $mode%-6s pair recall $name%-26s ${if (e == 0) 1.0 else b.toDouble / e}%.4f  ($b/$e)")
      }
      mode -> got
    }.toMap
    byMode.get("union").foreach { banded =>
      // cluster-level: does transitive closure through the banded pairs
      // put the same pairs in one cluster as closure through exact pairs?
      def sameClusterPairs(ps: Iterable[(Long, Long)]): UF = {
        val uf = new UF; ps.foreach { case (a, b) => uf.union(a, b) }; uf
      }
      val ufE = sameClusterPairs(exact.keys)
      val ufB = sameClusterPairs(banded.keys)
      val exactPairsList = exact.keys.toArray
      val recovered = exactPairsList.count { case (a, b) => ufB.find(a) == ufB.find(b) }
      println(f"[recall] cluster recall (exact pairs co-clustered under banded closure): ${recovered.toDouble / exactPairsList.length}%.4f ($recovered/${exactPairsList.length})")
      // sanity: banded closure never merges what exact closure separates
      val overMerged = banded.keys.count { case (a, b) => ufE.find(a) != ufE.find(b) }
      println(s"[recall] banded-only merges (should be 0): $overMerged")
    }
    spark.stop()
  }
}
