package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the link-analysis / corpus-selection operators at
  * sf0.001: PageRank mass conservation and determinism, DSIR's bounded
  * feature space, PMI ordering.
  */
class GraphQueriesSpec extends SparkSpec {

  test("pagerank conserves mass within floor loss and floors at teleport") {
    val rows = graft.SparkEntry.defs("q_pagerank").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val tele = 15L * GraphQueries.SCALE / (100L * n)
    val mass = rows.map(_.getAs[Long]("rank_fp")).sum
    // every arithmetic step floors, so total mass can only leak downward —
    // and by far less than 1% over 3 iterations
    assert(mass <= GraphQueries.SCALE)
    assert(mass > GraphQueries.SCALE / 100L * 99L)
    // rank = teleport + damped non-negative inflow: teleport is a floor
    rows.foreach(r => assert(r.getAs[Long]("rank_fp") >= tele))
    // the bipartite purchase graph pushes mass to suppliers (every edge
    // points cust -> supp); the top-ranked node must be a supplier
    assert(rows.maxBy(_.getAs[Long]("rank_fp")).getAs[String]("node").startsWith("s"))
  }

  test("pagerank is deterministic across runs") {
    def run() = graft.SparkEntry.defs("q_pagerank").build(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run() == run())
  }

  test("dsir scores only out-of-domain docs in a bounded feature space") {
    val out = graft.SparkEntry.defs("q_select_dsir").build(spark, sf())
    val rows = out.collect()
    assert(rows.nonEmpty)
    // the hashed feature space is the scale contract: max 8192 buckets
    // regardless of corpus size (what makes the weight table broadcastable)
    val targetIds = graft.Tables.documents(spark, sf())
      .filter(col("source") === "src0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(!targetIds.contains(r.getAs[Long]("doc_id")),
        "target-domain docs must not be scored")
      assert(r.getAs[Boolean]("selected") == (r.getAs[Long]("score") > 0L))
    }
    val nonTarget = graft.Tables.documents(spark, sf())
      .filter(col("source") =!= "src0")
      // docs with fewer than two tokens produce no bigram and drop out
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length.toLong == nonTarget)
  }

  test("collocations rank by exact integer PMI with support filter") {
    val rows = graft.SparkEntry.defs("q_collocations").build(spark, sf()).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val pmis = rows.map(_.getAs[Long]("pmi_fp"))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("c") >= 5L)
      assert(r.getAs[Long]("c") <= r.getAs[Long]("cx"))
      assert(r.getAs[Long]("c") <= r.getAs[Long]("cy"))
    }
  }

  test("triangles match a brute-force count of the capped projection") {
    val r = graft.SparkEntry.defs("q_triangles").build(spark, sf()).collect().head
    val (nNodes, nEdges, nTri) = (r.getLong(0), r.getLong(1), r.getLong(3))
    // rebuild the capped projection driver-side and count triangles
    // naively over the adjacency sets (graph is small at sf0.001)
    val md = java.security.MessageDigest.getInstance("MD5")
    val cs = graft.Tables.orders(spark, sf())
      .join(graft.Tables.lineitem(spark, sf()),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    val capped = cs.groupBy(_._1).values.flatMap { sups =>
      sups.sortBy { case (c, s) =>
        (graft.Hashing.h60Jvm(md, s"$c:$s"), s)
      }.take(GraphQueries.TriCap)
    }
    val edges = capped.groupBy(_._1).values.flatMap { sups =>
      val ss = sups.map(_._2).toSeq.sorted
      for (i <- ss.indices; j <- i + 1 until ss.size) yield (ss(i), ss(j))
    }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val adj = nodes.map(n => n ->
      edges.collect { case (a, b) if a == n => b
                      case (a, b) if b == n => a }).toMap
    var tri = 0L
    val sortedNodes = nodes.toSeq.sorted
    for (u <- sortedNodes; v <- adj(u) if v > u; w <- adj(v) if w > v)
      if (adj(u).contains(w)) tri += 1
    assert(nNodes == nodes.size.toLong, s"nodes $nNodes vs ${nodes.size}")
    assert(nEdges == edges.size.toLong, s"edges $nEdges vs ${edges.size}")
    assert(nTri == tri, s"triangles $nTri vs brute-force $tri")
  }

  test("ppr mass lives only on seeds and their supplier neighborhood") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.defs("q_ppr").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    val edges = spark.read.parquet(sf() + "/orders.parquet")
      .join(spark.read.parquet(sf() + "/lineitem.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val seedSuppliers = edges.filter(_._1 % 10 == 0).map(_._2).toSet
    rows.foreach { r =>
      val node = r.getAs[String]("node")
      if (node.startsWith("c"))
        assert(node.drop(1).toLong % 10 == 0, s"non-seed customer $node > 0")
      else
        assert(seedSuppliers(node.drop(1).toLong), s"unreachable supplier $node")
    }
    // restart mass conserves within per-node floor losses
    val total = rows.map(_.getAs[Long]("ppr_fp")).sum
    assert(total <= GraphQueries.SCALE)
    assert(total > GraphQueries.SCALE * 9 / 10, s"mass leak: $total")
  }
}
