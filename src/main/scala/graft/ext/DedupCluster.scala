package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over duplicate-pair edges — the cluster-assembly
  * stage a dedup pipeline runs AFTER candidate verification, so it keeps
  * one canonical document per transitive duplicate set (pair lists alone
  * over-delete: a–b and b–c verified pairs must collapse to ONE keeper,
  * not two independent drops).
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with itself; each round every vertex takes the min of its own
  * label and its neighbors' labels; fixpoint = every vertex carries its
  * component's minimum id. Rounds needed = graph diameter, and duplicate
  * graphs are near-clique bundles (each cluster is one document and its
  * close variants, densely connected by the verify pass), so diameter is
  * tiny — 2–3 rounds in practice. For adversarial long-chain graphs the
  * published fix is alternating large-star/small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14) at O(log n) rounds; propagation is the cheaper constant for
  * the dedup shape and is what this operator ships.
  *
  * Scale shape (100 TB): per round, ONE shuffle join of edges(u,v) to
  * labels(v) plus ONE hash aggregate keyed by 8-byte vertex ids — both
  * partition cleanly across executors. State is O(V+E), never collected
  * to the driver; the only driver action per round is the convergence
  * count. Each round's labels are eagerly `localCheckpoint`ed: the new
  * round references the previous labels TWICE (neighbor join + change
  * count), so without lineage truncation the logical plan doubles every
  * round and planning itself OOMs long before the data does. A
  * localCheckpoint replaces the plan with the materialized partitions
  * (plan size O(1) in rounds); superseded checkpoint blocks are
  * reference-GC'd by Spark's ContextCleaner. On a real cluster swap
  * `localCheckpoint` for reliable `checkpoint` if executor loss during
  * the (short) propagation must be survivable.
  */
object DedupCluster {

  /** Hard cap on propagation rounds: a duplicate graph needing more than
    * this many rounds (diameter > 48) is not a dedup workload — fail
    * loudly rather than silently return unconverged labels.
    */
  private val MAX_ROUNDS = 48

  /** `pairs(doc_a, doc_b)` undirected edges → `(id, label)` with
    * `label` = min doc_id of the connected component. Only vertices that
    * appear in at least one pair are emitted (unpaired docs are trivially
    * their own singleton cluster and carry no dedup decision).
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val fwd = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
    val edges = fwd.unionAll(fwd.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint() // eager: truncates lineage at the start
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < MAX_ROUNDS) {
      val nbrMin = edges
        .join(labels.select(col("id").as("v"), col("label")), "v")
        .groupBy(col("u")).agg(min(col("label")).as("nbr_min"))
      val next = labels
        .join(nbrMin.select(col("u").as("id"), col("nbr_min")), Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint() // eager: materializes AND truncates lineage
      changed = next
        .join(labels.select(col("id"), col("label").as("old")), "id")
        .filter(col("label") =!= col("old"))
        .count()
      labels = next
      rounds += 1
    }
    edges.unpersist()
    require(changed == 0,
      s"connectedComponents did not converge in $MAX_ROUNDS rounds")
    labels
  }
}
