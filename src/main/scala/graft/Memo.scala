package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Session-scoped memoization registry for shared query subtrees, with an
  * explicit release API and a byte-bounded LRU eviction policy.
  *
  * Round-8 state of the art was seven ad-hoc `TrieMap[String, DataFrame]`
  * caches (splits, candidates, ngram index, shingle sets, cluster
  * membership, co-occurrence pairs, dup edges) that persisted DataFrames
  * for the life of the session with NO release path — the full-suite 100×
  * run accumulated all of them and needed a 90 GiB driver heap. This
  * registry replaces them:
  *
  *  - every entry is keyed on `(sessionId(spark), sfDir, name)` — a
  *    weak-keyed UUID, collision-free across GC'd sessions in a
  *    long-lived JVM, unlike the `System.identityHashCode(spark)` keys
  *    it replaces;
  *  - `cached` snapshots `sparkContext.getPersistentRDDs` around the build
  *    and records the RDD ids the build pinned, so release frees BOTH
  *    CacheManager-persisted DataFrames (`df.unpersist`) and
  *    `localCheckpoint`ed relations (whose blocks `Dataset.unpersist`
  *    cannot reach — they are plain cached RDDs under a `LogicalRDD`);
  *  - `release(spark, sfDir)` drops a scale-dir's (or the whole session's)
  *    entries — the hook a long-lived service calls between pipeline runs;
  *  - `enforceBudget(spark, bytes)` evicts least-recently-USED entries
  *    until cached storage (memory + disk) fits the budget — the harness
  *    (Bench/Verify) calls it after every query, so suite-wide storage is
  *    bounded by the budget plus the footprint of the single largest
  *    entry, independent of suite length. Evicting an entry only costs a
  *    rebuild on next use — correctness is untouched because consumers
  *    always re-fetch through `cached`, never hold released references.
  *
  * Builds run under the registry lock: delta-based RDD attribution is only
  * sound when builds don't interleave (a concurrent build's persist would
  * land in the wrong entry's delta and a later eviction could unpersist a
  * live localCheckpoint — a correctness bug, not just a perf one). Queries
  * execute sequentially in every harness, so the lock is uncontended.
  * NESTED builds (an inner `cached` completing inside an outer build — the
  * lock is re-entrant) are sound: the inner registers first, and the outer
  * delta subtracts ids already owned by registered entries, so each RDD
  * has exactly one owning entry.
  */
object Memo {

  /** Collision-free session identity: `identityHashCode` (the r8 keys)
    * can repeat once a session is GC'd in a long-lived JVM; a weak-keyed
    * UUID never does, and holds no strong reference to the session.
    */
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String])
  private def sessionId(spark: SparkSession): String =
    sessionIds.computeIfAbsent(spark,
      _ => java.util.UUID.randomUUID.toString)

  private final case class Key(session: String, sfDir: String, name: String)
  private final class Entry(val df: DataFrame, val rddIds: Set[Int],
      var lastUse: Long)
  private final class ObjEntry(val value: AnyRef, val bytes: Long,
      var lastUse: Long)
  private final class Stats(var builds: Int = 0, var peakBytes: Long = 0L)

  private val reg = mutable.LinkedHashMap.empty[Key, Entry]
  // driver-side object entries (compiled codebooks, broadcast-source
  // collects): no RDD footprint, so they carry an explicit byte estimate
  // and share the release / LRU-budget / telemetry discipline (r13,
  // VERDICT r12 #4 — the pair codebook TrieMaps lived outside accounting)
  private val objReg = mutable.LinkedHashMap.empty[Key, ObjEntry]
  // survives eviction: per-entry build counts + peak observed storage, so
  // a bench artifact can distinguish "LRU thrash" (builds >> 1) from
  // "fits with headroom" without access to the box
  private val stats = mutable.LinkedHashMap.empty[Key, Stats]
  private var tick = 0L

  /** Memoize a persisted/checkpointed DataFrame per (session, sfDir,
    * name). The build runs at most once per key; its persist/checkpoint
    * footprint is tracked for release.
    */
  def cached(spark: SparkSession, sfDir: String, name: String)(
      build: => DataFrame): DataFrame = synchronized {
    tick += 1
    val key = Key(sessionId(spark), sfDir, name)
    reg.get(key) match {
      case Some(e) => e.lastUse = tick; e.df
      case None =>
        val before = spark.sparkContext.getPersistentRDDs.keySet
        // the build+materialize is stage-timed as "memo/<name>" so every
        // one-time build's cost is attributed in the bench artifact's
        // stages object (VERDICT r11 #8) — a capstone tail that is all
        // memo-build is a one-time cost, not a per-query plan problem
        val df = StageTiming.timed(s"memo/$name") {
          val b = build
          // materialize NOW: a lazy persist() registers no RDD until the
          // first action, so a build-time delta attributes nothing and
          // the entry's storage is invisible to eviction accounting and
          // telemetry (every r10 bench entry reported peak_mb 0). The
          // first consumer paid this exact materialization anyway —
          // cached() is only ever called by one — so the cost moves, it
          // doesn't grow.
          b.count()
          b
        }
        // exclude ids already owned by OTHER entries: a nested cached()
        // (an inner build registering a twin relation mid-build, e.g. the
        // factored near-dup build's edge twin) completes and registers
        // before this delta is taken, so without the subtraction the
        // inner's RDDs land in BOTH entries — evicting the outer would
        // then raw-unpersist the still-registered inner's blocks and
        // double-count its bytes in per-entry accounting.
        val owned = reg.valuesIterator.flatMap(_.rddIds).toSet
        val pinned = spark.sparkContext.getPersistentRDDs.keySet
          .diff(before).toSet.diff(owned)
        reg(key) = new Entry(df, pinned, tick)
        val st = stats.getOrElseUpdate(key, new Stats)
        st.builds += 1
        // sample immediately as well as at enforceBudget: an entry
        // released before the next budget pass otherwise reports peak 0.
        // writeBucketed-backed entries legitimately stay 0 — their bytes
        // live in an on-disk table, not block storage.
        val info = spark.sparkContext.getRDDStorageInfo
          .map(i => i.id -> (i.memSize + i.diskSize)).toMap
        val b = pinned.iterator.map(info.getOrElse(_, 0L)).sum
        if (b > st.peakBytes) st.peakBytes = b
        df
    }
  }

  /** Memoize a DRIVER-SIDE object per (session, sfDir, name) — the
    * non-DataFrame sibling of [[cached]] for compiled artifacts whose
    * bytes live on the driver heap, not in block storage (e.g. the IVF
    * pair codebooks: flat primitive centroid tables collected from a
    * distributed Lloyd train). `bytes` is the caller's size estimate
    * (codebooks: k·dim·8 exactly); it counts toward [[enforceBudget]]'s
    * total and the entry is LRU-evictable like any other — eviction just
    * drops the reference (next consumer rebuilds), and
    * [[release]]/[[releaseOne]] drop it deterministically.
    */
  def cachedObj[T <: AnyRef](spark: SparkSession, sfDir: String,
      name: String, bytes: T => Long)(build: => T): T = synchronized {
    tick += 1
    val key = Key(sessionId(spark), sfDir, name)
    objReg.get(key) match {
      case Some(e) => e.lastUse = tick; e.value.asInstanceOf[T]
      case None =>
        val v = StageTiming.timed(s"memo/$name")(build)
        val b = bytes(v)
        objReg(key) = new ObjEntry(v, b, tick)
        val st = stats.getOrElseUpdate(key, new Stats)
        st.builds += 1
        if (b > st.peakBytes) st.peakBytes = b
        v
    }
  }

  /** The entry for (session, sfDir, name) if a build already registered
    * one — no build is triggered. Lets a consumer pick up an OPTIONAL
    * side relation that another entry's build registers only on some
    * branches (e.g. the factored near-dup build's connectivity-reduced
    * edge twin) and fall back when the branch wasn't taken.
    */
  def peek(spark: SparkSession, sfDir: String, name: String)
      : Option[DataFrame] = synchronized {
    tick += 1
    reg.get(Key(sessionId(spark), sfDir, name)).map { e =>
      e.lastUse = tick; e.df
    }
  }

  /** Drop and unpersist every entry of this session (one sfDir, or all
    * when sfDir is null). Safe to call at any point between queries; the
    * next consumer rebuilds.
    */
  def release(spark: SparkSession, sfDir: String = null): Unit =
    synchronized {
      def mine(k: Key) = k.session == sessionId(spark) &&
        (sfDir == null || k.sfDir == sfDir)
      reg.keys.filter(mine).toList.foreach(releaseEntry(spark, _))
      objReg.keys.filter(mine).toList.foreach(objReg.remove)
    }

  /** Drop and unpersist ONE named entry (no-op if absent). */
  def releaseOne(spark: SparkSession, sfDir: String, name: String): Unit =
    synchronized {
      val key = Key(sessionId(spark), sfDir, name)
      releaseEntry(spark, key)
      objReg.remove(key)
    }

  /** Evict least-recently-used entries of this session until cached
    * storage (all RDD memory + disk bytes) fits `budgetBytes`. Returns
    * the evicted entries as `sfDir:name`, in eviction (LRU) order.
    * Storage NOT owned by the registry (e.g. the harness-persisted
    * interaction log) counts toward the budget but is never evicted —
    * the loop stops when no owned entries remain.
    */
  def enforceBudget(spark: SparkSession, budgetBytes: Long): Seq[String] =
    synchronized {
      def objBytes: Long = objReg.iterator
        .filter(_._1.session == sessionId(spark)).map(_._2.bytes).sum
      def cachedBytes: Long =
        spark.sparkContext.getRDDStorageInfo
          .map(i => i.memSize + i.diskSize).sum + objBytes
      val evicted = mutable.ListBuffer.empty[String]
      var mine = reg.filter(_._1.session == sessionId(spark))
      // sample per-entry storage against the live snapshot → peak bytes
      locally {
        val info = spark.sparkContext.getRDDStorageInfo
          .map(i => i.id -> (i.memSize + i.diskSize)).toMap
        mine.foreach { case (k, e) =>
          val b = e.rddIds.iterator.map(info.getOrElse(_, 0L)).sum
          val s = stats.getOrElseUpdate(k, new Stats)
          if (b > s.peakBytes) s.peakBytes = b
        }
      }
      var mineObj = objReg.filter(_._1.session == sessionId(spark))
      // Object entries (compiled codebooks — full-corpus Lloyd trains)
      // are evictable ONLY while their own bytes exceed the budget
      // (ADVICE r13): storage the registry does not own (e.g. the
      // harness-persisted interactions relation) counts toward the
      // budget but cannot be evicted, and before this guard it alone
      // could force every object entry out on every pass — a retrain
      // per consumer, the exact thrash the old TrieMaps avoided. Once
      // objBytes fits the budget the loop falls back to DataFrame
      // entries only, and stops when none remain.
      def objOverBudget = mineObj.nonEmpty &&
        mineObj.valuesIterator.map(_.bytes).sum > budgetBytes
      while (cachedBytes > budgetBytes && (mine.nonEmpty || objOverBudget)) {
        // LRU across BOTH registries: DataFrame entries and driver-side
        // object entries share one recency axis (tick)
        val dfLru = mine.minByOption(_._2.lastUse)
        val objLru = if (objOverBudget) mineObj.minByOption(_._2.lastUse)
          else None
        if (objLru.exists(o => dfLru.forall(d => o._2.lastUse < d._2.lastUse))) {
          val k = objLru.get._1
          objReg.remove(k)
          evicted += s"${k.sfDir}:${k.name}"
          mineObj = objReg.filter(_._1.session == sessionId(spark))
        } else {
          val lru = dfLru.get._1
          // blocking: RDD block removal is async under unpersist(false), so
          // the re-polled storage info would still count the evicted entry
          // and the loop would cascade-evict everything owned
          releaseEntry(spark, lru, blocking = true)
          evicted += s"${lru.sfDir}:${lru.name}"
          mine = reg.filter(_._1.session == sessionId(spark))
        }
      }
      evicted.toList
    }

  /** Eagerly `localCheckpoint` a DataFrame and return it with an
    * idempotent release handle for the blocks the checkpoint pinned.
    * Iterative algorithms (connected components, PageRank) checkpoint
    * every round; superseded rounds' blocks otherwise wait for
    * reference-GC (ContextCleaner) — under a bounded heap that wait is
    * storage pressure. Calling the PREVIOUS round's handle once the next
    * round is materialized frees the state deterministically. The handle
    * is safe to call at most the blocks' owner should: after release the
    * checkpointed frame is NOT recomputable (lineage is truncated), so
    * only release state no consumer will touch again.
    */
  def checkpointTracked(df: DataFrame): (DataFrame, () => Unit) =
    synchronized {
      val sc = df.sparkSession.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val ck = df.localCheckpoint()
      val pinned = sc.getPersistentRDDs.keySet.diff(before).toSet
      val release = () => pinned.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach { r =>
          try r.unpersist(blocking = false) catch { case _: Throwable => }
        })
      (ck, release)
    }

  /** Entries currently held for a session (diagnostics/specs) — both
    * DataFrame and driver-object entries.
    */
  def entries(spark: SparkSession): Seq[String] = synchronized {
    (reg.keys ++ objReg.keys).filter(_.session == sessionId(spark))
      .map(k => s"${k.sfDir}:${k.name}").toSeq
  }

  /** Per-entry telemetry for this session: (sfDir:name, peak cached
    * bytes observed at any budget enforcement, build count). A build
    * count above 1 means the entry was evicted and rebuilt (LRU thrash);
    * peak bytes against the budget shows the headroom. Survives eviction.
    */
  def telemetry(spark: SparkSession): Seq[(String, Long, Int)] =
    synchronized {
      stats.toSeq.collect {
        case (k, s) if k.session == sessionId(spark) =>
          (s"${k.sfDir}:${k.name}", s.peakBytes, s.builds)
      }
    }

  private def releaseEntry(spark: SparkSession, key: Key,
      blocking: Boolean = false): Unit =
    reg.remove(key).foreach { e =>
      // CacheManager entry (plan-keyed persist), if any
      try e.df.unpersist(blocking) catch { case _: Throwable => }
      // raw pinned RDDs (localCheckpoint blocks live here; Dataset
      // .unpersist can't free them)
      val live = spark.sparkContext.getPersistentRDDs
      e.rddIds.foreach(id => live.get(id).foreach { r =>
        try r.unpersist(blocking) catch { case _: Throwable => }
      })
    }
}
