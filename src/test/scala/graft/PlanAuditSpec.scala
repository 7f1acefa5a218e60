package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}

/** Suite-wide plan lint: EVERY registered query's optimized logical plan
  * is audited for the two anti-patterns that are silent at test scale and
  * fatal at 100 TB — an unpartitioned window (all rows through ONE task's
  * sort) and a condition-free/cross join (cardinality product). Per-query
  * PlanSpec asserts cover specific shapes; this spec guarantees the whole
  * registry, so a NEW operator that sneaks either pattern in fails CI
  * here, not on the cluster.
  *
  * Exemptions are explicit and carry the scale argument that justifies
  * them — every one is a BOUNDED relation (rows independent of corpus
  * size, or a documented honest price like q_auc's 16 B/row global rank).
  */
class PlanAuditSpec extends SparkSpec {

  /** name → why an UNPARTITIONED window is safe for this query. Two
    * legitimate classes: (a) the window runs over a relation whose row
    * count is bounded by a DOMAIN axis (bins, hours, days, folds, top-k
    * lists — independent of corpus size); (b) the global order IS the
    * operator's definition and the sorted rows are a few bytes each —
    * the documented "16 B/row honest price" of exact rank statistics.
    */
  private val globalWindowExempt: Map[String, String] = Map(
    "q_auc" -> "global (score,label) midrank IS Mann-Whitney AUC; 16 B/row honest price (SURVEY)",
    "q_auc_folds" -> "fold-partitioned ranks; the global window runs over the 5-row fold summary",
    "q_score_deciles" -> "global ntile over the same 16 B/row exact rank relation as q_auc",
    "q_ks_test" -> "KS statistic is a global order statistic of the pooled 16 B/row (score,group) rows",
    "q_quantile_norm" -> "rank→global-order-statistic mapping is the operator's definition; 8-byte rows",
    "q_drift_psi" -> "grand-total window over the FIXED 16-bucket PSI relation",
    "q_dedup_sweep" -> "cumulative window over the 10-row Jaccard-bin relation",
    "q_rolling_avg" -> "trailing mean over the per-DAY revenue rollup — rows bounded by the time axis",
    "q_seasonality" -> "24-row hour-of-day profile",
    "q_rrf_fusion" -> "rank fusion over the ≤100-row merged top-k lists",
    "q_uniques_cumulative" -> "cumulative union over the |days|-row HLL sketch relation")

  /** name → why a CROSS/condition-free join is safe despite BOTH sides
    * lacking a static row bound. EMPTY as of r9 — every condition-free
    * join in the registry (scalar totals, thresholds, literal k-lists,
    * argmax candidates) carries a side with a STATIC `maxRows` bound the
    * auto-allow below admits; a new operator that cross-joins two
    * unbounded relations fails here with no escape hatch short of adding
    * a written justification.
    */
  private val crossJoinExempt: Map[String, String] = Map.empty

  /** Condition-free joins are auto-allowed when either side has a STATIC
    * row bound (grouping-free aggregates report maxRows = 1, literal
    * relations their size) — the scalar-broadcast pattern used all over
    * the engine. Anything else must be exempted by name above.
    */
  private val autoAllowRows = 1000L

  /** Flagged query names; exemptions must match EXACTLY — an offender
    * without an exemption fails, and a stale exemption (query no longer
    * trips the rule) also fails, so the list can never silently mask a
    * future regression.
    */
  private def audit(pred: LogicalPlan => Boolean,
      exempt: Map[String, String], rule: String): Unit = {
    spark.catalog.clearCache()
    val flagged = SparkEntry.defs.toSeq.sortBy(_._1).flatMap {
      case (name, qd) =>
        val plan = qd.build(spark, sf()).queryExecution.optimizedPlan
        if (pred(plan)) Some(name) else None
    }.toSet
    val bad = (flagged -- exempt.keySet).toSeq.sorted
    assert(bad.isEmpty, s"$rule in: $bad")
    val stale = (exempt.keySet -- flagged).toSeq.sorted
    assert(stale.isEmpty,
      s"stale $rule exemptions (no longer flagged — remove them): $stale")
  }

  test("no registered query plans an unpartitioned window (exemptions documented)") {
    audit(p => p.collectWithSubqueries {
        case w: Window if w.partitionSpec.isEmpty => w
      }.nonEmpty,
      globalWindowExempt, "unpartitioned windows (single-task global sorts)")
  }

  test("no registered query plans an interpreted Scala UDF (zero exemptions)") {
    // a ScalaUDF runs interpreted per row and breaks the enclosing
    // WholeStageCodegen span — on a 100 TB scan side that is the
    // difference between a vectorized filter and a per-row closure call.
    // r9's last holdout (the bloom probe in q_decontaminate_bloom) is now
    // the native BloomFilterMightContain; the registry ships UDF-free and
    // this keeps it that way.
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    audit(p => p.collectWithSubqueries {
        case n if n.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])) => n
      }.nonEmpty,
      Map.empty, "interpreted Scala UDFs (codegen breakers)")
  }

  test("no registered query plans a cross or condition-free join (exemptions documented)") {
    def unbounded(p: LogicalPlan): Boolean =
      !p.maxRows.exists(_ <= autoAllowRows)
    audit(p => p.collectWithSubqueries {
        case j: Join if j.joinType == Cross
          && unbounded(j.left) && unbounded(j.right) => j
        case j @ Join(l, r, Inner, None, _)
          if unbounded(l) && unbounded(r) => j
      }.nonEmpty,
      crossJoinExempt, "cross/condition-free joins")
  }
}
