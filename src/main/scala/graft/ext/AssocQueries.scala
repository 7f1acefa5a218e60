package graft.ext

import graft.{QueryDef, Tables}
import graft.etl.Interactions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Association-mining operators over the interaction log and event
  * stream: item-item co-occurrence with lift (the neighborhood model
  * the reference's autoencoder replaces — same user×item input,
  * Dataset_CDAE.py:26-33 — and the classic recsys/market-basket
  * baseline), and the first-order event-type transition matrix
  * (sequence mining over the event log).
  */
object AssocQueries {

  /** Minimum pair support. Doubles as the a-priori prune: an item seen
    * by fewer than MINSUP users cannot appear in any qualifying pair,
    * so the filter runs BEFORE pair generation — at 100 TB this is what
    * keeps the per-user self-join from touching long-tail items (the
    * bulk of a real catalog).
    */
  private val MINSUP = 3
  private val TOP_PAIRS = 100

  val defs: Map[String, QueryDef] = Map(

    // ---- q_item_cooc: item-item co-occurrence + lift, domain 'x'.
    //      Plan: per-user self-join generates ordered pairs — Σ C(d,2)
    //      rows, keyed by user_id so Catalyst shuffles each side once on
    //      an 8-byte key; the a-priori item prune (n ≥ MINSUP) runs
    //      before pair-gen, and degree skew is the q_triangles class
    //      (power users bound pair volume; the same cap/salt strategy
    //      applies — SCALING.md). lift = c_ab·N/(n_a·n_b) is a ratio of
    //      exact integers, so double division + round(6) is
    //      bit-reproducible cross-engine; the final top-100 is a
    //      TakeOrderedAndProject (never a full sort) with the rounded
    //      lift + pair key as the total order ----
    "q_item_cooc" -> QueryDef(
      s"""WITH ${Interactions.duckCte},
         |i AS (SELECT user_id, item_id FROM interactions WHERE domain = 'x'),
         |cnt AS (SELECT item_id, COUNT(*) AS n FROM i GROUP BY item_id),
         |f AS (SELECT i.user_id, i.item_id, n FROM i
         |      JOIN cnt USING (item_id) WHERE n >= $MINSUP),
         |u AS (SELECT COUNT(DISTINCT user_id) AS nu FROM i),
         |p AS (
         |  SELECT a.item_id AS item_a, b.item_id AS item_b,
         |         COUNT(*) AS c_ab,
         |         any_value(a.n) AS n_a, any_value(b.n) AS n_b
         |  FROM f a JOIN f b
         |    ON a.user_id = b.user_id AND a.item_id < b.item_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $MINSUP
         |)
         |SELECT item_a, item_b, c_ab, n_a, n_b,
         |  round(CAST(c_ab AS DOUBLE) * nu / (n_a * n_b), 6) AS lift
         |FROM p, u
         |ORDER BY lift DESC, item_a, item_b
         |LIMIT $TOP_PAIRS""".stripMargin) { (spark, d) =>
      val i = Interactions.cached(spark, d)
        .filter(col("domain") === "x").select("user_id", "item_id")
      val cnt = i.groupBy("item_id").agg(count(lit(1)).as("n"))
      val f = i.join(cnt, "item_id").filter(col("n") >= MINSUP)
      val nu = i.agg(countDistinct("user_id").as("nu"))
      val pairs = f.select(col("user_id"), col("item_id").as("item_a"),
          col("n").as("n_a"))
        .join(f.select(col("user_id"), col("item_id").as("item_b"),
          col("n").as("n_b")), "user_id")
        .filter(col("item_a") < col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(count(lit(1)).as("c_ab"),
          first("n_a").as("n_a"), first("n_b").as("n_b"))
        .filter(col("c_ab") >= MINSUP)
      pairs.crossJoin(broadcast(nu))
        .select(col("item_a"), col("item_b"), col("c_ab"),
          col("n_a"), col("n_b"),
          round(col("c_ab").cast("double") * col("nu")
            / (col("n_a") * col("n_b")), 6).as("lift"))
        .orderBy(col("lift").desc, col("item_a"), col("item_b"))
        .limit(TOP_PAIRS)
    },

    // ---- q_markov_trans: first-order event-type transition matrix.
    //      One lead() window per user (ts, event_id total order — the
    //      single user_id shuffle), one hash agg for transition counts,
    //      and a per-source window closes the row-stochastic
    //      probabilities. p = c/Σc per source is again an exact-integer
    //      ratio → round(6) is cross-engine stable. 100 TB: the window
    //      partitions by user (millions of small partitions — the
    //      no-skew case), the agg output is |types|² rows ----
    "q_markov_trans" -> QueryDef(
      s"""WITH s AS (
         |  SELECT event_type AS src,
         |         lead(event_type) OVER (PARTITION BY user_id
         |                                ORDER BY ts, event_id) AS dst
         |  FROM events
         |), c AS (
         |  SELECT src, dst, COUNT(*) AS c FROM s
         |  WHERE dst IS NOT NULL GROUP BY src, dst
         |)
         |SELECT src, dst, c,
         |  round(CAST(c AS DOUBLE)
         |        / SUM(c) OVER (PARTITION BY src), 6) AS p
         |FROM c ORDER BY src, dst""".stripMargin) { (spark, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val c = Tables.events(spark, d)
        .select(col("event_type").as("src"),
          lead("event_type", 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).as("c"))
      c.select(col("src"), col("dst"), col("c"),
          round(col("c").cast("double")
            / sum("c").over(Window.partitionBy("src")), 6).as("p"))
        .orderBy("src", "dst")
    })
}
