package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in EXACT integer micro-units — iterative
  * graph analytics (influence/centrality over an interaction graph)
  * with bit-identical results on any engine.
  *
  * Floating-point PageRank is order-sensitive: contribution sums
  * change with partitioning, so no hash oracle could check it. Here a
  * node's rank is a BIGINT in units of 1e-9: the per-edge contribution
  * is integer division `rank div outdeg`, the damping step is
  * `(sum * 85) div 100 + 150_000_000` (d = 0.85 exactly), and integer
  * addition is associative — the result is a pure function of the
  * graph, independent of evaluation order. The truncation each step
  * loses < 1e-9 per edge, far below any ranking-relevant difference.
  *
  * Semantics: simplified PageRank without dangling-mass
  * redistribution (a sink node's mass leaves the system — fine for
  * relative ranking, and what keeps the recurrence oracle-expressible).
  * Each iteration is one join edges⋈ranks (both sides partitioned on
  * the src key — co-partitioned after the first iteration) plus one
  * aggregation keyed by dst; `iterations` is small and fixed, so the
  * plan is a K-deep chain, not a driver loop over actions. */
object PageRank {

  val Unit0: Long = 1000000000L // rank 1.0 in micro-units

  /** Ranks after `iterations` damped steps. `edges` carries (src, dst);
    * duplicates are collapsed. Returns (node, u) with u in 1e-9 units. */
  def ranks(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 20, "iterations in [1,20]")
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var r = nodes.withColumn("u", lit(Unit0))
    (1 to iterations).foreach { _ =>
      val contribs = e
        .join(r.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("u div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      r = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(150000000L) + expr("(coalesce(s, 0L) * 85) div 100")).as("u"))
    }
    r
  }

  /** Standard-PageRank variant: DANGLING mass — the rank held by nodes
    * with no out-edges — is redistributed uniformly each iteration
    * instead of leaving the system, so sink-heavy graphs rank the
    * textbook way. Per-iteration extra cost: one anti-join aggregate
    * over the (node, rank) relation producing a ONE-ROW dangling-sum
    * relation, broadcast into the damping projection together with the
    * one-row node count (the same one-row-stats crossJoin shape as
    * BM25/TF-IDF — never a data-sized cartesian). Integer semantics as
    * [[ranks]]: each node's share is `dang div N` (truncating), so the
    * redistributed mass stays exact integer arithmetic; the < N·1e-9
    * truncation loss per iteration is ranking-irrelevant. */
  def ranksDangling(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 20, "iterations in [1,20]")
    // Unlike [[ranks]] (each round consumed once → linear chain), the
    // dangling variant consumes every round's rank relation TWICE —
    // the dangling-sum anti-join AND the contribution join — so left
    // lazy the recurrence re-executes its prefix per consumer (2^K).
    // Pin the shared relations once and each round's result.
    val e = Materialize.stage(edges.select(col("src"), col("dst")).distinct())
    val nodes = Materialize.stage(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct())
    val outdeg = Materialize.stage(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
    val n = nodes.agg(count(lit(1)).as("n"))
    var r = nodes.withColumn("u", lit(Unit0))
    (1 to iterations).foreach { _ =>
      r = Materialize.stage(r)
      val dang = r
        .join(outdeg.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("u")), lit(0L)).as("dang"))
      val contribs = e
        .join(r.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("u div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      r = nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .crossJoin(broadcast(n))
        .select(col("node"),
          (lit(150000000L) +
            expr("((coalesce(s, 0L) + dang div n) * 85) div 100")).as("u"))
    }
    r
  }
}
