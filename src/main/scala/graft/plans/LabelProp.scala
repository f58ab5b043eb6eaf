package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round synchronous LABEL PROPAGATION community detection
  * (Raghavan et al. 2007) — the lightweight community counterpart of
  * [[PageRank]]/[[Hits]]: each node starts as its own community and
  * repeatedly adopts the MAJORITY label among its neighbors, so
  * densely connected groups converge onto one label without any
  * modularity optimization pass. Distinct from
  * [[graft.text.Dedup.connectedComponents]] (min-label = pure
  * reachability): propagation splits a sparse bridge between two
  * dense groups where components would merge them.
  *
  * Determinism is the whole design (the textbook algorithm breaks
  * ties randomly and is famously unstable): rounds are fixed and
  * SYNCHRONOUS, and the majority vote packs into one BIGINT —
  * `count · 2⁴⁰ + (2⁴⁰−1−label)` — whose max() is "highest count,
  * then LOWEST label": an exact integer aggregation, bit-stable
  * under any partitioning, and a plain codegen'd HashAggregate with
  * map-side combine (the q_pref_pairs packing stance — never a
  * struct max, never a window sort). Headroom: labels < 2⁴⁰ and
  * neighbor counts < 2²³ keep the pack inside Int64.
  *
  * Shape per round: one edge⋈label hash join (co-partitioned on the
  * join key across rounds) + two map-combined aggregations; K is
  * small and fixed → a K-deep declarative chain, not a driver loop
  * over actions. Edges are undirected (both directions inserted) and
  * duplicates collapse, so a repeated interaction is one vote. */
object LabelProp {

  val Pack: Long = 1L << 40

  /** (node, label) after `rounds` synchronous majority-vote rounds
    * over the undirected, deduplicated closure of `edges` (src, dst).
    * Every node of the edge set has ≥ 1 neighbor by construction, so
    * every node votes every round. */
  def labels(edges: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 20, "rounds in [1,20]")
    val dir0 = edges.select(col("src"), col("dst"))
    // the undirected edge set feeds every round — pin it once so the
    // upstream edge construction (often a join) runs once, not K times
    val und = Materialize.stage(dir0.unionByName(
      dir0.select(col("dst").as("src"), col("src").as("dst"))).distinct())
    val nodes = und.select(col("src").as("node")).distinct()
    var lab = nodes.withColumn("label", col("node"))
    (1 to rounds).foreach { _ =>
      val votes = und
        .join(lab.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      lab = votes.groupBy(col("node"))
        .agg(max(col("c") * lit(Pack) + (lit(Pack - 1) - col("label")))
          .as("p"))
        .select(col("node"),
          (lit(Pack - 1) - col("p").bitwiseAND(lit(Pack - 1))).as("label"))
    }
    lab
  }
}
