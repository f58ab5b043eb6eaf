package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide structural plan gates — the generalization of the
  * one-off PlanSpec shapes, closing the class the way SchemaGateSpec
  * closed output shapes: EVERY entry's timed plan (benchFn where one
  * exists, fn otherwise) is swept and must carry
  *
  *  1. no `CartesianProduct` — an all-pairs physical join is never the
  *     right plan at 100 TB (`crossJoin(broadcast(one-row-stats))`
  *     plans as BroadcastNestedLoopJoin and stays legal), and
  *  2. no UNPARTITIONED `Window` over corpus-derived input — a global
  *     window funnels the whole relation through one task; the only
  *     admissible global windows run over documented BOUNDED relations
  *     (an enum of layouts, a k-bounded candidate set, a
  *     histogram-of-buckets), whitelisted by name below with the bound
  *     that justifies them, and
  *  3. no `broadcast()` hint over an UNREDUCED corpus fact scan — a
  *     static broadcast of a relation sized by the corpus (or by its
  *     duplicate mass) is a driver OOM at 100 TB; runtime size checks
  *     (AQE) are the mechanism for maybe-small relations.
  *
  * A future entry that regresses any rule goes red here without
  * needing its own hand-written gate. The violation detectors are
  * proven able to fire by the planted-violation test at the bottom.
  */
class RegistryPlanSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Entries whose global Window is admissible, with the reason —
    * either its input is BOUNDED (corpus-independent cardinality: at
    * most a few thousand rows through the single window task at ANY
    * corpus size), or the entry is a documented exact-oracle twin
    * whose PRODUCTION variant (named) carries no such window. */
  private val boundedWindowEntries: Map[String, String] = Map(
    "q_vocab_coverage" -> "count-of-count frequency levels: O(sqrt(2N)) distinct rows",
    "q_length_buckets" -> "~10-row power-of-two bucket relation",
    "q_mixture_sample" -> "strata-count enum (languages)",
    "q_hybrid_retrieval" -> "k-bounded candidate sets (BM25 top-100, cosine top-k)",
    "q_classifier_auc_hist" -> "4096-bucket histogram cumulation",
    "q_token_ids" -> "cutoff-filtered top-512(+tie-class) vocab candidates (top512Vocab)",
    "q_train_sequences" -> "cutoff-filtered top-512(+tie-class) vocab candidates (top512Vocab)",
    "q_classifier_auc" -> "exact-AUC verification twin; production = q_classifier_auc_hist",
    "q_classifier_filter" -> "exact-rank twin; production = q_classifier_filter_approx",
    "q_curation_v2" -> "exact-rank gate, superseded; production = q_curation_v3 benchFn",
    "q_curation_v3" -> "timed form gates by approx threshold; remaining globals are strata enums")

  private def cartesian(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("CartesianProduct")

  /** Corpus FACT tables — the relations that are unbounded at 100 TB.
    * Dimension tables (nation/region/…, the reference's config/dim
    * joins) stay legitimately broadcastable and are not listed. */
  private val factTables =
    Seq("documents.parquet", "embeddings.parquet", "lineitem.parquet",
      "orders.parquet", "events.parquet")

  /** Entries whose broadcast-hinted side legitimately reaches a fact
    * scan with no Aggregate/GlobalLimit above it, with the bound that
    * justifies the hint. The ANN/metrics family all broadcast the
    * QUERY BATCH — the `vec_id % 100` fixture residue standing in for
    * a production query relation, which arrives as its own tiny table
    * at 100 TB (the q_ann_ivfpq_stage PlanSpec comment's adjudication);
    * the corpus side of each entry never carries a hint. */
  private val queryBatchBroadcast =
    "broadcast side is the query batch (fixture % 100 residue; its own tiny relation in production)"
  private val boundedBroadcastEntries: Map[String, String] = Map(
    "q_knn_label_purity" -> queryBatchBroadcast,
    "q_ann_ivf" -> queryBatchBroadcast,
    "q_ann_ivf_stage" -> queryBatchBroadcast,
    "q_stream_vector_ingest" -> queryBatchBroadcast,
    "q_ann_lsh" -> queryBatchBroadcast,
    "q_ndcg" -> queryBatchBroadcast,
    "q_ann_pq" -> queryBatchBroadcast,
    "q_ann_ivfpq" -> (queryBatchBroadcast + ", consumed twice (probe routing + ADC lookup table)"),
    "q_ann_ivfpq_stage" -> (queryBatchBroadcast + ", consumed twice (probe routing + ADC lookup table)"),
    "q_ann_index_retrain" -> (queryBatchBroadcast + ", consumed twice (probe routing + ADC lookup table)"),
    "q_stream_ann_maintain" -> (queryBatchBroadcast + ", consumed twice (probe routing + ADC lookup table)"),
    "q_ann_ivfpq_batch" -> (queryBatchBroadcast +
      ", consumed twice (probe routing + ADC lookup table); the 10x batch is still a query relation"),
    "q_ann_rerank" -> queryBatchBroadcast,
    "q_triplet_mining" -> queryBatchBroadcast,
    "q_retrieval_metrics" -> queryBatchBroadcast,
    "q_hybrid_retrieval" -> (queryBatchBroadcast + " (single stored query vector)"),
    "q_hybrid_retrieval_batch" -> (queryBatchBroadcast +
      " (query stratum + its slot-term relation, queries × 3 rows)"),
    "q_bitext_mining_ann" -> ("broadcast side is the X query stratum routed to probe cells; " +
      "mined in bounded query batches at scale, whole-stratum here (fixture)"))

  /** Rule 3: no `broadcast()` hint whose side reaches a corpus FACT
    * scan without a cardinality-reducing operator (Aggregate /
    * GlobalLimit) on the path — a static hint over a dup-mass- or
    * corpus-sized relation pins a driver OOM at scale; AQE's runtime
    * size check is the correct mechanism there. Filters don't count as
    * reducers: a predicate's selectivity is a data property, not a
    * structural bound. (Stage tables under /tmp are out of scope — the
    * rule judges what it can see: the named fact tables.) */
  private def unboundedFactBroadcasts(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def unreduced(p: LogicalPlan): Boolean = p match {
      case _: Aggregate | _: GlobalLimit => false
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.exists(rp =>
              factTables.exists(rp.toString.contains))
          case _ => false
        }
      case other => other.children.exists(unreduced)
    }
    df.queryExecution.optimizedPlan.collect {
      case j: Join =>
        Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).count {
          case (Some(h), side) =>
            h.strategy.contains(BROADCAST) && unreduced(side)
          case _ => false
        }
    }.sum
  }

  private def globalWindows(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }.size

  test("registry sweep: no cartesian product, no unpartitioned corpus window") {
    val failures = graft.queries.Registry.all.flatMap { case (name, q) =>
      try {
        val df = q.benchFn.getOrElse(q.fn)(Tables.configure(spark), sf)
        val problems = Seq(
          if (cartesian(df)) Some("CartesianProduct in executed plan")
          else None,
          if (globalWindows(df) > 0 && !boundedWindowEntries.contains(name))
            Some(s"${globalWindows(df)} unpartitioned Window(s) not whitelisted")
          else None,
          if (unboundedFactBroadcasts(df) > 0 &&
              !boundedBroadcastEntries.contains(name))
            Some(s"${unboundedFactBroadcasts(df)} broadcast hint(s) over an " +
              "unreduced corpus fact scan, not whitelisted")
          else None).flatten
        if (problems.isEmpty) None else Some(s"$name: ${problems.mkString("; ")}")
      } catch {
        case e: Throwable => Some(s"$name: sweep error ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("whitelist hygiene: every whitelisted entry exists in the registry") {
    // a whitelisted name that no longer trips the detector is stale —
    // either the entry was fixed (drop the whitelist row) or renamed
    val names = graft.queries.Registry.all.map(_._1).toSet
    (boundedWindowEntries.keys ++ boundedBroadcastEntries.keys).foreach { n =>
      assert(names(n), s"whitelist references unknown entry $n")
    }
  }

  test("the violation detectors fire on planted violations") {
    val docs = Tables.load(spark, sf, "documents").select(col("doc_id"))
    // the hint forces CartesianProductExec — a bare crossJoin of a
    // small side plans as BroadcastNestedLoopJoin and would not fire
    val planted = docs.hint("SHUFFLE_REPLICATE_NL")
      .crossJoin(Tables.load(spark, sf, "documents")
        .select(col("doc_id").as("b")))
    assert(cartesian(planted), "cartesian detector failed to fire")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    val ranked = docs.withColumn("rn", row_number().over(w))
    assert(globalWindows(ranked) == 1, "global-window detector failed to fire")
    // a broadcast hint over a filtered-but-unaggregated corpus scan
    // must fire (filters are not structural bounds)...
    val hinted = docs.join(
      broadcast(Tables.load(spark, sf, "documents")
        .filter(col("doc_id") < 100).select(col("doc_id").as("b"))),
      col("doc_id") === col("b"))
    assert(unboundedFactBroadcasts(hinted) == 1,
      "fact-broadcast detector failed to fire")
    // ...while an aggregate-reduced broadcast stays legal
    val reduced = docs.join(
      broadcast(Tables.load(spark, sf, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))),
      docs("doc_id") % 2 === col("n") % 2)
    assert(unboundedFactBroadcasts(reduced) == 0,
      "fact-broadcast detector fired on an aggregate-bounded side")
  }
}
