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
  *     that justifies them.
  *
  * A future entry that regresses either rule goes red here without
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
    boundedWindowEntries.keys.foreach { n =>
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
  }
}
