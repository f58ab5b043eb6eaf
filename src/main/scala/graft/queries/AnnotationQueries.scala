package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import graft.Tables

/** Annotation and preference-data operators — the post-scoring steps a
  * preference-tuning (RLHF/DPO) pipeline runs between reward scoring
  * and pair export: pairing the best- and worst-scored candidate per
  * prompt into (chosen, rejected) training pairs, resolving
  * multi-annotator label sets into majority labels, and the corpus
  * agreement statistic (Fleiss' kappa) an annotation pipeline reports
  * next to them. The reference has no preference surface (its scope is
  * config-driven ingestion, `/root/reference/modules/etl_functions.py`);
  * these extend the engine's LLM-training-data battery the same way the
  * dedup/packing families do. Fixtures derive deterministically from
  * `documents` via the shared md5-bucket construction
  * ([[graft.text.Dedup.md5Hash60]], the [[graft.plans.Splits]] idiom)
  * so the DuckDB oracles replay them bit-for-bit.
  */
object AnnotationQueries {

  /** 60-bit md5 integer of `seed:<key>` — the one shared deterministic
    * "model score / annotator draw" source, bit-equal in DuckDB as
    * `('0x' || substr(md5(seed || ':' || key), 1, 15))::BIGINT`. */
  private def draw(seed: String, key: org.apache.spark.sql.Column) =
    graft.text.Dedup.md5Hash60(concat(lit(seed + ":"), key.cast("string")))

  /** 3-annotator vote fixture shared by q_label_vote and q_kappa: each
    * annotator reads the true label doc_id % 4 but replaces it with a
    * random class on a 20% md5 draw. One corpus scan + explode — votes
    * arrive as ROWS, modeling an annotation table. */
  private def votesOf(s: SparkSession, dir: String): DataFrame = {
    def lab(k: Int) = {
      val h = pmod(draw(s"a$k", col("doc_id")), lit(40L))
      when(h < 8, pmod(h, lit(4L)))
        .otherwise(pmod(col("doc_id"), lit(4L)))
    }
    Tables.load(s, dir, "documents").select(col("doc_id"),
      explode(array(lab(0), lab(1), lab(2))).as("l"))
  }

  /** Per-doc bounded conditional counts over the vote rows — the label
    * domain (4) is a compile-time constant, so the aggregate state is
    * 4 longs per key (plain codegen'd HashAggregate, map-side
    * combining) and no collect_list/sort ever sees vote multiplicity. */
  private def voteCounts(s: SparkSession, dir: String): DataFrame = {
    def c(i: Int) = sum(when(col("l") === i, 1L).otherwise(0L)).as(s"c$i")
    votesOf(s, dir).groupBy(col("doc_id"))
      .agg(c(0), c(1), c(2), c(3), count(lit(1)).as("n"))
  }

  /** The vote fixture + per-doc counts as oracle CTEs — one definition
    * feeding both annotation oracles so they cannot drift. */
  private val voteCtes: String =
    """v AS (
      |  SELECT doc_id, k,
      |    ('0x' || substr(md5('a' || k || ':' || doc_id), 1, 15))
      |      ::BIGINT % 40 AS h
      |  FROM documents, (SELECT unnest([0, 1, 2]) AS k)),
      |lab AS (
      |  SELECT doc_id,
      |    CASE WHEN h < 8 THEN h % 4 ELSE doc_id % 4 END AS l
      |  FROM v),
      |c AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN l = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
      |    CAST(sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN l = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
      |    CAST(sum(CASE WHEN l = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM lab GROUP BY doc_id)""".stripMargin

  val defs: Seq[(String, Q)] = Seq(

    // Preference-pair construction — the DPO/RLHF layout step: every
    // prompt's candidate responses (fixture: documents bucketed into
    // 128 prompts by doc_id, reward = deterministic md5 draw in
    // [0, 1e6)) reduce to ONE (chosen, rejected) pair = (argmax,
    // argmin) by reward with doc_id tie-breaks. The reduction is a
    // single groupBy of plain LONG max/min over (score, doc_id)
    // bit-packed into one long (score · 2⁴⁰ + doc_id: score < 2²⁰ and
    // doc_id < 2⁴⁰ make numeric order ≡ lexicographic order) — packing
    // instead of max(struct(...)) keeps the aggregation buffer a
    // mutable primitive, so the whole reduction stays a codegen'd
    // HashAggregate with map-side partial combine (a struct buffer
    // demotes to SortAggregate: a per-partition sort just to take a
    // max). At 100 TB the candidate relation shuffles once on
    // prompt_id and each partial aggregate carries exactly two longs
    // per prompt — candidate multiplicity never materializes anywhere.
    // Prompts with a single candidate drop (no pair to form); margin 0
    // pairs survive (equal-reward ties are real DPO data).
    // PlanSpec gates the HashAggregate/no-Window shape.
    "q_pref_pairs" -> Q(
      (s, dir) => {
        val two40 = 1099511627776L // 2^40
        val scored = Tables.load(s, dir, "documents").select(
          pmod(col("doc_id"), lit(128L)).as("prompt_id"),
          (pmod(draw("rm", col("doc_id")), lit(1000000L)) * two40 +
            col("doc_id")).as("packed"))
        scored.groupBy(col("prompt_id"))
          .agg(max(col("packed")).as("mx"), min(col("packed")).as("mn"),
            count(lit(1)).as("n_cand"))
          .filter(col("n_cand") >= 2)
          .select(col("prompt_id"),
            // exact unpack: packed > 2^53, so bit ops, never a double
            // division (which would silently round the id)
            col("mx").bitwiseAND(lit(two40 - 1)).as("chosen_id"),
            col("mn").bitwiseAND(lit(two40 - 1)).as("rejected_id"),
            (shiftright(col("mx"), 40) - shiftright(col("mn"), 40))
              .as("margin"),
            col("n_cand"))
          .orderBy(col("prompt_id"))
      },
      Some("""WITH scored AS (
             |  SELECT doc_id % 128 AS prompt_id, doc_id,
             |    ('0x' || substr(md5('rm:' || doc_id), 1, 15))::BIGINT
             |      % 1000000 AS score
             |  FROM documents),
             |r AS (
             |  SELECT prompt_id, doc_id, score,
             |    row_number() OVER (PARTITION BY prompt_id
             |      ORDER BY score DESC, doc_id DESC) AS rmax,
             |    row_number() OVER (PARTITION BY prompt_id
             |      ORDER BY score ASC, doc_id ASC) AS rmin,
             |    count(*) OVER (PARTITION BY prompt_id) AS n_cand
             |  FROM scored)
             |SELECT a.prompt_id,
             |  a.doc_id AS chosen_id,
             |  b.doc_id AS rejected_id,
             |  a.score - b.score AS margin,
             |  CAST(a.n_cand AS BIGINT) AS n_cand
             |FROM r a JOIN r b
             |  ON a.prompt_id = b.prompt_id AND b.rmin = 1
             |WHERE a.rmax = 1 AND a.n_cand >= 2
             |ORDER BY a.prompt_id""".stripMargin)),

    // Multi-annotator label resolution — majority vote + agreement per
    // document over the shared 3-annotator fixture. Majority tie-break
    // = smallest label (the 1-1-1 three-way case), expressed as the
    // same first-match CASE ladder in both engines.
    "q_label_vote" -> Q(
      (s, dir) => {
        val counted = voteCounts(s, dir).withColumn("m",
          greatest(col("c0"), col("c1"), col("c2"), col("c3")))
        counted.select(col("doc_id"),
            when(col("c0") === col("m"), 0L)
              .when(col("c1") === col("m"), 1L)
              .when(col("c2") === col("m"), 2L)
              .otherwise(3L).as("vote"),
            col("m").as("votes_for"),
            when(col("m") === col("n"), 1L).otherwise(0L).as("unanimous"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $voteCtes,
              |g AS (SELECT *, greatest(c0, c1, c2, c3) AS m FROM c)
              |SELECT doc_id,
              |  CAST(CASE WHEN c0 = m THEN 0 WHEN c1 = m THEN 1
              |            WHEN c2 = m THEN 2 ELSE 3 END AS BIGINT) AS vote,
              |  m AS votes_for,
              |  CAST(CASE WHEN m = n THEN 1 ELSE 0 END AS BIGINT)
              |    AS unanimous
              |FROM g
              |ORDER BY doc_id""".stripMargin)),

    // Fleiss' kappa — the corpus-level inter-annotator agreement an
    // annotation pipeline reports next to the resolved labels: for N
    // items, n=3 raters, k=4 classes, observed agreement
    // P̄ = (Σᵢⱼ cᵢⱼ² − N·n) / (N·n·(n−1)) and chance agreement
    // Pₑ = Σⱼ (Σᵢ cᵢⱼ / (N·n))². Everything up to the last few
    // divisions is EXACT integer aggregation (Σ c², per-class totals)
    // in one two-level rollup — per-doc counts, then a single
    // all-reduce to one row — so the statistic is bit-stable under any
    // partitioning; the final doubles round to 6 dp with the identical
    // expression shape in DuckDB (the q_corr_stats contract). With
    // ~60% unanimity by construction, κ lands well above chance.
    "q_kappa" -> Q(
      (s, dir) => {
        val sq = (1 to 3).foldLeft(col("c0") * col("c0")) { (a, i) =>
          a + col(s"c$i") * col(s"c$i")
        }
        voteCounts(s, dir)
          .agg(count(lit(1)).as("nd"), sum(sq).as("ss"),
            sum(col("c0")).as("s0"), sum(col("c1")).as("s1"),
            sum(col("c2")).as("s2"), sum(col("c3")).as("s3"),
            sum(col("n")).as("sn"))
          .select(col("nd").as("n_docs"),
            round((col("ss") - col("sn")) / (col("nd") * lit(6.0)), 6)
              .as("p_obs"),
            round((col("s0") * col("s0") + col("s1") * col("s1") +
                col("s2") * col("s2") + col("s3") * col("s3")) /
              ((col("nd") * lit(3.0)) * (col("nd") * lit(3.0))), 6)
              .as("p_exp"),
            round(((col("ss") - col("sn")) / (col("nd") * lit(6.0)) -
                (col("s0") * col("s0") + col("s1") * col("s1") +
                  col("s2") * col("s2") + col("s3") * col("s3")) /
                ((col("nd") * lit(3.0)) * (col("nd") * lit(3.0)))) /
              (lit(1.0) -
                (col("s0") * col("s0") + col("s1") * col("s1") +
                  col("s2") * col("s2") + col("s3") * col("s3")) /
                ((col("nd") * lit(3.0)) * (col("nd") * lit(3.0)))), 6)
              .as("kappa"))
      },
      Some(s"""WITH $voteCtes,
              |agg AS (
              |  SELECT CAST(count(*) AS BIGINT) AS nd,
              |    CAST(sum(c0*c0 + c1*c1 + c2*c2 + c3*c3) AS BIGINT) AS ss,
              |    CAST(sum(c0) AS BIGINT) AS s0,
              |    CAST(sum(c1) AS BIGINT) AS s1,
              |    CAST(sum(c2) AS BIGINT) AS s2,
              |    CAST(sum(c3) AS BIGINT) AS s3,
              |    CAST(sum(n) AS BIGINT) AS sn
              |  FROM c)
              |SELECT nd AS n_docs,
              |  round((ss - sn) / (nd * 6.0), 6) AS p_obs,
              |  round((s0*s0 + s1*s1 + s2*s2 + s3*s3)
              |    / ((nd * 3.0) * (nd * 3.0)), 6) AS p_exp,
              |  round(((ss - sn) / (nd * 6.0)
              |      - (s0*s0 + s1*s1 + s2*s2 + s3*s3)
              |        / ((nd * 3.0) * (nd * 3.0)))
              |    / (1.0 - (s0*s0 + s1*s1 + s2*s2 + s3*s3)
              |        / ((nd * 3.0) * (nd * 3.0))), 6) AS kappa
              |FROM agg""".stripMargin)),

    // Bradley–Terry strength ratings over pairwise comparisons — the
    // arena/leaderboard fit an evaluation pipeline runs over human (or
    // judge-model) A-vs-B verdicts. Fixture: each document is one
    // comparison between two of 5 "models" (doc_id % 5 vs
    // (doc_id div 5) % 5, self-matches dropped); the winner draw is
    // md5-deterministic and BIASED by the index gap (A wins on
    // h < 5 + a − b of 10), so a true skill ordering 0 < … < 4 exists
    // for the fit to recover. The corpus-sized work is ONE pass
    // aggregating verdicts into the bounded sufficient statistics —
    // n_ij per unordered pair (≤ 10 rows) and wins per model (≤ 5, +1
    // add-one smoothing so a winless model keeps a nonzero rating) —
    // the MM iterations (Hunter 2004) then run entirely on that
    // enum-sized relation: r_i ← w_i / Σ_j n_ij/(r_i+r_j), 3 rounds,
    // in exact BIGINT micro-units (1e6 = rating 1.0; per-pair term
    // n_ij·1e12 div (r_i+r_j)) — the PageRank/HITS integer stance, so
    // the result is a pure function of the verdict counts under any
    // partitioning and the oracle unrolls the identical recurrence.
    // Each round is pinned (Materialize.stage) because round k feeds
    // BOTH sides of round k+1's pair join — the ranksDangling
    // multi-consumer rule.
    "q_bt_ratings" -> Q(
      (s, dir) => {
        val unit2 = 1000000000000L // 1e6 (units) · 1e6 (rating 1.0)
        val cmp = Tables.load(s, dir, "documents")
          .select(pmod(col("doc_id"), lit(5L)).as("ma"),
            pmod(expr("doc_id div 5"), lit(5L)).as("mb"),
            pmod(draw("arena", col("doc_id")), lit(10L)).as("h"))
          .filter(col("ma") =!= col("mb"))
          .select(least(col("ma"), col("mb")).as("i"),
            greatest(col("ma"), col("mb")).as("j"),
            when(col("h") < lit(5L) + col("ma") - col("mb"), col("ma"))
              .otherwise(col("mb")).as("winner"))
        val n = graft.plans.Materialize.stage(
          cmp.groupBy(col("i"), col("j")).agg(count(lit(1)).as("nij")))
        val models = graft.plans.Materialize.stage(
          n.select(col("i").as("m"))
            .unionByName(n.select(col("j").as("m"))).distinct())
        val w = graft.plans.Materialize.stage(
          models.join(
              cmp.groupBy(col("winner").as("m"))
                .agg(count(lit(1)).as("wr")), Seq("m"), "left")
            .select(col("m"), (coalesce(col("wr"), lit(0L)) + 1L).as("w")))
        var r = models.withColumn("r", lit(1000000L))
        (1 to 3).foreach { _ =>
          r = graft.plans.Materialize.stage(r)
          val terms = n
            .join(r.select(col("m").as("i"), col("r").as("ri")), Seq("i"))
            .join(r.select(col("m").as("j"), col("r").as("rj")), Seq("j"))
            .select(col("i"), col("j"),
              expr(s"(nij * ${unit2}L) div (ri + rj)").as("t"))
          val denom = terms.select(col("i").as("m"), col("t"))
            .unionByName(terms.select(col("j").as("m"), col("t")))
            .groupBy(col("m")).agg(sum(col("t")).as("d"))
          r = w.join(denom, Seq("m"))
            .select(col("m"), expr(s"(w * ${unit2}L) div d").as("r"))
        }
        w.join(r, Seq("m"))
          .select(col("m").as("model"), (col("w") - 1L).as("wins"),
            col("r").as("rating_q"))
          .orderBy(col("model"))
      },
      Some {
        val unit2 = "1000000000000"
        def round(k: Int): String =
          s"""t$k AS (
             |  SELECT n.i, n.j,
             |    (n.nij * $unit2) // (ri.r + rj.r) AS t
             |  FROM n JOIN r${k - 1} ri ON ri.m = n.i
             |         JOIN r${k - 1} rj ON rj.m = n.j),
             |d$k AS (
             |  SELECT m, CAST(sum(t) AS BIGINT) AS d
             |  FROM (SELECT i AS m, t FROM t$k
             |        UNION ALL SELECT j AS m, t FROM t$k)
             |  GROUP BY m),
             |r$k AS (
             |  SELECT w.m, CAST((w.w * $unit2) // d.d AS BIGINT) AS r
             |  FROM w JOIN d$k d USING (m))""".stripMargin
        s"""WITH cmp AS (
           |  SELECT doc_id % 5 AS ma, (doc_id // 5) % 5 AS mb,
           |    ('0x' || substr(md5('arena:' || doc_id), 1, 15))::BIGINT
           |      % 10 AS h
           |  FROM documents WHERE doc_id % 5 <> (doc_id // 5) % 5),
           |res AS (
           |  SELECT least(ma, mb) AS i, greatest(ma, mb) AS j,
           |    CASE WHEN h < 5 + (ma - mb) THEN ma ELSE mb END AS winner
           |  FROM cmp),
           |n AS (SELECT i, j, CAST(count(*) AS BIGINT) AS nij
           |      FROM res GROUP BY i, j),
           |models AS (
           |  SELECT DISTINCT m FROM (
           |    SELECT i AS m FROM n UNION ALL SELECT j AS m FROM n)),
           |wins AS (SELECT winner AS m, CAST(count(*) AS BIGINT) AS wr
           |         FROM res GROUP BY winner),
           |w AS (
           |  SELECT models.m, CAST(coalesce(wr, 0) + 1 AS BIGINT) AS w
           |  FROM models LEFT JOIN wins USING (m)),
           |r0 AS (SELECT m, CAST(1000000 AS BIGINT) AS r FROM models),
           |${round(1)},
           |${round(2)},
           |${round(3)}
           |SELECT w.m AS model, w.w - 1 AS wins, r3.r AS rating_q
           |FROM w JOIN r3 USING (m)
           |ORDER BY model""".stripMargin
      })
  )
}
