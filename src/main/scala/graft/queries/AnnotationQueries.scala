package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Annotation and preference-data operators — the post-scoring steps a
  * preference-tuning (RLHF/DPO) pipeline runs between reward scoring
  * and pair export: pairing the best- and worst-scored candidate per
  * prompt into (chosen, rejected) training pairs, and resolving
  * multi-annotator label sets into majority labels with agreement
  * statistics. The reference has no preference surface (its scope is
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

  val defs: Seq[(String, Q)] = Seq(

    // Preference-pair construction — the DPO/RLHF layout step: every
    // prompt's candidate responses (fixture: documents bucketed into
    // 128 prompts by doc_id, reward = deterministic md5 draw) reduce
    // to ONE (chosen, rejected) pair = (argmax, argmin) by reward with
    // doc_id tie-breaks. The whole reduction is a single groupBy with
    // lexicographic struct max/min — an associative map-side-combining
    // aggregate, NOT a per-group sort or window: at 100 TB the
    // candidate relation shuffles once on prompt_id and each partial
    // aggregate carries exactly two (score, id) structs per prompt, so
    // group size (candidates per prompt) never materializes anywhere.
    // Prompts with a single candidate drop (no pair to form); margin 0
    // pairs survive (equal-reward ties are real DPO data).
    "q_pref_pairs" -> Q(
      (s, dir) => {
        val scored = Tables.load(s, dir, "documents").select(
          pmod(col("doc_id"), lit(128L)).as("prompt_id"),
          col("doc_id"),
          pmod(draw("rm", col("doc_id")), lit(1000000L)).as("score"))
        scored.groupBy(col("prompt_id"))
          .agg(max(struct(col("score"), col("doc_id"))).as("mx"),
            min(struct(col("score"), col("doc_id"))).as("mn"),
            count(lit(1)).as("n_cand"))
          .filter(col("n_cand") >= 2)
          .select(col("prompt_id"),
            col("mx.doc_id").as("chosen_id"),
            col("mn.doc_id").as("rejected_id"),
            (col("mx.score") - col("mn.score")).as("margin"),
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

    // Multi-annotator label resolution — majority vote + agreement
    // over a 3-annotator fixture (each annotator reads the true label
    // doc_id % 4 but replaces it with a random class on a 20% md5
    // draw). The votes relation arrives as ROWS (one scan + explode of
    // the per-annotator labels, modeling an annotation table); the
    // resolution is ONE groupBy(doc_id) of bounded conditional counts
    // — the label domain (4) is a compile-time constant, so the
    // aggregate state is 4 longs per key, map-side combining, and no
    // collect_list/sort ever sees the vote multiplicity. Majority
    // tie-break = smallest label (the 1-1-1 three-way case), expressed
    // as the same first-match CASE ladder in both engines.
    "q_label_vote" -> Q(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
        def lab(k: Int) = {
          val h = pmod(draw(s"a$k", col("doc_id")), lit(40L))
          when(h < 8, pmod(h, lit(4L)))
            .otherwise(pmod(col("doc_id"), lit(4L)))
        }
        val votes = docs
          .select(col("doc_id"),
            explode(array(lab(0), lab(1), lab(2))).as("l"))
        def c(i: Int) =
          sum(when(col("l") === i, 1L).otherwise(0L)).as(s"c$i")
        val counted = votes.groupBy(col("doc_id"))
          .agg(c(0), c(1), c(2), c(3), count(lit(1)).as("n"))
          .withColumn("m",
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
      Some("""WITH v AS (
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
             |  FROM lab GROUP BY doc_id),
             |g AS (SELECT *, greatest(c0, c1, c2, c3) AS m FROM c)
             |SELECT doc_id,
             |  CAST(CASE WHEN c0 = m THEN 0 WHEN c1 = m THEN 1
             |            WHEN c2 = m THEN 2 ELSE 3 END AS BIGINT) AS vote,
             |  m AS votes_for,
             |  CAST(CASE WHEN m = n THEN 1 ELSE 0 END AS BIGINT) AS unanimous
             |FROM g
             |ORDER BY doc_id""".stripMargin))
  )
}
