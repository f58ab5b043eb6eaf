package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.vector.{Ann, VectorFunctions}

/** Embedding similarity search over `embeddings` (array<float> × 64):
  * brute-force cosine top-k as the verified baseline, LSH-bucketed ANN
  * as the scale path, plus a label-purity quality metric through the
  * windowed exact-kNN path. */
object VectorQueries {

  val defs: Seq[(String, Q)] = Seq(

    // Brute-force cosine top-10 against the vec_id=0 embedding. The
    // query vector is a one-row driver fetch (O3 scalar lookup); the
    // scan itself is one narrow pass + TakeOrdered.
    "q_cosine_topk" -> Q(
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding")).first()
          .getSeq[Float](0).map(_.toDouble)
        Ann.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      },
      Some("""SELECT vec_id,
             |  list_cosine_similarity(CAST(embedding AS DOUBLE[]),
             |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0))
             |    AS sim
             |FROM embeddings
             |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin)),

    // Pairwise cosine of adjacent vectors (zip_with dot product through
    // an equi-join).
    "q_cosine_pairs" -> Q(
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val a = emb.filter(col("vec_id") % 2 === 0)
          .select(col("vec_id"), col("embedding").as("va"))
        val b = emb.select((col("vec_id") - 1).as("vec_id"),
          col("embedding").as("vb"))
        a.join(b, Seq("vec_id"))
          .select(col("vec_id"),
            VectorFunctions.cosine(col("va"), col("vb")).as("sim"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT a.vec_id,
             |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             |                         CAST(b.embedding AS DOUBLE[])) AS sim
             |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
             |WHERE a.vec_id % 2 = 0
             |ORDER BY a.vec_id""".stripMargin)),

    // Label purity of the exact top-10 neighborhood for sampled query
    // vectors — windowed ranking over a broadcast query set.
    "q_knn_label_purity" -> Q(
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("qid"), col("embedding"),
            col("label").as("qlabel"))
        val topk = Ann.exactTopK(emb, queries.drop("qlabel"),
          "vec_id", "embedding", "qid", k = 10)
        topk.join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
          .join(queries.select(col("qid"), col("qlabel")), Seq("qid"))
          .groupBy(col("qid"))
          .agg(sum(when(col("label") === col("qlabel"), 1L).otherwise(0L))
            .as("same_label"), count(lit(1)).as("n"))
          .orderBy(col("qid"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
             |  FROM embeddings WHERE vec_id % 100 = 0),
             |scored AS (
             |  SELECT q.qid, e.vec_id, q.qlabel, e.label,
             |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS sim
             |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
             |  FROM scored)
             |SELECT qid,
             |  CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS same_label,
             |  count(*) AS n
             |FROM ranked WHERE rn <= 10 GROUP BY qid ORDER BY qid""".stripMargin)),

    // Embedding-cosine near-duplicate detection (the vector analogue of
    // MinHash dedup): planted perturbed copies must surface as pairs.
    // LSH self-join on hyperplane buckets — no cross join. Exactness
    // asserted in AnnSpec; entry is rows-only (LSH not in DuckDB).
    "q_embed_neardup" -> Q(
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val planted = emb.select(col("vec_id"), col("embedding")).unionByName(
          emb.filter(col("vec_id") % 25 === 0).select(
            (col("vec_id") + 100000).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x + lit(0.002f) * ((i * 7 + col("vec_id")) % 5 - 2).cast("float"))
              .as("embedding")))
        // probes=1 here (the bench path); AnnSpec drives probes=2 and
        // asserts full planted recall — single-probe loses nothing for
        // cos≈0.9996 copies but scans 4× fewer candidates.
        graft.vector.Ann.cosineNearDuplicates(
          planted, "vec_id", "embedding", threshold = 0.98, probes = 1)
          .orderBy(col("id_a"), col("id_b"))
      }),

    // IVF-style ANN: centroid assignment + nprobe probing — better on
    // clustered corpora than hyperplane LSH; recall gated in AnnSpec.
    "q_ann_ivf" -> Q(
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("qid"), col("embedding"))
        val centroids = emb.filter(col("vec_id") % 31 === 0)
          .orderBy(col("vec_id")).limit(16) // ordered: deterministic set
          .select(col("vec_id").as("cid"), col("embedding"))
        Ann.ivfTopK(emb, queries, "vec_id", "embedding", "qid",
          k = 5, centroids = centroids, nprobe = 4)
          .select(col("qid"), col("vec_id"), col("rank"))
          .orderBy(col("qid"), col("rank"))
      }),

    // LSH-bucketed ANN (random hyperplanes, multi-probe d≤1): the scale
    // path — candidates from bucket equi-joins, exact re-rank. Recall
    // vs exact top-k is asserted in AnnSpec.
    "q_ann_lsh" -> Q(
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("qid"), col("embedding"))
        Ann.lshTopK(emb, queries, "vec_id", "embedding", "qid",
          k = 5, bits = 8, probes = 1)
          .select(col("qid"), col("vec_id"), col("rank"))
          .orderBy(col("qid"), col("rank"))
      })
  )
}
