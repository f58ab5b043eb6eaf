package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.vector.{Ann, KMeans}

/** K-means guarantees the q_kmeans oracle can't check: determinism
  * under repartitioning, recovery of planted cluster structure, and the
  * trained-centroids → IVF search integration. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 16

  /** ids 0..29 in three well-separated blobs. Blob membership is the
    * id's rank in KMeans' own seed-hash order mod 3, so the 3
    * lowest-hash ids (= the chosen seeds at k=3) provably land in three
    * DIFFERENT blobs and Lloyd must recover the planted partition. */
  private lazy val (blobs, planted) = {
    import spark.implicits._
    val ids = (0L until 30L).toDF("id")
    val ranked = ids
      .withColumn("h", graft.text.Dedup.md5Hash60(
        concat(lit("km:"), col("id").cast("string"))))
      .orderBy(col("h"), col("id"))
      .select(col("id")).collect().map(_.getLong(0))
    val blobOf = ranked.zipWithIndex.map { case (id, r) => id -> r % 3 }.toMap
    val rows = (0L until 30L).map { id =>
      val b = blobOf(id)
      val v = Array.tabulate(dim)(d =>
        b * 10.0 + (if (d == (id % dim).toInt) 0.1 else 0.0))
      (id, v.toSeq)
    }
    (blobOf, rows.toDF("id", "vec"))
  }

  test("planted blobs: 3 rounds recover the exact partition") {
    val out = KMeans.fit(planted, "id", "vec", k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // same blob -> same cluster, different blob -> different cluster
    val byBlob = out.groupBy { case (id, _) => blobs(id) }
      .map { case (b, m) => b -> m.values.toSet }
    assert(byBlob.values.forall(_.size == 1), byBlob)
    assert(byBlob.values.flatten.toSet.size == 3, byBlob)
  }

  test("assignment is identical under repartitioning") {
    val a = KMeans.fit(planted, "id", "vec", k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = KMeans.fit(planted.repartition(7), "id", "vec", k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("trained centroids drive ivfTopK (cosine is scale-invariant)") {
    import spark.implicits._
    val sf = TestSpark.sf
    val emb = Tables.load(spark, sf, "embeddings")
    val cents = KMeans.fitCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(cents.size == 8 && cents.forall(_._2.size == 64))
    // quantized centroids are ~1000x the raw scale; IVF assigns by
    // cosine, which is scale-invariant, so they feed straight in
    val centDf = cents.toDF("cid", "embedding")
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val hits = Ann.ivfTopK(emb, queries, "vec_id", "embedding", "qid",
      k = 5, centroids = centDf, nprobe = 3)
    val n = hits.groupBy(col("qid")).count().collect()
    assert(n.nonEmpty && n.forall(_.getLong(1) == 5L), n.mkString(","))
  }
}
