package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.vector.Pq

/** Product-quantization gates on the real embeddings table: codebook
  * shape, encode determinism under repartitioning, ADC agreement with a
  * direct reconstruction-based computation, compression honesty
  * (distortion strictly below the zero-codebook baseline), and the
  * no-window plan shape of the serve path. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val M = 8
  private val DIM = 64
  private val KSUB = 16

  private lazy val emb =
    Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
  private lazy val books =
    Pq.fitCodebooks(emb, "vec_id", "embedding", M, DIM, KSUB, iters = 2)

  test("codebooks: m subspaces, ≤ ksub codes each, d/m dims per codeword") {
    assert(books.map(_._1) == (0 until M))
    books.foreach { case (_, cents) =>
      assert(cents.nonEmpty && cents.size <= KSUB)
      cents.foreach { case (_, cv) => assert(cv.size == DIM / M) }
      // quantized-grid coordinates are exact integers carried in doubles
      cents.foreach { case (_, cv) => cv.foreach(x => assert(x == x.floor)) }
    }
  }

  test("encode is deterministic under repartitioning and covers every id") {
    val a = Pq.encode(emb, "vec_id", "embedding", M, DIM, books)
    val b = Pq.encode(emb.repartition(13), "vec_id", "embedding", M, DIM, books)
    assert(a.count() == emb.count() * M)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("ADC top-k equals the reconstruction-based ranking") {
    val codes = Pq.encode(emb, "vec_id", "embedding", M, DIM, books)
      .select(col("vec_id"), col("sub"), col("code"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val got = Pq.adcTopK(codes, queries, "vec_id", "embedding", "qid",
      M, DIM, books, k = 5)
      .select(col("qid"), col("vec_id"), col("rank").cast("int").as("rank"),
        col("adc"))
    // reference: join every (qid, sub) query subvector to the ASSIGNED
    // codeword of every corpus row and rank the summed exact distances
    // with a plain window — the declarative form adcTopK must equal
    val bookDf = Pq.codebookDf(spark, books)
    val qs = Pq.subvectors(queries, "qid", "embedding", M, DIM)
    val ref = qs
      .join(codes.join(bookDf, Seq("sub", "code")), Seq("sub"))
      .select(col("qid"), col("vec_id"),
        (col("__svv")
          - lit(2.0) * graft.vector.VectorFunctions.dot(col("__sv"), col("cv"))
          + graft.vector.VectorFunctions.dot(col("cv"), col("cv"))).as("d"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d")).cast("long").as("adc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc").asc, col("vec_id").asc)
    val refTop = ref.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("vec_id"), col("rank"), col("adc"))
    assert(got.exceptAll(refTop).isEmpty && refTop.exceptAll(got).isEmpty)
  }

  test("training reduces distortion: 2-round codebooks beat the seed round") {
    def distortion(bs: Seq[(Int, Seq[(Long, Seq[Double])])]): Double =
      Pq.encode(emb, "vec_id", "embedding", M, DIM, bs)
        .agg(sum(col("sdist"))).head().getDouble(0)
    val seedOnly =
      Pq.fitCodebooks(emb, "vec_id", "embedding", M, DIM, KSUB, iters = 1)
    assert(distortion(books) < distortion(seedOnly))
  }

  test("adcTopKWithin over the full candidate set equals adcTopK") {
    val codes = Pq.encode(emb, "vec_id", "embedding", M, DIM, books)
      .select(col("vec_id"), col("sub"), col("code"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val full = Pq.adcTopK(codes, queries, "vec_id", "embedding", "qid",
      M, DIM, books, k = 5)
    // candidates = every (qid, id) pair — the restriction must vanish
    val allCands = queries.select(col("qid"))
      .crossJoin(emb.select(col("vec_id")))
    val within = Pq.adcTopKWithin(codes, allCands, queries,
      "vec_id", "embedding", "qid", M, DIM, books, k = 5)
    assert(full.exceptAll(within).isEmpty && within.exceptAll(full).isEmpty)
  }

  test("staged serve equals literal-books serve after a parquet round-trip") {
    // adcTopKWithinIndexed consumes the codebooks as a stage-table
    // relation; the quantized grid stores exact integers in doubles, so
    // a parquet round-trip must change nothing vs the driver-held books
    val codes = Pq.encode(emb, "vec_id", "embedding", M, DIM, books)
      .select(col("vec_id"), col("sub"), col("code"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val cands = queries.select(col("qid"))
      .crossJoin(emb.select(col("vec_id")).filter(col("vec_id") % 3 === 0))
    val tmp = java.nio.file.Files.createTempDirectory("pq-books").toString
    Pq.codebookDf(spark, books).write.mode("overwrite").parquet(tmp)
    val staged = Pq.adcTopKWithinIndexed(codes, cands, queries,
      "vec_id", "embedding", "qid", M, DIM, spark.read.parquet(tmp), k = 5)
    val direct = Pq.adcTopKWithin(codes, cands, queries,
      "vec_id", "embedding", "qid", M, DIM, books, k = 5)
    assert(staged.exceptAll(direct).isEmpty && direct.exceptAll(staged).isEmpty)
  }

  test("duplicate candidate rows cannot inflate ADC distances") {
    // the candidate relation is deduped internally: a producer emitting
    // (qid, id) twice must not double each subspace term
    val codes = Pq.encode(emb, "vec_id", "embedding", M, DIM, books)
      .select(col("vec_id"), col("sub"), col("code"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val cands = queries.select(col("qid"))
      .crossJoin(emb.select(col("vec_id")).filter(col("vec_id") % 3 === 0))
    val once = Pq.adcTopKWithin(codes, cands, queries,
      "vec_id", "embedding", "qid", M, DIM, books, k = 5)
    val doubled = Pq.adcTopKWithin(codes, cands.unionAll(cands), queries,
      "vec_id", "embedding", "qid", M, DIM, books, k = 5)
    assert(once.exceptAll(doubled).isEmpty && doubled.exceptAll(once).isEmpty)
  }

  test("ivf candidates: every id comes from a probed cell, self excluded") {
    val cents = graft.vector.KMeans.fitCentroids(
      emb, "vec_id", "embedding", k = 16, iters = 2)
    import spark.implicits._
    val centroids = cents.toDF("cid", "embedding")
    val assign = graft.vector.Ann.ivfAssign(emb, "vec_id", "embedding",
      centroids)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val cands = graft.vector.Ann.ivfCandidates(assign, queries,
      "vec_id", "qid", "embedding", centroids, nprobe = 4)
    assert(cands.filter(col("vec_id") === col("qid")).isEmpty)
    // probed fraction: 4 of 16 cells — candidates must be well under
    // the full corpus per query (the point of the coarse quantizer)
    val perQuery = cands.groupBy(col("qid")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(perQuery < emb.count(), s"candidates not restricted: $perQuery")
  }

  test("serve plan: ADC search carries no Window and no vector reread") {
    val codes = Pq.encode(emb, "vec_id", "embedding", M, DIM, books)
      .select(col("vec_id"), col("sub"), col("code"))
      .transform(graft.plans.Materialize.stage)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val plan = Pq.adcTopK(codes, queries, "vec_id", "embedding", "qid",
      M, DIM, books, k = 5).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("graft_topk"), plan)
  }
}
