package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the vector-COMPRESSION
  * counterpart of [[Quantize]]'s scalar int8 path: the d-dim vector
  * splits into `m` contiguous subvectors and each subspace gets its own
  * k-means codebook, so a vector stores as `m` small code ids
  * (m·log2(ksub) bits ≈ 8 bytes here vs 256 for float32×64) and
  * query-to-code distances resolve through per-subspace LOOKUP TABLES
  * (asymmetric distance computation, ADC) instead of float arithmetic
  * over the corpus.
  *
  * Spark-first layout, reusing [[KMeans]]'s determinism stances:
  *
  *  - '''All m subspaces train together.''' The corpus explodes ONCE
  *    into (id, sub, subvector) and every Lloyd round is one job over
  *    that relation — the per-subspace assignment is a pure projection
  *    (`sub` dispatches through a chained CASE to that subspace's
  *    centroid literals), and the centroid update is a single
  *    groupBy(sub, code, pos) with map-side partial sums. m sequential
  *    [[KMeans.fit]] calls would pay m corpus scans per round for no
  *    extra information.
  *  - '''Quantized exact-integer arithmetic throughout''' (the
  *    [[KMeans.quantize]] grid): every subspace distance is an exact
  *    integer below 2^53, so codes, distortions and ADC rankings are
  *    bit-identical under any partitioning and replayable by the SQL
  *    oracle. Ties break to the lowest code id via struct ordering.
  *  - '''Codebooks are driver-held model state''' (m·ksub·(d/m) ints —
  *    1 KB here, ≤ a few MB at production ksub=256), collected once per
  *    round exactly like [[KMeans]]'s centroid literals.
  *  - '''ADC serving is join + sum, never per-row float math.''' The
  *    query side expands to a (qid, sub, code) → distance relation of
  *    nq·m·ksub rows (tiny; broadcast), the encoded corpus joins it on
  *    (sub, code), and a map-side-combining sum over the m terms per
  *    (qid, id) ranks candidates — the corpus never rereads vectors.
  *
  * Reference scope: the reference framework has no vector ops at all
  * (SURVEY §2) — this is part of the beyond-parity similarity-search
  * family (LSH / IVF / SQ8 / PQ) a 100 TB training-data pipeline needs.
  */
object Pq {

  /** The quantized vector split into `m` contiguous subvectors:
    * one row per (id, sub) with the subvector and its pre-bound
    * self-dot — a single narrow corpus scan, no shuffle. */
  def subvectors(data: DataFrame, idCol: String, vecCol: String,
                 m: Int, dim: Int, scale: Int = 1000): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    data
      .select(col(idCol), KMeans.quantize(col(vecCol), scale).as("__e"))
      .select(col(idCol), posexplode(array((0 until m).map(s =>
        slice(col("__e"), s * dsub + 1, dsub)): _*)).as(Seq("sub", "__sv")))
      .withColumn("__svv", VectorFunctions.dot(col("__sv"), col("__sv")))
  }

  /** Min-distance (dist, code) struct against one subspace's centroid
    * literals — [[KMeans.assignExpr]]'s shape, keeping the distance so
    * encode can emit per-subspace distortion without a second pass. */
  private def minStruct(sv: Column, svv: Column,
                        cents: Seq[(Long, Seq[Double])]): Column =
    array_min(array(cents.map { case (cid, c) =>
      val cc = c.map(x => x * x).sum
      struct(
        (svv - lit(2.0) * VectorFunctions.dot(sv, VectorFunctions.vectorLit(c))
          + lit(cc)).as("dist"),
        lit(cid).as("code"))
    }: _*))

  /** Per-subspace nearest-code struct: `sub` dispatches through a
    * chained CASE to that subspace's codebook literals — all m
    * assignments in ONE projection over the exploded relation. */
  private def assignStruct(sv: Column, svv: Column, sub: Column,
                           books: Seq[(Int, Seq[(Long, Seq[Double])])]): Column =
    books.tail.foldLeft(
      when(sub === books.head._1, minStruct(sv, svv, books.head._2))) {
      case (acc, (s, cents)) => acc.when(sub === s, minStruct(sv, svv, cents))
    }

  /** Train the m codebooks jointly: seeds are the ksub lowest salted-md5
    * rows PER SUBSPACE (`pq:<sub>:<id>`, engine-reproducible; the seed
    * row's id becomes the code id), then `iters` assignment rounds with
    * a grouped centroid update between consecutive rounds — every round
    * is one job over the cached subvector relation.
    *
    * Seed selection rides the native `graft_topk` aggregate (score =
    * −hash so "lowest hash" is "highest score"), NOT a per-subspace
    * window: a window partitioned m ways would funnel corpus×m rows
    * through m sort tasks, while the k-bounded aggregate buffers cut
    * each partition to ≤ ksub rows map-side — the seed pick costs
    * O(ksub·m·partitions) shuffle at any corpus size. */
  def fitCodebooks(data: DataFrame, idCol: String, vecCol: String,
                   m: Int, dim: Int, ksub: Int, iters: Int,
                   scale: Int = 1000, seed: String = "pq")
      : Seq[(Int, Seq[(Long, Seq[Double])])] = {
    require(iters >= 1, "need at least one assignment round")
    val subs = subvectors(data, idCol, vecCol, m, dim, scale)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      subs.count() // eager fill: seeds + every round reread it
      val seedIds = subs
        .select(col("sub"),
          (-graft.text.Dedup.md5Hash60(concat(lit(s"$seed:"),
            col("sub").cast("string"), lit(":"),
            col(idCol).cast("string")))).as("__sc"),
          col(idCol).cast("long").as("__id"))
        .groupBy(col("sub"))
        .agg(call_function("graft_topk", col("__sc"), col("__id"), lit(ksub))
          .as("top"))
        .select(col("sub").as("__ssub"), explode(col("top")).as("e"))
        .select(col("__ssub"), col("e.payload").as("__sid"))
      var books: Seq[(Int, Seq[(Long, Seq[Double])])] = subs
        .join(broadcast(seedIds),
          col("sub") === col("__ssub") && col(idCol) === col("__sid"))
        // cast mirrors seedIds' __id cast: an IntegerType id column is
        // valid API input, and getLong on a raw int would throw here
        .select(col("sub"), col(idCol).cast("long"), col("__sv"))
        .pipe(graft.plans.Materialize.modelState(_, "PQ codebook seeds (m*ksub rows)"))
        .groupBy(_.getInt(0))
        .map { case (sub, rows) =>
          sub -> rows.map(r => r.getLong(1) -> r.getSeq[Double](2).toVector)
            .sortBy(_._1).toSeq
        }
        .toSeq.sortBy(_._1)
      for (_ <- 1 until iters) {
        val assigned = subs.withColumn("__code",
          assignStruct(col("__sv"), col("__svv"), col("sub"), books)
            .getField("code"))
        books = assigned
          .select(col("sub"), col("__code"),
            posexplode(col("__sv")).as(Seq("pos", "v")))
          .groupBy(col("sub"), col("__code"), col("pos"))
          .agg(floor(sum(col("v")) / count(lit(1))).cast("double").as("mval"))
          .pipe(graft.plans.Materialize.modelState(_, "PQ codebook update (m*ksub*dsub rows)"))
          .groupBy(_.getInt(0))
          .map { case (sub, rows) =>
            sub -> rows.groupBy(_.getLong(1)).map { case (code, rs) =>
              code -> rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toVector
            }.toSeq.sortBy(_._1)
          }
          .toSeq.sortBy(_._1)
      }
      books
    } finally subs.unpersist(false)
  }

  /** Encode the corpus against trained codebooks: (id, sub, code,
    * sdist) — one projection over the exploded relation; `sdist` is the
    * exact-integer subspace distortion (‖sv − codeword‖² on the
    * quantized grid). */
  def encode(data: DataFrame, idCol: String, vecCol: String,
             m: Int, dim: Int, books: Seq[(Int, Seq[(Long, Seq[Double])])],
             scale: Int = 1000): DataFrame =
    subvectors(data, idCol, vecCol, m, dim, scale)
      .withColumn("__a",
        assignStruct(col("__sv"), col("__svv"), col("sub"), books))
      .select(col(idCol), col("sub"), col("__a").getField("code").as("code"),
        col("__a").getField("dist").as("sdist"))

  /** Rebuild the driver-held books structure from a STORED (sub, code,
    * cv) codebook relation — the day-2 ingest path: quantizers are
    * model-sized (m·ksub rows), so collecting them back to literals is
    * the centroid O3 stance, and per-batch encode stays map-side.
    * Rows are sorted (sub, code) for determinism; assignment itself is
    * order-independent (array_min ties break by lowest code). */
  def booksFrom(codebooks: DataFrame): Seq[(Int, Seq[(Long, Seq[Double])])] =
    graft.plans.Materialize.modelState(
      codebooks.select(col("sub"), col("code"), col("cv")),
      "PQ codebook relation (m·ksub rows)", 1 << 14)
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (sub, rows) =>
        (sub, rows.sortBy(_._2).map(t => (t._2, t._3)).toSeq)
      }

  /** The codebooks as a (sub, code, cv) relation for ADC joins. */
  def codebookDf(spark: org.apache.spark.sql.SparkSession,
                 books: Seq[(Int, Seq[(Long, Seq[Double])])]): DataFrame = {
    import spark.implicits._
    books.flatMap { case (sub, cents) =>
      cents.map { case (code, cv) => (sub, code, cv) }
    }.toDF("sub", "code", "cv")
  }

  /** ADC top-k: per query, the k corpus rows with the smallest summed
    * per-subspace code distances. The distance TABLE (query subvector ×
    * codeword, nq·m·ksub rows) broadcasts; the encoded corpus joins it
    * on (sub, code), a map-side-combining sum over the m terms scores
    * each (qid, id) candidate, and the per-query top-k rides the native
    * `graft_topk` aggregate (score = −adc; distances are exact
    * integers, so the long cast is lossless) — candidates reduce to ≤ k
    * per query BEFORE the shuffle, no per-query sort of the corpus. */
  def adcTopK(codes: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, qidCol: String,
              m: Int, dim: Int, books: Seq[(Int, Seq[(Long, Seq[Double])])],
              k: Int, scale: Int = 1000): DataFrame = {
    val dt = distTable(queries, qidCol, vecCol, m, dim, books, scale)
    emitTopK(
      codes.join(broadcast(dt), Seq("sub", "code")), idCol, qidCol, k)
  }

  /** ADC top-k RESTRICTED to a candidate relation (qid, id) — the
    * IVF-PQ composition: the coarse quantizer routes candidates
    * ([[Ann.ivfCandidates]]), and only their code rows pay the lookup
    * sum. The candidate join is a plain id equi-join (at 100 TB the
    * candidate set is nq·(n/cells)·nprobe — never broadcastable), the
    * lookup table still broadcasts, and scoring cost drops from the
    * full corpus to the probed fraction. */
  def adcTopKWithin(codes: DataFrame, cands: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, qidCol: String,
                    m: Int, dim: Int,
                    books: Seq[(Int, Seq[(Long, Seq[Double])])],
                    k: Int, scale: Int = 1000): DataFrame = {
    val dt = distTable(queries, qidCol, vecCol, m, dim, books, scale)
    emitTopK(
      // duplicate (qid, id) candidate rows would multiply each subspace
      // term and inflate the summed ADC distance, so the candidate
      // relation is deduped here rather than trusting the producer —
      // the dedup shuffle lands on the same (qid, id) keys the scoring
      // groupBy shuffles on anyway, so at scale it costs one exchange
      // over the probed fraction, not the corpus
      codes.join(cands.select(col(qidCol), col(idCol)).dropDuplicates(
          qidCol, idCol), Seq(idCol))
        .join(broadcast(dt), Seq(qidCol, "sub", "code")),
      idCol, qidCol, k)
  }

  /** ADC top-k within candidates, served from a STORED codebook
    * relation (sub, code, cv) instead of driver-held book literals —
    * the persisted-index serve path: train once, land [[codebookDf]]
    * and the encoded corpus in stage tables, and let every query batch
    * run this with NO training lineage in its plan (codebooks arrive
    * through a broadcast scan of the stage table, codes through the
    * candidate equi-join). Identical results to [[adcTopKWithin]] over
    * the same books — the relation only memoizes the codebook rows. */
  def adcTopKWithinIndexed(codes: DataFrame, cands: DataFrame,
                           queries: DataFrame, idCol: String, vecCol: String,
                           qidCol: String, m: Int, dim: Int,
                           codebooks: DataFrame, k: Int,
                           scale: Int = 1000): DataFrame = {
    val dt = distTableFrom(queries, qidCol, vecCol, m, dim, codebooks, scale)
    emitTopK(
      codes.join(cands.select(col(qidCol), col(idCol)).dropDuplicates(
          qidCol, idCol), Seq(idCol))
        .join(broadcast(dt), Seq(qidCol, "sub", "code")),
      idCol, qidCol, k)
  }

  /** The per-query lookup table: (qid, sub, code) → exact-integer
    * distance, nq·m·ksub rows. */
  private def distTable(queries: DataFrame, qidCol: String, vecCol: String,
                        m: Int, dim: Int,
                        books: Seq[(Int, Seq[(Long, Seq[Double])])],
                        scale: Int): DataFrame =
    distTableFrom(queries, qidCol, vecCol, m, dim,
      codebookDf(queries.sparkSession, books), scale)

  /** [[distTable]] against an arbitrary (sub, code, cv) relation —
    * shared by the literal-books and stage-table serve paths. The
    * quantized grid stores exact integers in doubles, so a parquet
    * round-trip of cv changes nothing. */
  private def distTableFrom(queries: DataFrame, qidCol: String,
                            vecCol: String, m: Int, dim: Int,
                            codebooks: DataFrame, scale: Int): DataFrame =
    subvectors(queries, qidCol, vecCol, m, dim, scale)
      .join(broadcast(codebooks), Seq("sub"))
      .select(col(qidCol), col("sub"), col("code"),
        (col("__svv") - lit(2.0) * VectorFunctions.dot(col("__sv"), col("cv"))
          + VectorFunctions.dot(col("cv"), col("cv"))).as("qdist"))

  /** Sum the m lookup terms per (qid, id) and keep the per-query top-k
    * via graft_topk — map-side combining all the way, no sort. */
  private def emitTopK(joined: DataFrame, idCol: String, qidCol: String,
                       k: Int): DataFrame =
    joined
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("qdist")).cast("long").as("adc"))
      .groupBy(col(qidCol))
      .agg(call_function("graft_topk", -col("adc"), col(idCol).cast("long"),
        lit(k)).as("top"))
      .select(col(qidCol), posexplode(col("top")))
      .select(col(qidCol), (col("pos") + 1).as("rank"),
        col("col.payload").as(idCol), (-col("col.score")).as("adc"))
}
