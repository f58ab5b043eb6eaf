package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Approximate nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (one narrow pass, TakeOrdered —
  * correct at any scale but O(n) per query). Scale path: random-
  * hyperplane LSH — each vector hashes to a small integer bucket from
  * the signs of `bits` fixed random projections; a query probes its own
  * bucket plus all buckets within Hamming distance `probes`, re-ranks
  * candidates exactly, and returns top-k. Candidates come from an
  * equi-join on the bucket id (shuffle-partitioned, broadcastable query
  * side) — never a cross join against the full corpus.
  *
  * Hyperplanes are generated from a fixed seed so results are
  * deterministic and plans are reusable across queries.
  */
object Ann {

  /** Deterministic random hyperplanes: `bits` × `dim` doubles. */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Bucket id of a vector: bit j set iff dot(v, plane_j) >= 0. */
  def bucketOf(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val vd = VectorFunctions.toDoubleArray(vec)
    planes.zipWithIndex.map { case (p, j) =>
      when(VectorFunctions.dot(vd, VectorFunctions.vectorLit(p)) >= 0,
        lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** All bucket ids within Hamming distance `probes` of `bucket`
    * (multi-probe LSH: d=1 flips one bit, d=2 flips two). */
  def probeBuckets(bucket: Column, bits: Int, probes: Int): Column = {
    val self = array(bucket)
    val d1 =
      if (probes < 1) array()
      else array((0 until bits).map(j => bucket.bitwiseXOR(lit(1 << j))): _*)
    val d2 =
      if (probes < 2) array()
      else array((for (i <- 0 until bits; j <- i + 1 until bits)
        yield bucket.bitwiseXOR(lit((1 << i) | (1 << j)))): _*)
    concat(self, d1, d2)
  }

  /** Brute-force exact top-k against one literal query vector. The
    * native cosine yields NaN for a zero-norm row (an explicit Column
    * division would throw DIVIDE_BY_ZERO under ANSI mode); NaN rows are
    * dropped — a direction-less vector has no defined rank. */
  def bruteForceTopK(data: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame =
    data.select(col(idCol),
      VectorFunctions.cosine(col(vecCol), VectorFunctions.vectorLit(query))
        .as("sim"))
      .filter(!isnan(col("sim")))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** LSH-bucketed ANN: for every query row, top-k nearest data rows.
    *
    * @param data    (id, vec) corpus
    * @param queries (qid, vec) query set (small relative to data — its
    *                exploded probe list is broadcast)
    */
  def lshTopK(data: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, qidCol: String,
              k: Int, bits: Int = 8, probes: Int = 1,
              dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(bits, dim, seed)
    val bucketed = data.select(col(idCol), col(vecCol),
      bucketOf(col(vecCol), planes).as("bucket"))
    val qprobed = queries.select(col(qidCol), col(vecCol).as("qvec"),
      explode(probeBuckets(bucketOf(col(vecCol), planes), bits, probes))
        .as("bucket"))
    val candidates = bucketed.join(broadcast(qprobed), Seq("bucket"))
      .filter(col(idCol) =!= col(qidCol))
      .select(col(qidCol), col(idCol),
        VectorFunctions.cosine(col(vecCol), col("qvec")).as("sim"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Exact per-query top-k (the recall oracle for lshTopK): equi-less
    * join restricted to a broadcast query set, then windowed top-k. */
  def exactTopK(data: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, qidCol: String,
                k: Int): DataFrame = {
    val q = queries.select(col(qidCol), col(vecCol).as("qvec"))
    val scored = data.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col(qidCol))
      .select(col(qidCol), col(idCol),
        VectorFunctions.cosine(col(vecCol), col("qvec")).as("sim"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Two-stage SQ8 retrieval: int8 coarse scan, exact float rerank —
    * the memory-bandwidth play for a flat scan over a 100 TB float32
    * corpus. Stage 1 ranks candidates on the integer dot product of the
    * [[Quantize.int8]] codes (4× less data read than float32, and the
    * int accumulation is exact, so the coarse ranking is deterministic
    * on every engine); per-query scale is constant so only the
    * CORPUS-side scale correction `iscore / dscale` matters for rank
    * order. Stage 2 recomputes true float cosine for the top-`coarseK`
    * survivors only and reranks. coarseK ≫ k absorbs quantization rank
    * noise (coarseK/k = 5 keeps recall ≈ 1 at int8 precision).
    *
    * The coarse stage is a deliberate flat scan (same stance as
    * [[exactTopK]]: broadcast query side, narrow int codes, no shuffle
    * of the corpus) — for sub-linear candidate generation feed the
    * probed cells of [[ivfTopK]] as `data` instead; the rerank
    * machinery is unchanged. */
  def sq8RerankTopK(data: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, qidCol: String,
                    k: Int, coarseK: Int = 50): DataFrame = {
    val dq = Quantize.int8(data.select(col(idCol), col(vecCol)),
      vecCol, "dscale", "dq")
    val qq = Quantize.int8(
      queries.select(col(qidCol), col(vecCol).as("qvec")),
      "qvec", "qscale", "qq")
    val scored = dq.crossJoin(broadcast(qq))
      .filter(col(idCol) =!= col(qidCol))
      .select(col(qidCol), col(idCol), col(vecCol), col("qvec"),
        when(col("dscale") > 0,
          aggregate(zip_with(col("dq"), col("qq"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x) / col("dscale"))
          .otherwise(lit(Double.MinValue)).as("cscore"))
    val wc = Window.partitionBy(col(qidCol))
      .orderBy(col("cscore").desc, col(idCol))
    val cands = scored.withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= coarseK)
    val wr = Window.partitionBy(col(qidCol))
      .orderBy(col("sim").desc, col(idCol))
    cands.select(col(qidCol), col(idCol),
        VectorFunctions.cosine(col(vecCol), col("qvec")).as("sim"))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
  }

  /** Buckets needed so expected occupancy stays near `targetOccupancy`
    * as the corpus grows: bits = ⌈log2(n / occupancy)⌉, clamped to
    * [4, 24]. A fixed bucket count makes the LSH self-join's per-bucket
    * quadratic cost grow linearly with n; scaling bits with log2(n)
    * keeps it flat.
    *
    * Integer-only derivation (⌈log2⌈n/occ⌉⌉ — identical to the float
    * form for every n, since no integer lies strictly between x and
    * ⌈x⌉): a DuckDB oracle re-derives the same value from `count(*)`
    * with integer ops, where `ceil(log(x)/log(2))` on doubles can land
    * one off near exact powers of two. */
  def bitsFor(n: Long, targetOccupancy: Int = 16): Int = {
    val m = (math.max(n, 1L) + targetOccupancy - 1) / targetOccupancy
    val raw = if (m <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.min(24, math.max(4, raw))
  }

  /** Embedding-cosine near-duplicate pairs — the vector analogue of
    * MinHash dedup: LSH-bucket the corpus once, self-join on bucket
    * (the probe side explodes Hamming-adjacent buckets so near pairs
    * split by one hyperplane still meet), score the exact cosine inside
    * the join, keep pairs over the threshold. No cross join; cost
    * follows bucket occupancy, and `bits <= 0` derives the bucket count
    * from the corpus size via [[bitsFor]] so occupancy stays flat as n
    * grows.
    *
    * No pair-dedup stage is needed: the BUILD side carries each row's
    * single bucket, so an ordered pair (a, b) can meet at most once —
    * exactly when bucket(b) is in a's probe list (the probe list is
    * duplicate-free). Routing the candidates through a distinct + two
    * vector re-joins instead costs three extra shuffles of the
    * candidate set for zero saved cosines (measured 6× slower at
    * sf0.1). */
  def cosineNearDuplicates(data: DataFrame, idCol: String, vecCol: String,
                           threshold: Double = 0.95, bits: Int = 0,
                           probes: Int = 1, dim: Int = 64,
                           seed: Long = 42L, n: Long = 0L): DataFrame = {
    // `n` (approximate corpus size) spares the derivation count() — a
    // full extra pass over the corpus before the real job. bitsFor only
    // needs log2(n), so a footer/metadata estimate is plenty.
    val b = if (bits > 0) bits else bitsFor(if (n > 0) n else data.count())
    val planes = hyperplanes(b, dim, seed)
    // Normalize ONCE per row (bound through named columns so the HOF
    // lambdas don't re-evaluate): each bucket meeting then pays a
    // single dot product — cosine(a,b) = dot(a/|a|, b/|b|) — instead of
    // a dot plus two norms plus two double-casts. The meeting count is
    // O(n·occupancy), so per-meeting cost dominates this operator.
    val normed = data
      .withColumn("__vd", VectorFunctions.toDoubleArray(col(vecCol)))
      .withColumn("__vn", VectorFunctions.norm(col("__vd")))
      // drop zero-norm (and NaN-norm) rows BEFORE the division — under
      // ANSI mode x / 0.0 throws, and a direction-less vector cannot be
      // a near-duplicate of anything
      .filter(col("__vn") > 0)
      .withColumn("__nv", transform(col("__vd"), x => x / col("__vn")))
      .select(col(idCol), col("__nv"))
    val bucketed = normed.select(col(idCol), col("__nv"),
      bucketOf(col("__nv"), planes).as("bucket")) // signs invariant to scaling
    val probed = bucketed.select(col(idCol).as("id_a"), col("__nv").as("nva"),
      explode(probeBuckets(col("bucket"), b, probes)).as("bucket"))
    probed
      .join(bucketed.select(col(idCol).as("id_b"), col("__nv").as("nvb"),
        col("bucket")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        least(greatest(VectorFunctions.dot(col("nva"), col("nvb")),
          lit(-1.0)), lit(1.0)).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** IVF-style bucketing: assign every vector to its nearest of m
    * deterministic centroid vectors, queries probe the `nprobe` nearest
    * centroids. Better recall than LSH on clustered data; same
    * no-cross-join candidate structure.
    *
    * The centroid set is tiny and deterministic by construction, so it
    * is collected once to the driver (a documented O3 scalar fetch) and
    * the nearest-centroid assignment becomes a pure MAP-SIDE argmax
    * over centroid literals — like [[bucketOf]], zero join/shuffle for
    * the corpus side. (The round-2 crossJoin+window version shuffled an
    * m×-expanded corpus just to pick each row's argmax.) */
  def ivfTopK(data: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, qidCol: String,
              k: Int, centroids: DataFrame, nprobe: Int = 4): DataFrame = {
    val cents = centroidSeq(centroids, vecCol)
    val dataAssigned = withProbes(data, vecCol, cents, 1)
    serveIvf(dataAssigned, queries, idCol, vecCol, qidCol, k, cents, nprobe)
  }

  /** Per-row nearest-centroid assignment — the IVF INDEX relation:
    * (id, cid), ~12 bytes a row at any corpus size. At 100 TB the
    * index is built ONCE (this map-side argmax pass) and stored to a
    * stage table, then served many times by [[ivfTopKIndexed]] —
    * re-training centroids per query batch (what [[ivfTopK]] callers
    * do implicitly) re-reads the whole corpus each time. Zero-norm
    * rows are absent from the index (they have no direction and can
    * never be a cosine candidate). */
  def ivfAssign(data: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame): DataFrame =
    withProbes(data.select(col(idCol), col(vecCol)), vecCol,
      centroidSeq(centroids, vecCol), 1)
      .select(col(idCol), col("cid"))

  /** Top-k from a PREBUILT assignment index — the serve path: the
    * stored (id, cid) relation routes candidates, vectors come from
    * the corpus via the id equi-join (at scale both sides bucketed by
    * id, so the join is co-located), and only the probed cells' rows
    * are ever scored. Results are identical to [[ivfTopK]] over the
    * same centroids — the index only memoizes the assignment pass. */
  def ivfTopKIndexed(data: DataFrame, assign: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, qidCol: String,
                     k: Int, centroids: DataFrame, nprobe: Int = 4): DataFrame = {
    val cents = centroidSeq(centroids, vecCol)
    val dataAssigned = data.select(col(idCol), col(vecCol))
      .join(assign.select(col(idCol), col("cid")), Seq(idCol))
    serveIvf(dataAssigned, queries, idCol, vecCol, qidCol, k, cents, nprobe)
  }

  /** IVF candidate routing WITHOUT the scoring stage: per query, the
    * ids in its `nprobe` nearest cells (self excluded) — the candidate
    * feed for a downstream scorer that is not plain cosine (PQ-ADC,
    * a learned reranker). The probed query side is nq·nprobe rows and
    * broadcasts; the stored assignment relation routes by cell id, so
    * the corpus is never scanned here at all. */
  def ivfCandidates(assign: DataFrame, queries: DataFrame, idCol: String,
                    qidCol: String, vecCol: String, centroids: DataFrame,
                    nprobe: Int = 4): DataFrame = {
    val cents = centroidSeq(centroids, vecCol)
    assign.select(col(idCol), col("cid"))
      .join(broadcast(
        withProbes(queries.select(col(qidCol), col(vecCol)), vecCol,
          cents, nprobe)
          .select(col(qidCol), col("cid"))), Seq("cid"))
      .filter(col(idCol) =!= col(qidCol))
      .select(col(qidCol), col(idCol))
  }

  /** The centroid set is tiny and deterministic by construction, so it
    * is collected once to the driver (a documented O3 scalar fetch). */
  private def centroidSeq(centroids: DataFrame,
                          vecCol: String): Seq[(Any, Seq[Double])] =
    centroids
      .select(col("cid"), VectorFunctions.toDoubleArray(col(vecCol)))
      .pipe(graft.plans.Materialize.modelState(_, "IVF probe centroids (k rows)"))
      .toSeq
      .map(r => (r.get(0), r.getSeq[Double](1)))
      // a zero-norm centroid has no direction to probe toward, and its
      // cnorm would turn the scoring division into an ANSI
      // DIVIDE_BY_ZERO — drop it from the centroid set
      .filter { case (_, cv) => cv.map(x => x * x).sum > 0 }

  /** Probe list of the `keep` nearest centroids as a pure projection:
    * the vector's double form and norm are bound through NAMED columns
    * (evaluated once per row), each centroid costs one dot product,
    * and sort_array over (negated sim, cid) structs yields the
    * sim-desc / cid-asc order with no window and no shuffle. The
    * division mirrors cosine()'s dot/(norm*norm) association so sims
    * stay bit-identical to VectorFunctions.cosine. */
  private def withProbes(df: DataFrame, vecCol: String,
                         cents: Seq[(Any, Seq[Double])],
                         keep: Int): DataFrame = {
    val scored = cents.map { case (cid, cv) =>
      val cnorm = math.sqrt(cv.map(x => x * x).sum)
      struct(
        (-(VectorFunctions.dot(col("__vd"), VectorFunctions.vectorLit(cv))
          / (col("__vnorm") * lit(cnorm)))).as("negsim"),
        lit(cid).as("cid"))
    }
    df.withColumn("__vd", VectorFunctions.toDoubleArray(col(vecCol)))
      .withColumn("__vnorm", VectorFunctions.norm(col("__vd")))
      // zero-norm rows cannot be assigned (ANSI: the division throws)
      .filter(col("__vnorm") > 0)
      .withColumn("cid",
        explode(transform(slice(sort_array(array(scored: _*)), 1, keep),
          s => s("cid"))))
      .drop("__vd", "__vnorm")
  }

  /** Candidate join + exact re-rank shared by the inline and indexed
    * IVF paths: probe the query side, equi-join on the cell id against
    * the assigned corpus (broadcast query side — never a cross join),
    * score the true cosine, window-rank per query. */
  private def serveIvf(dataAssigned: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String, qidCol: String,
                       k: Int, cents: Seq[(Any, Seq[Double])],
                       nprobe: Int): DataFrame = {
    val queryAssigned = withProbes(queries, vecCol, cents, nprobe)
      .withColumnRenamed(vecCol, "qvec")
    val candidates = dataAssigned
      .join(broadcast(queryAssigned.select(col(qidCol), col("qvec"), col("cid"))),
        Seq("cid"))
      .filter(col(idCol) =!= col(qidCol))
      .select(col(qidCol), col(idCol),
        VectorFunctions.cosine(col(vecCol), col("qvec")).as("sim"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol))
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
