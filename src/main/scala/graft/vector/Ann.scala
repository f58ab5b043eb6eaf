package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** Brute-force exact top-k against one literal query vector. */
  def bruteForceTopK(data: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame =
    data.select(col(idCol),
      least(greatest(
        VectorFunctions.dot(VectorFunctions.toDoubleArray(col(vecCol)),
          VectorFunctions.vectorLit(query))
          / (VectorFunctions.norm(VectorFunctions.toDoubleArray(col(vecCol)))
            * math.sqrt(query.map(x => x * x).sum)),
        lit(-1.0)), lit(1.0)).as("sim"))
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

  /** Embedding-cosine near-duplicate pairs — the vector analogue of
    * MinHash dedup: LSH-bucket the corpus once, self-join on bucket
    * (one side probes Hamming-adjacent buckets so near pairs split by
    * one hyperplane still meet), exact-cosine filter, id-ordered
    * distinct pairs. No cross join; cost follows bucket occupancy. */
  def cosineNearDuplicates(data: DataFrame, idCol: String, vecCol: String,
                           threshold: Double = 0.95, bits: Int = 8,
                           probes: Int = 1, dim: Int = 64,
                           seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(bits, dim, seed)
    val bucketed = data.select(col(idCol), col(vecCol),
      bucketOf(col(vecCol), planes).as("bucket"))
    val probed = bucketed.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      explode(probeBuckets(col("bucket"), bits, probes)).as("bucket"))
    probed.join(bucketed.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
        col("bucket")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("va"), col("vb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("cos_sim")).as("cos_sim"))
  }

  /** IVF-style bucketing: assign every vector to its nearest of m
    * deterministic centroid vectors (broadcast), queries probe the
    * `nprobe` nearest centroids. Better recall than LSH on clustered
    * data; same no-cross-join candidate structure. */
  def ivfTopK(data: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, qidCol: String,
              k: Int, centroids: DataFrame, nprobe: Int = 4): DataFrame = {
    val c = centroids.select(col("cid"), col(vecCol).as("cvec"))
    def assign(df: DataFrame, id: Column, keep: Int): DataFrame = {
      val w = Window.partitionBy(id)
        .orderBy(col("csim").desc, col("cid"))
      df.crossJoin(broadcast(c))
        .withColumn("csim", VectorFunctions.cosine(col(vecCol), col("cvec")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("cvec", "csim", "crank")
    }
    val dataAssigned = assign(data, col(idCol), 1)
    val queryAssigned = assign(queries, col(qidCol), nprobe)
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
