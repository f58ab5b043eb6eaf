package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Deterministic distributed k-means (Lloyd) over an embedding column —
  * the trainer that produces [[Ann.ivfTopK]]'s centroids instead of
  * asking the caller to supply them.
  *
  * Every design choice is driven by reproducibility at scale:
  *
  *  - '''Quantized arithmetic.''' Vectors are quantized to integers
  *    (`floor(x·scale)`, the int-embedding practice at serving scale)
  *    carried in doubles. Every dot product, sum and mean then stays on
  *    exact integers below 2^53, so results are bit-identical under ANY
  *    partitioning, parallelism or engine — a float k-means is
  *    sum-order-nondeterministic and can't be oracle-checked.
  *  - '''Map-side assignment.''' Centroids are collected to literals
  *    (k×dim driver-held model state, the same stance MLlib takes) and
  *    the nearest-centroid pick is a pure projection:
  *    `argmin array(struct(dist, cid))` over native `graft_dot` calls —
  *    no join, no window, no shuffle for the corpus side (the
  *    round-2 IVF crossJoin+row_number anti-pattern stays dead).
  *    ‖a−c‖² expands to a·a − 2a·c + c·c with a·a bound ONCE as a named
  *    column (k re-evaluations otherwise — no CSE across Columns).
  *  - '''One shuffle per iteration.''' The centroid update is
  *    posexplode → groupBy(cluster, dim) with map-side partial sums:
  *    what crosses the wire is O(partitions × k × dim), not O(n).
  *  - '''Deterministic seeding.''' Seeds are the k rows with the lowest
  *    salted md5 bucket ([[graft.plans.Splits.bucketOf]]) — stable
  *    across runs and engines, no RNG. A cluster left empty by an
  *    update simply drops out (standard Lloyd hazard, deterministic
  *    here).
  *
  * New-centroid coordinates are `floor(sum/count)`: division of exact
  * integers is correctly rounded, so the floor is deterministic too.
  */
object KMeans {

  /** `floor(x·scale)` per element, carried as exact integers in
    * doubles. */
  def quantize(vec: Column, scale: Int = 1000): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("double"))

  /** Nearest-centroid id for a quantized vector column `e` whose
    * self-dot is pre-bound in `ee` (bind it ONCE in a prior select).
    * Ties break to the lowest centroid id via struct ordering. */
  def assignExpr(e: Column, ee: Column,
                 centroids: Seq[(Long, Seq[Double])]): Column =
    array_min(array(centroids.map { case (cid, c) =>
      val cc = c.map(x => x * x).sum
      struct(
        (ee - lit(2.0) * VectorFunctions.dot(e, VectorFunctions.vectorLit(c))
          + lit(cc)).as("dist"),
        lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** k seed centroids: the rows with the k lowest salted hash buckets
    * (engine-reproducible; the seed's own id becomes the cluster id). */
  def seedCentroids(quantized: DataFrame, idCol: String, k: Int,
                    seed: String = "km"): Seq[(Long, Seq[Double])] =
    quantized
      .orderBy(graft.text.Dedup.md5Hash60(
        concat(lit(s"$seed:"), col(idCol).cast("string"))), col(idCol))
      .limit(k)
      .select(col(idCol), col("__e"))
      .pipe(graft.plans.Materialize.modelState(_, s"k-means seeds (k = $k rows)"))
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toVector)
      .toSeq

  private def updateCentroids(assigned: DataFrame): Seq[(Long, Seq[Double])] =
    assigned
      .select(col("cluster"), posexplode(col("__e")).as(Seq("pos", "v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(floor(sum(col("v")) / count(lit(1))).cast("double").as("m"))
      .pipe(graft.plans.Materialize.modelState(_, "k-means centroid update (k*dim rows)"))
      .groupBy(_.getLong(0))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toVector
      }
      .toSeq
      .sortBy(_._1)

  private def prepared(data: DataFrame, idCol: String, vecCol: String,
                       scale: Int): DataFrame =
    data
      .select(col(idCol), quantize(col(vecCol), scale).as("__e"))
      .withColumn("__ee", VectorFunctions.dot(col("__e"), col("__e")))

  private def trained(q: DataFrame, idCol: String, k: Int, iters: Int,
                      seed: String): Seq[(Long, Seq[Double])] = {
    require(iters >= 1, "need at least one assignment round")
    // the training loop runs one job per round over the same prepared
    // relation — persist it so quantization + the source scan happen
    // once, not once per round (the final assignment a caller
    // materializes later is its own single pass either way)
    val cached = q.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents = seedCentroids(cached, idCol, k, seed)
      for (_ <- 1 until iters)
        cents = updateCentroids(
          cached.withColumn("cluster",
            assignExpr(col("__e"), col("__ee"), cents)))
      cents
    } finally cached.unpersist(false)
  }

  /** Run `iters` assignment rounds (with a centroid update between
    * consecutive rounds) and return the final (id, cluster)
    * assignment. `fitCentroids` exposes the trained model instead. */
  def fit(data: DataFrame, idCol: String, vecCol: String, k: Int,
          iters: Int, scale: Int = 1000, seed: String = "km"): DataFrame = {
    val q = prepared(data, idCol, vecCol, scale)
    val cents = trained(q, idCol, k, iters, seed)
    q.select(col(idCol),
      assignExpr(col("__e"), col("__ee"), cents).cast("int").as("cluster"))
  }

  /** The trained centroids (still quantized) after `iters` rounds —
    * feed these to [[Ann.ivfTopK]]. */
  def fitCentroids(data: DataFrame, idCol: String, vecCol: String, k: Int,
                   iters: Int, scale: Int = 1000,
                   seed: String = "km"): Seq[(Long, Seq[Double])] =
    trained(prepared(data, idCol, vecCol, scale), idCol, k, iters, seed)
}
