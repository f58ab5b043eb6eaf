package graft.vector

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.ParquetTable

/** GENERATIONS of a persisted multi-relation index with an atomic
  * current-generation pointer — the machinery that makes a retrain SWAP
  * atomic across all four IVF-PQ relations at once.
  *
  * [[graft.catalog.ParquetTable.overwrite]]'s stage-then-rename is
  * atomic per TABLE; a retrain rewrites FOUR tables (centroids, assign,
  * codebooks, codes), and four independent swaps have three crash
  * windows in which a reader would see new centroids beside old codes —
  * a half-swapped index that is silently WRONG (candidates routed by
  * one quantizer, scored by another). Generations close every window:
  * a rebuild writes all four relations under a fresh `g<N>` directory
  * that no reader resolves, and the single atomic rename of the
  * `_current` pointer file publishes them together. A crash anywhere
  * before the flip leaves the pointer — and therefore every serve — on
  * the complete OLD generation; the half-built directory is simply
  * overwritten by the next attempt (the pointer never moved, so the
  * next attempt gets the same generation number). A crash after the
  * flip leaves the superseded directory behind; the next [[publish]]
  * sweeps it. This is Delta's commit-pointer pattern applied to a
  * directory of stage tables.
  *
  * The pointer write goes through Hadoop `FileContext.rename` with
  * `Options.Rename.OVERWRITE` — atomic POSIX/HDFS rename semantics, and
  * resolved through the FileSystem API so an `hdfs://`/`s3a://` root
  * works the same as a local path (the
  * [[graft.streaming.UpsertSink]] epoch-file stance). */
final class GenerationalIndex(val spark: SparkSession, val root: String) {

  private def ptr = new HPath(root, "_current")
  private def fs = ptr.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The published generation number, if any generation has ever been
    * published. */
  def currentGen(): Option[Long] = {
    val f = fs
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.toLong)
      finally in.close()
    }
  }

  /** Directory of generation `g` (published or under construction). */
  def genDir(g: Long): String = s"$root/g$g"

  /** Directory every reader should serve from right now. */
  def currentDir(): String = {
    val g = currentGen().getOrElse(
      throw new IllegalStateException(s"no published generation under $root"))
    genDir(g)
  }

  /** The generation number a rebuild should write into: one past the
    * published generation (or 0 on a fresh root). A crashed unpublished
    * attempt left the pointer untouched, so the retry lands on the SAME
    * number and overwrites the debris. */
  def nextGen(): Long = currentGen().fold(0L)(_ + 1)

  /** Atomically flip the pointer to generation `g`, then sweep every
    * other generation directory (superseded data, or debris from a
    * crash between a previous flip and its sweep) AND any
    * `_current.tmp-*` pointer file a crash between create and rename
    * left behind (each attempt uses a fresh UUID, so without the sweep
    * the debris would accumulate across retrains forever). */
  def publish(g: Long): Unit = {
    val f = fs
    f.mkdirs(new HPath(root))
    val tmp = new HPath(root,
      s"_current.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(g.toString.getBytes("UTF-8"))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(ptr.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    f.listStatus(new HPath(root)).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("g") && n != s"g$g")
        f.delete(st.getPath, true)
      else if (st.isFile && n.startsWith("_current.tmp-"))
        f.delete(st.getPath, false)
    }
  }
}

/** The machinery that CONSUMES `q_ann_index_health`'s per-cell retrain
  * decision — the loop the r13 monitor left open: when cells drift,
  * actually retrain the quantizers, re-encode, swap atomically, serve.
  *
  * The decision stays a COLUMN OF A RELATION (the
  * [[graft.orchestrate.RunDecision]] stance): [[retrainIfDrifted]]
  * reads the stored decision table (k-bounded — one row per cell) and
  * acts on it; no operator eyeballs a dashboard. Retraining itself is
  * the one-shot index build ([[buildGeneration]] — the
  * q_ann_ivfpq_stage build parameterized by the training population)
  * pointed at the CURRENT population: the held-out reference window
  * plus the drifted arrival window, i.e. what the index actually
  * serves now, not the historical corpus the stale quantizers came
  * from.
  *
  * Scale shape: the decision fetch is k rows; training is the standard
  * quantized k-means / grouped-Lloyd passes over the training
  * population; re-encoding is one map-side pass over the corpus
  * (broadcast model, the q_ann_index_insert shape); the swap is a
  * metadata-only pointer rename. Serving NEVER blocks: every query
  * batch that arrives during the rebuild resolves the pointer to the
  * complete old generation (AnnSpec injects a crash between the stage
  * writes and proves the old index serves, never a half-swapped mix). */
object IndexRetrain {

  /** Train quantizers on `trainPop` and encode `corpus`, landing all
    * four IVF-PQ index relations under `dir` (NOT yet visible to any
    * reader — callers publish via [[GenerationalIndex.publish]]).
    * `interrupt` is the failure-injection seam, called with 1..4 after
    * each relation lands (the crash-between-swap-steps spec throws
    * there). */
  def buildGeneration(spark: SparkSession, dir: String,
                      trainPop: DataFrame, corpus: DataFrame,
                      idCol: String, vecCol: String,
                      k: Int = 16, m: Int = 8, dim: Int = 64,
                      ksub: Int = 16, iters: Int = 2,
                      interrupt: Int => Unit = _ => ()): Unit = {
    import spark.implicits._
    val centroids = KMeans.fitCentroids(trainPop, idCol, vecCol, k, iters)
      .toDF("cid", vecCol)
    ParquetTable(spark, "gen_centroids", s"$dir/centroids",
      centroids.schema).overwrite(centroids)
    interrupt(1)
    val assign = Ann.ivfAssign(corpus, idCol, vecCol, centroids)
    ParquetTable(spark, "gen_assign", s"$dir/assign", assign.schema)
      .overwrite(assign)
    interrupt(2)
    val books = Pq.fitCodebooks(trainPop, idCol, vecCol, m, dim, ksub, iters)
    val bookDf = Pq.codebookDf(spark, books)
    ParquetTable(spark, "gen_codebooks", s"$dir/codebooks", bookDf.schema)
      .overwrite(bookDf)
    interrupt(3)
    val codes = Pq.encode(corpus, idCol, vecCol, m, dim, books)
      .select(col(idCol), col("sub"), col("code"))
    ParquetTable(spark, "gen_codes", s"$dir/codes", codes.schema)
      .overwrite(codes)
    interrupt(4)
  }

  /** Consume a stored [[IndexHealth.cellHealth]] decision relation: if
    * ANY cell is flagged `drifted`, rebuild the index generation on
    * `trainPop`/`corpus` and atomically publish it; otherwise leave the
    * current generation serving. Returns whether a retrain+swap
    * happened. The decision fetch is k-bounded (one row per cell). */
  def retrainIfDrifted(index: GenerationalIndex, decision: DataFrame,
                       trainPop: DataFrame, corpus: DataFrame,
                       idCol: String, vecCol: String,
                       k: Int = 16, m: Int = 8, dim: Int = 64,
                       ksub: Int = 16, iters: Int = 2,
                       interrupt: Int => Unit = _ => ()): Boolean = {
    val drifted = graft.plans.Materialize.modelState(
      decision.filter(col("drifted")).select(col("cid")),
      "per-cell retrain decisions (k-bounded)", 1 << 14)
    if (drifted.isEmpty) false
    else {
      val g = index.nextGen()
      buildGeneration(index.spark, index.genDir(g), trainPop, corpus,
        idCol, vecCol, k, m, dim, ksub, iters, interrupt)
      index.publish(g)
      true
    }
  }
}
