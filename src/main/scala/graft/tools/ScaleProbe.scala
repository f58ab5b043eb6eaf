package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scaling probe for the heavy dedup/curation family: measure runtime
  * growth against synthetic corpus scale-ups BEFORE a bigger scale
  * factor does, so a superlinear path is caught locally.
  *
  * Corpus construction: copy `c` of the base `documents` table keeps
  * every column but offsets `doc_id` by c·1,000,000 (clear of every
  * fixture id the registry plants, which all live below 10⁶) and
  * remaps each token with a copy-specific prefix (`c3the`), so each
  * copy is a vocabulary-disjoint replica of the base corpus. That
  * keeps the DUPLICATE STRUCTURE (near-dup density per doc, candidate
  * fan-out, component sizes) exactly constant while the corpus grows —
  * runtime growth then measures the ENGINE's scaling, not a denser
  * problem. (Planting exact ×N copies instead would grow candidate
  * pairs quadratically in N by construction — a different, known-
  * superlinear problem.)
  *
  * Usage: `runMain graft.tools.ScaleProbe <workDir> [--vectors|--graph]
  * <scale...>` with `SPARK_GRAFT_SF_DIR` as the base corpus, e.g.
  * scales `1 3 10`. Each scale writes
  * `<workDir>/x<N>/documents.parquet` (reused when present) and runs
  * the heavy text entries min-of-2; `--vectors` scales the
  * `embeddings` table instead (vec_id offset per copy, vectors and
  * labels unchanged — identical geometry per replica, so only the
  * engine's scan/train/join cost grows) and runs the ANN/k-means
  * family; `--graph` scales orders + lineitem with disjoint key
  * spaces per copy (isolated identical graph components — constant
  * density/degree/triangle structure) and runs the graph family.
  * Output: one JSON line per scale plus a fitted exponent per
  * entry — log(t_hi/t_lo)/log(hi/lo) over the largest/smallest scale,
  * ~1.0 for a linear operator; shuffle/setup constants bias sub-linear
  * at these sizes, so read >1.3 as the smoke signal. */
object ScaleProbe {
  val heavyEntries: Seq[String] = Seq(
    "q_dedup_exact", "q_neardup_pairs", "q_neardup_components",
    "q_cluster_best", "q_containment", "q_containment_seed",
    "q_curation_v2", "q_corpus_pipeline")

  val vectorEntries: Seq[String] = Seq(
    "q_cosine_topk", "q_kmeans", "q_ann_lsh", "q_ann_ivf",
    "q_ann_rerank")

  val graphEntries: Seq[String] = Seq(
    "q_triangles", "q_pagerank_dangling", "q_hits", "q_label_prop")

  /** ×`scale` replica of the orders + lineitem pair with DISJOINT key
    * spaces per copy (custkey, suppkey and orderkey all offset, so
    * copy c's interaction graph is an isolated component identical to
    * the base's): edge density, degree distribution, component and
    * triangle structure stay CONSTANT while node/edge counts grow —
    * growth measures the engine's join/iteration cost, not a denser
    * graph. */
  def buildGraph(spark: SparkSession, baseDir: String, scale: Int,
                 dir: String): Unit = {
    val orders = spark.read.parquet(s"$baseDir/orders.parquet")
    val li = spark.read.parquet(s"$baseDir/lineitem.parquet")
    // the fixed replica offsets below assume the base key spaces fit
    // under them; at TPC-H sf>=30 orderkeys pass 1e8 and copies would
    // alias into cross-copy edges, silently breaking the probe's
    // constant-structure premise — fail loudly instead
    val maxKeys = orders.agg(max(col("o_orderkey")), max(col("o_custkey")))
      .collect()(0)
    val maxSupp = li.agg(max(col("l_suppkey"))).collect()(0).getLong(0)
    require(maxKeys.getLong(0) < 100000000L,
      s"base o_orderkey max ${maxKeys.getLong(0)} >= 1e8: replica key " +
        "spaces would alias — raise the orderkey offset")
    require(maxKeys.getLong(1) < 10000000L && maxSupp < 10000000L,
      s"base custkey/suppkey max (${maxKeys.getLong(1)}, $maxSupp) >= " +
        "1e7: replica key spaces would alias — raise the offsets")
    val oCopies = (0 until scale).map { c =>
      if (c == 0) orders
      else orders
        .withColumn("o_orderkey", col("o_orderkey") + lit(c.toLong * 100000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(c.toLong * 10000000L))
    }
    val lCopies = (0 until scale).map { c =>
      if (c == 0) li
      else li
        .withColumn("l_orderkey", col("l_orderkey") + lit(c.toLong * 100000000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(c.toLong * 10000000L))
    }
    oCopies.reduce(_.unionByName(_)).repartition(32)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    lCopies.reduce(_.unionByName(_)).repartition(32)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  /** Vocabulary-disjoint ×`scale` replica of the base documents table
    * (see the object doc) — shared with [[StreamProbe]]. */
  def buildCorpus(spark: SparkSession, baseDir: String, scale: Int,
                  dir: String): Unit = {
    val base = spark.read.parquet(s"$baseDir/documents.parquet")
    val copies = (0 until scale).map { c =>
      if (c == 0) base
      else base
        .withColumn("doc_id", col("doc_id") + lit(c.toLong * 1000000L))
        .withColumn("text",
          array_join(transform(split(trim(col("text")), "\\s+"),
            t => concat(lit(s"c$c"), t)), " "))
    }
    copies.reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** ×`scale` replica of the embeddings table with ODD replica ids:
    * the ANN entries define their query sets by id residue
    * (vec_id % 100 == 0), so a residue-preserving offset would grow
    * the QUERY set with the corpus and the probe would measure
    * queries×corpus — quadratic by fixture (found the hard way: the
    * v100 first cut filled the disk with window-sort spill). Odd ids
    * are never ≡ 0 (mod 100): the query set stays the base corpus's,
    * and growth measures the engine against a fixed workload. */
  def buildVectors(spark: SparkSession, baseDir: String, scale: Int,
                   dir: String): Unit = {
    val base = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val copies = (0 until scale).map { c =>
      if (c == 0) base
      else base.withColumn("vec_id",
        lit(c.toLong * 10000000L) + col("vec_id") * 2 + 1)
    }
    copies.reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleProbe <workDir> [--vectors|--graph] <scale...>")
    val workDir = args(0)
    val vectors = args.contains("--vectors")
    val graph = args.contains("--graph")
    val scales = args.drop(1)
      .filterNot(a => a == "--vectors" || a == "--graph")
      .map(_.toInt).toSeq.sorted
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session("graft-scale-probe")
    Tables.load(spark, baseDir, "nation").count()

    def buildCorpus(scale: Int, dir: String): Unit =
      ScaleProbe.buildCorpus(spark, baseDir, scale, dir)

    def buildVectors(scale: Int, dir: String): Unit =
      ScaleProbe.buildVectors(spark, baseDir, scale, dir)

    def resetState(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }

    // SPARK_GRAFT_PROBE_ENTRIES overrides the entry list (comma-
    // separated) — re-probe a new operator without re-running the
    // whole family
    val entries = sys.env.get("SPARK_GRAFT_PROBE_ENTRIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(if (vectors) vectorEntries
      else if (graph) graphEntries
      else heavyEntries)
    val results = scales.map { scale =>
      val dir =
        if (vectors) s"$workDir/v$scale"
        else if (graph) s"$workDir/g$scale"
        else s"$workDir/x$scale"
      if (vectors) {
        if (!new java.io.File(s"$dir/embeddings.parquet").exists())
          buildVectors(scale, dir)
      } else if (graph) {
        if (!new java.io.File(s"$dir/lineitem.parquet").exists())
          buildGraph(spark, baseDir, scale, dir)
      } else if (!new java.io.File(s"$dir/documents.parquet").exists())
        buildCorpus(scale, dir)
      val times = entries.map { name =>
        val fn = graft.queries.Registry.benchQueries(name)
        val best = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          val t = (System.nanoTime() - t0) / 1e9
          resetState()
          t
        }.min
        System.gc()
        name -> best
      }
      val line = times.map { case (n, t) =>
        "\"" + n + "\":" + f"$t%.2f" }.mkString("{", ",", "}")
      println(s"""{"scale":$scale,"sec":$line}""")
      scale -> times.toMap
    }

    if (scales.size >= 2) {
      val lo = scales.head; val hi = scales.last
      val ratio = math.log(hi.toDouble / lo)
      println("entry,exponent,t_lo,t_hi")
      entries.foreach { n =>
        val tLo = results.head._2(n); val tHi = results.last._2(n)
        val exp = math.log(tHi / tLo) / ratio
        println(f"$n,$exp%.2f,$tLo%.2f,$tHi%.2f")
      }
    }
    spark.stop()
  }
}
