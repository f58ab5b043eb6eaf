package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout levers that matter at cluster scale, exercised
  * end-to-end on real parquet: bucketed tables co-locate a join with
  * NO exchange on either side, a partitioned layout prunes at the scan,
  * and dynamic partition pruning turns a dim filter into a runtime
  * fact-scan filter. These are layout contracts (what a 100 TB
  * deployment relies on), gated here so a regression in how the engine
  * writes or reads breaks the build, not the cluster. */
class StorageLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tmpRoots = scala.collection.mutable.ListBuffer.empty[java.io.File]

  private def tmp(prefix: String) = {
    val root = Files.createTempDirectory(prefix).toFile
    tmpRoots += root
    root.getAbsolutePath + "/data"
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }

  // DROP TABLE on a path-based external table leaves the parquet data
  // behind, and the partitioned/DPP fixtures are plain directories —
  // sweep everything this suite wrote out of the system temp dir.
  override def withFixture(test: NoArgTest): org.scalatest.Outcome =
    try super.withFixture(test)
    finally { tmpRoots.foreach(deleteRec); tmpRoots.clear() }

  /** Run `body` with broadcast joins disabled so the exchange-vs-bucket
    * decision is actually exercised (the fixtures are tiny; a real
    * deployment's fact tables are far past any broadcast threshold). */
  private def withoutBroadcast[A](body: => A): A = {
    val orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)
  }

  test("bucketed tables co-locate the join: no shuffle on either side") {
    val dir1 = tmp("bkt1"); val dir2 = tmp("bkt2")
    val left = spark.range(10000)
      .select(col("id").as("k"), (col("id") % 97).as("v1"))
    val right = spark.range(10000)
      .select(col("id").as("k"), (col("id") % 31).as("v2"))
    left.write.format("parquet").option("path", dir1)
      .bucketBy(8, "k").sortBy("k").saveAsTable("bkt_left")
    right.write.format("parquet").option("path", dir2)
      .bucketBy(8, "k").sortBy("k").saveAsTable("bkt_right")
    try withoutBroadcast {
      val j = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      assert(j.count() == 10000)
      val plan = j.queryExecution.executedPlan.toString
      // same bucketing on the join key on both sides → SMJ reads the
      // buckets directly; an Exchange here means co-location was lost
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan)
      // bucket-pruning bonus: an equality filter on the bucket column
      // selects 1 of 8 buckets at the scan (autoBucketedScan turns the
      // bucketed layout off for scans with no downstream distribution
      // requirement, so pin it on for this read)
      val origAuto = spark.conf
        .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      try {
        val pruned = spark.table("bkt_left").filter(col("k") === 42)
          .queryExecution.executedPlan.toString
        assert(pruned.contains("SelectedBucketsCount: 1 out of 8"), pruned)
      } finally spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", origAuto)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    val dir = tmp("part")
    Seq(("en", 1L), ("en", 2L), ("de", 3L), ("fr", 4L))
      .toDF("lang", "doc_id")
      .write.partitionBy("lang").parquet(dir)
    val scan = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(scan.count() == 2)
    val plan = scan.queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (metadata pruning), not
    // as a post-scan Filter over all partitions
    assert("PartitionFilters: \\[[^\\]]*lang#\\d+ = en".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at runtime") {
    val dir = tmp("dpp")
    spark.range(1000)
      .select(col("id").as("fact_id"), (col("id") % 10).as("part_key"),
        (col("id") * 2).as("measure"))
      .write.partitionBy("part_key").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = spark.range(10)
      .select(col("id").as("part_key"), concat(lit("d"), col("id")).as("name"))
    val origStats =
      spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val q = fact.join(dim, "part_key").filter(col("name") === "d3")
      assert(q.count() == 100)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"), plan)
    } finally {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats", origStats)
    }
  }

  test("runtime bloom filter: selective dim filter prunes the fact scan pre-shuffle") {
    // The non-partitioned sibling of DPP: when the join key is NOT the
    // partition column, a bloom filter built from the filtered dim side
    // is injected under the fact scan, discarding non-joining rows
    // BEFORE the shuffle. At 100 TB this is the difference between
    // shuffling the full fact table and shuffling the ~1% that joins.
    val dir = tmp("bloom")
    spark.range(200000)
      .select(col("id").as("fact_id"), (col("id") % 1000).as("join_key"),
        (col("id") * 2).as("measure"))
      .write.parquet(dir)
    val fact = spark.read.parquet(dir)
    val dimDir = tmp("bloomdim")
    spark.range(1000)
      .select(col("id").as("join_key"),
        concat(lit("d"), col("id")).as("name"))
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("name") === "d7")
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val orig = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try withoutBroadcast {
      val q = fact.join(dim, "join_key")
      assert(q.count() == 200)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), plan)
    } finally orig.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("AQE skew join: a hot key is split at runtime instead of one giant task") {
    // 90% of the left side lands on ONE key. With AQE skew handling the
    // sort-merge join marks the skewed partition and splits it across
    // tasks — the runtime answer to hot keys when a manual salt
    // (plans/Skew) isn't already in place.
    val dirL = tmp("skewL"); val dirR = tmp("skewR")
    spark.range(200000)
      .select(when(col("id") % 10 < 9, 7L).otherwise(col("id") % 1000)
        .as("k"), col("id").as("v"))
      .write.parquet(dirL)
    spark.range(1000).select(col("id").as("k"), col("id").as("w"))
      .write.parquet(dirR)
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val orig = confs.map { case (c, _) => c -> spark.conf.get(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try withoutBroadcast {
      val q = spark.read.parquet(dirL).join(spark.read.parquet(dirR), Seq("k"))
      // collect on q itself: AQE only finalizes (and marks skew on) the
      // plan of the query that actually ran
      assert(q.collect().length == 200000)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan)
    } finally orig.foreach { case (c, v) => spark.conf.set(c, v) }
  }
}
