package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided synthetic parquet tables (TESTDATA.md):
  * one parquet file per table under `sfDir`.
  *
  * All `SparkEntry.queries` read through here so every query shares one
  * scan path: column pruning + filter pushdown reach the parquet reader
  * uniformly, and the events-table timestamp normalization happens in
  * exactly one place.
  */
object Tables {
  /** The eight TPC-H-ish tables plus the LLM-pipeline tables. */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    normalizeTimestamps(if (name == "events") normalizeTs(df) else df)
  }

  /** Canonicalize EVERY TimestampNTZ column to the session-TZ TIMESTAMP
    * the registry programs against. The driver's testdata generations
    * have flipped timestamp encodings before (see [[normalizeTs]] — a
    * flip on `events.ts` broke 28 entries in one round); with the
    * session pinned to UTC the cast is wall-clock identity, and doing
    * it here means a future flip lands in one loader and one schema-
    * contract spec instead of in every date-touching entry. */
  def normalizeTimestamps(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
    ntz.foldLeft(df)((d, f) => d.withColumn(f.name,
      col(f.name).cast(org.apache.spark.sql.types.TimestampType)))
  }

  /** Schema-aware timestamp normalization for `events.ts`.
    *
    * The physical encoding of the driver's testdata has varied between
    * generations — parquet TIMESTAMP(NANOS) (which Spark's reader only
    * surfaces as a nanosecond long under `nanosAsLong`) and plain
    * `timestamp[us]` (surfaced as TIMESTAMP or TIMESTAMP_NTZ depending on
    * isAdjustedToUTC). Every consumer needs one logical type, so branch on
    * the dtype the reader actually produced instead of assuming one
    * encoding:
    *   - LongType          → nanos long: truncate to micros (same
    *                         truncation DuckDB applies, so oracles agree)
    *   - TimestampNTZType  → cast to session-TZ TIMESTAMP; the session
    *                         pins UTC, so the wall-clock value is
    *                         unchanged and oracle hashing agrees
    *   - TimestampType     → already canonical, pass through
    * Works on batch and streaming frames alike (pure projection).
    */
  def normalizeTs(df: DataFrame, column: String = "ts"): DataFrame =
    df.schema.find(_.name == column).map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn(column, timestamp_micros(expr(s"`$column` div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn(column, col(column).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Row count of a table from its parquet FOOTERS only — a driver-side
    * metadata read (no Spark job, no data pages). This is how operators
    * that only need the corpus SIZE (e.g. deriving an LSH bucket count
    * ~ log2(n)) avoid paying a full count() pass over a 100 TB input
    * before the real job starts. */
  def parquetRowCount(spark: SparkSession, sfDir: String, name: String): Long = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(s"$sfDir/$name.parquet")
    val fs = root.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(root).isFile) Seq(root)
      else fs.listStatus(root).toSeq.filter(_.isFile).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
    files.map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      finally r.close()
    }.sum
  }

  /** Shared local session config for every entry point (Verify/Bench/tests).
    * Shuffle partitions sized to cores: at 100 TB on a real cluster this is
    * AQE-coalesced from a much larger initial number; locally 32 avoids
    * thousands of empty reducers.
    */
  def session(appName: String, cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      // LOCAL profile: the test tables are single few-MB parquet files,
      // and the default 128 MB split gives 1-partition scans — every
      // per-row-expensive map stage (regex, hashing, signatures) runs
      // on one of the 32 cores. Smaller splits engage them all. On a
      // real cluster sessions are user-built (configure()) and TB
      // inputs already split into thousands of default-size partitions.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may reuse a session built without the extensions
    GraftExtensions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply the same required confs to an externally-built session. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    GraftExtensions.register(spark)
    spark
  }
}
