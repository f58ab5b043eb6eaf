package graft.model

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** One JSON config document per ingested feed
  * (config/config_template.json:1-142), decoded to case classes and
  * validated with the same rules the reference enforces via JSON Schema
  * + assertions (modules/validate_configurations.py:31-48,
  * insert_config.py:94-120).
  */
object FeedConfig {

  final case class ColumnSpec(
      SourceColumnName: String,
      TargetColumnName: String,
      TargetDataType: String,
      ColumnOrder: Int,
      ZOrder: Int = 0,
      IsPII: Int = 0)

  final case class JobSpec(
      Alert: Int = 0,
      Emails: String = "",
      CronSyntax: String = "0 0 3 * * ?",
      WarningDuration: Int = 600,
      TimeOut: Int = 1200,
      Retries: Int = 2,
      ClusterMaxWorkers: Int = 2,
      SparkConf: String = "")

  final case class Feed(
      HeaderID: Int,
      SourceContainer: String,
      SourceFilePath: String,
      SourceFileFormat: String,
      SourceFileHeader: Int,
      SourceFileDelimiter: String,
      TargetTableSchema: String,
      TargetTableName: String,
      IsPII: Int = 0,
      PIISchema: String = "",
      PIITableName: String = "",
      OverWriteFlag: Int = 0,
      BatchFileCount: Int = 1,
      ContinuousRunFlag: Int = 0,
      JobConfig: JobSpec = JobSpec(),
      Columns: Seq[ColumnSpec] = Nil,
      IsCurrent: Int = 1) {
    def qualifiedTarget: String = s"$TargetTableSchema.$TargetTableName"
    /** 1 vs 100 files per trigger by run mode
      * (modules/auto_loader_steps.py:81-88). */
    def maxFilesPerTrigger: Int = if (ContinuousRunFlag == 1) 100 else 1
  }

  private lazy val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def parse(json: String): Feed = mapper.readValue(json, classOf[Feed])

  def parseFile(path: java.nio.file.Path): Feed =
    parse(java.nio.file.Files.readString(path))

  /** The reference's config assertions: non-empty column list, unique
    * per-feed column orders, parseable data types, supported format
    * (validate_configurations.py + insert_config.py:94-120). Returns the
    * list of violations (empty = valid). */
  def validate(feed: Feed): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (feed.Columns.isEmpty) errs += s"feed ${feed.HeaderID}: no columns configured"
    val dupOrders = feed.Columns.groupBy(_.ColumnOrder).filter(_._2.size > 1).keys
    if (dupOrders.nonEmpty)
      errs += s"feed ${feed.HeaderID}: duplicate ColumnOrder ${dupOrders.mkString(",")}"
    val dupNames = feed.Columns.groupBy(_.TargetColumnName).filter(_._2.size > 1).keys
    if (dupNames.nonEmpty)
      errs += s"feed ${feed.HeaderID}: duplicate target column ${dupNames.mkString(",")}"
    if (!Set("csv", "json", "parquet", "orc").contains(feed.SourceFileFormat.toLowerCase))
      errs += s"feed ${feed.HeaderID}: unsupported format ${feed.SourceFileFormat}"
    feed.Columns.foreach { c =>
      try org.apache.spark.sql.types.DataType.fromDDL(c.TargetDataType)
      catch { case _: Exception =>
        errs += s"feed ${feed.HeaderID}: bad type '${c.TargetDataType}' for ${c.SourceColumnName}"
      }
    }
    if (feed.IsPII == 1 && (feed.PIISchema.isEmpty || feed.PIITableName.isEmpty))
      errs += s"feed ${feed.HeaderID}: IsPII=1 but PII table not configured"
    errs.result()
  }

  /** Validate a set of feeds together: HeaderID must be unique across
    * config files (insert_config.py:94-120). */
  def validateAll(feeds: Seq[Feed]): Seq[String] = {
    val dups = feeds.groupBy(_.HeaderID).filter(_._2.size > 1).keys
    val cross =
      if (dups.nonEmpty) Seq(s"duplicate HeaderID across configs: ${dups.mkString(",")}")
      else Nil
    cross ++ feeds.flatMap(validate)
  }
}
