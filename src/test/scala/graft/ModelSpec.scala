package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.SchemaTools
import graft.model.FeedConfig
import graft.model.FeedConfig.{ColumnSpec, Feed}
import graft.multimodal.Binary
import graft.orchestrate.RunDecision

/** Pure-model coverage: config JSON parse + validation, schema builder,
  * drift evolution, run-decision branches, multimodal decode path. */
class ModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val configJson =
    """{
      |  "HeaderID": 11, "SourceContainer": "raw", "SourceFilePath": "/in",
      |  "SourceFileFormat": "csv", "SourceFileHeader": 1,
      |  "SourceFileDelimiter": "|", "TargetTableSchema": "a",
      |  "TargetTableName": "t", "IsPII": 1, "PIISchema": "p",
      |  "PIITableName": "tp", "OverWriteFlag": 0, "BatchFileCount": 2,
      |  "ContinuousRunFlag": 1,
      |  "JobConfig": {"Alert": 1, "Emails": "x@y,z@y",
      |    "CronSyntax": "0 0 3 * * ?", "WarningDuration": 600,
      |    "TimeOut": 1200, "Retries": 2, "ClusterMaxWorkers": 4,
      |    "SparkConf": ""},
      |  "Columns": [
      |    {"SourceColumnName": "a", "TargetColumnName": "A",
      |     "TargetDataType": "decimal(10,2)", "ColumnOrder": 2,
      |     "ZOrder": 1, "IsPII": 0},
      |    {"SourceColumnName": "b", "TargetColumnName": "B",
      |     "TargetDataType": "string", "ColumnOrder": 1,
      |     "ZOrder": 0, "IsPII": 1}],
      |  "IsCurrent": 1
      |}""".stripMargin

  test("config JSON parses and validates clean") {
    val f = FeedConfig.parse(configJson)
    assert(f.HeaderID == 11 && f.maxFilesPerTrigger == 100)
    assert(FeedConfig.validate(f).isEmpty)
    // declared schema follows ColumnOrder, types parsed via DDL
    val s = SchemaTools.declaredSchema(f.Columns)
    assert(s.fieldNames.toSeq == Seq("b", "a"))
    assert(s.fields(1).dataType.sql == "DECIMAL(10,2)")
    assert(SchemaTools.schemaHints(f.Columns) == "b string, a decimal(10,2)")
  }

  test("validation catches duplicate orders, bad types, missing PII table") {
    val f = FeedConfig.parse(configJson)
    val bad = f.copy(
      PIITableName = "",
      Columns = f.Columns.map(_.copy(ColumnOrder = 1)) :+
        ColumnSpec("c", "C", "not_a_type", 3))
    val errs = FeedConfig.validate(bad)
    assert(errs.exists(_.contains("duplicate ColumnOrder")))
    assert(errs.exists(_.contains("bad type")))
    assert(errs.exists(_.contains("PII table not configured")))
    assert(FeedConfig.validateAll(Seq(f, f))
      .exists(_.contains("duplicate HeaderID")))
  }

  test("drift evolution appends string columns after max order") {
    val cols = Seq(ColumnSpec("a", "a", "int", 1), ColumnSpec("b", "b", "string", 2))
    val batch = Seq((1, "x", "y", "z")).toDF("a", "b", "new1", "new2")
    val extras = SchemaTools.extraColumns(batch, cols)
    assert(extras.map(_.name) == Seq("new1", "new2"))
    val evolved = SchemaTools.evolve(cols, extras)
    assert(evolved.map(c => (c.SourceColumnName, c.TargetDataType, c.ColumnOrder)) ==
      Seq(("a", "int", 1), ("b", "string", 2),
        ("new1", "string", 3), ("new2", "string", 4)))
    assert(SchemaTools.targetSchema(evolved).fieldNames.takeRight(3).toSeq ==
      Seq("BatchId", "InsertDate", "ModifiedDateTime"))
  }

  test("run decision: daily runs, weekly honors day flag, past-SLA cancels") {
    val control = Seq(
      (1L, 0, 100L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00")),
      (2L, 0, 200L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00")),
      (3L, 0, 300L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00")),
      (4L, 1, 400L, java.sql.Timestamp.valueOf("2024-01-02 01:00:00")),
      (5L, 1, 500L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00")))
      .toDF("HeaderID", "StatusID", "JobID", "LastUpdateTime")
    val header = Seq(
      (1L, "a.t1", 1, 0, 0, "18:00"),  // daily, inside SLA → run
      (2L, "a.t2", 2, 1, 0, "18:00"),  // weekly, Tue flag set → run
      (3L, "a.t3", 2, 0, 1, "18:00"),  // weekly, wrong day → skip
      (4L, "a.t4", 1, 0, 0, "18:00"),  // in progress → not in NeedToRun
      (5L, "a.t5", 1, 0, 0, "09:00"))
      .toDF("HeaderID", "TableName", "RunFrequency", "Tue", "Wed", "SLA")
      .withColumn("Mon", lit(0)).withColumn("Thu", lit(0))
      .withColumn("Fri", lit(0)).withColumn("Sat", lit(0))
      .withColumn("Sun", lit(0))

    val toRun = RunDecision.needToRun(control, header, Date.valueOf("2024-01-02"))
    assert(toRun.select("HeaderID").as[Long].collect().toSet == Set(1L, 2L, 3L))

    val actions = RunDecision.decide(toRun, "14:30", "Tue")
      .select("HeaderID", "Action").as[(Long, String)].collect().toMap
    assert(actions == Map(1L -> "run", 2L -> "run", 3L -> "skip"))

    val cancels = RunDecision.slaCancel(control, header, "14:30")
      .select("HeaderID").as[Long].collect().toSet
    assert(cancels == Set(5L)) // in-flight and past its 09:00 SLA
  }

  test("cron describe covers the config shapes, registers as a UDF") {
    import graft.orchestrate.CronDescribe
    assert(CronDescribe.describe("0 0 3 * * ?") == "at 03:00:00, every day")
    assert(CronDescribe.describe("0 30 14 * * 2") == "at 14:30:00 on weekday 2")
    assert(CronDescribe.describe("0 0/15 * * * ?") == "every 15 minutes, every day")
    assert(CronDescribe.describe("bogus").startsWith("invalid cron"))
    CronDescribe.register(spark)
    val out = spark.sql("SELECT cron_describe('0 0 3 * * ?') AS d")
      .as[String].head()
    assert(out == "at 03:00:00, every day")
  }

  test("multimodal: metadata scan, stubbed decode, frame sampling") {
    val docs = Seq((0L, "abcdefgh0123456789"), (1L, "shorter")).toDF("doc_id", "text")
    val media = Binary.mediaTable(docs)
    val meta = Binary.payloadMetadata(media).orderBy("doc_id").collect()
    assert(meta(0).getAs[String]("media_type") == "image")
    assert(meta(0).getAs[Long]("byte_len") == 18L)
    assert(meta(0).getAs[String]("magic") == "6162636465666768") // 'abcdefgh'

    val feats = Binary.decodeFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(0L).byte_len == 18L && feats(0L).channels == 3)
    assert(feats(1L).channels == 1) // odd byte length

    val frames = Binary.sampleFrames(media, frameBytes = 8, nFrames = 3)
      .filter(col("doc_id") === 0).orderBy("frame_no").collect()
    assert(frames.length == 3)
    assert(new String(frames(0).getAs[Array[Byte]]("frame_bytes")) == "abcdefgh")
  }
}
