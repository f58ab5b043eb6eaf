package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.{ConfigLoader, MetaStore}
import graft.model.FeedConfig.{ColumnSpec, Feed, JobSpec}

/** The §3.2 register/refresh flow end-to-end: validated load, idempotent
  * re-load, soft-retire on drop, control seeding, error-path isolation. */
class ConfigLoaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val t0 = Timestamp.valueOf("2024-04-01 00:00:00")
  private val t1 = Timestamp.valueOf("2024-04-02 00:00:00")

  private def feed(id: Int, name: String): Feed = Feed(
    HeaderID = id, SourceContainer = "raw", SourceFilePath = s"/in/$name",
    SourceFileFormat = "csv", SourceFileHeader = 1, SourceFileDelimiter = ",",
    TargetTableSchema = "a", TargetTableName = name,
    JobConfig = JobSpec(CronSyntax = "0 0 3 * * ?", WarningDuration = 600 + id),
    Columns = Seq(
      ColumnSpec("c1", "C1", "int", 1),
      ColumnSpec("c2", "C2", "string", 2, IsPII = 1)))

  test("load populates header/column/job/control; reload is idempotent; drop retires") {
    val root = Files.createTempDirectory("cfg").toString
    val meta = new MetaStore(spark, root).bootstrap()

    // initial load: two feeds
    assert(new ConfigLoader(meta, () => t0).load(Seq(feed(1, "t1"), feed(2, "t2"))).isEmpty)
    assert(meta.header.read().filter(col("IsCurrent") === 1).count() == 2)
    assert(meta.columns.read().count() == 4)
    assert(meta.control.read().count() == 2)
    assert(meta.control.read().filter(col("StatusID") =!= 0).count() == 0)
    val cron = meta.jobs.read().filter(col("HeaderID") === 1)
      .select("CronSyntaxDescription").head().getString(0)
    assert(cron == "at 03:00:00, every day")

    // reload the identical set at a later time: still 2 current rows,
    // CreatedDateTime preserved, LastUpdated bumped
    assert(new ConfigLoader(meta, () => t1).load(Seq(feed(1, "t1"), feed(2, "t2"))).isEmpty)
    val h1 = meta.header.read().filter(col("HeaderID") === 1).head()
    assert(h1.getAs[Timestamp]("CreatedDateTime") == t0)
    assert(h1.getAs[Timestamp]("LastUpdatedDateTime") == t1)
    assert(meta.header.read().count() == 2)
    assert(meta.control.read().count() == 2) // insert-only: no dupes

    // drop feed 2: soft-retired, never deleted
    assert(new ConfigLoader(meta, () => t1).load(Seq(feed(1, "t1"))).isEmpty)
    val h2 = meta.header.read().filter(col("HeaderID") === 2).head()
    assert(h2.getAs[Byte]("IsCurrent") == 0)
    assert(meta.header.read().count() == 2)
    assert(meta.columns.read()
      .filter(col("HeaderID") === 2 && col("IsCurrent") === 1).count() == 0)
  }

  test("validation failure leaves the catalog untouched") {
    val root = Files.createTempDirectory("cfg-bad").toString
    val meta = new MetaStore(spark, root).bootstrap()
    val bad = feed(1, "t1").copy(Columns = Nil)
    val errs = new ConfigLoader(meta, () => t0).load(Seq(bad))
    assert(errs.exists(_.contains("no columns configured")))
    assert(meta.header.read().count() == 0)
    assert(meta.control.read().count() == 0)
  }
}
