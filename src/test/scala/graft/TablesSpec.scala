package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Regression for the events-timestamp normalization: the driver's testdata
  * has shipped `events.ts` as parquet TIMESTAMP(NANOS) (read as a nanos
  * long under `nanosAsLong`) in some generations and as `timestamp[us]`
  * (read as TIMESTAMP_NTZ) in others. `Tables.normalizeTs` must accept
  * every encoding the reader can produce and land on the same canonical
  * session-TZ TIMESTAMP wall-clock values. Round 7 hard-coded the nanos
  * branch and lost 28 registry entries when the encoding flipped — this
  * spec writes each encoding to temp parquet and loads all of them.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one known instant: 2024-03-05 06:07:08.123456 UTC
  private val micros = 1709618828123456L

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft-ts").toFile
    d.deleteOnExit(); d.toString
  }

  test("nanos-long encoding truncates to micros") {
    val dir = tmp()
    Seq((1L, micros * 1000L + 789L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    val ts = got.select(col("ts")).as[Timestamp].head()
    assert(ts.getTime == micros / 1000) // millis part
    assert(ts.getNanos == (micros % 1000000L).toInt * 1000) // sub-ms, nanos dropped
  }

  test("timestamp_ntz (timestamp[us]) encoding passes through as session-TZ wall clock") {
    val dir = tmp()
    // NTZ write → parquet timestamp[us] isAdjustedToUTC=false → read NTZ
    spark.sql(s"SELECT 1L AS event_id, timestamp_ntz'2024-03-05 06:07:08.123456' AS ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType) // precondition: encoding reproduced
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    val ts = got.select(col("ts")).as[Timestamp].head()
    // session TZ is UTC: wall clock unchanged
    assert(ts.toInstant.toString == "2024-03-05T06:07:08.123456Z")
  }

  test("timestamp (UTC-adjusted) encoding is already canonical") {
    val dir = tmp()
    Seq((1L, new Timestamp(micros / 1000))).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(col("ts")).as[Timestamp].head().getTime == micros / 1000)
  }

  test("normalizeTs is a no-op on frames without the column") {
    val df = Seq((1L, "x")).toDF("id", "text")
    assert(Tables.normalizeTs(df) eq df)
  }

  test("driver testdata loads with a TIMESTAMP ts and non-zero rows") {
    val ev = Tables.load(spark, TestSpark.sf, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.filter(col("ts").isNotNull).limit(1).count() == 1)
  }

  test("driver testdata schema contract: every column the registry relies on") {
    // Round-7 lesson, generalized: a testdata regeneration that shifts
    // an encoding broke 28 entries with one cryptic analysis error.
    // This spec names the drift instead — if it fails, fix the loader
    // (Tables.load normalization), not the entries. Types are the
    // POST-load canonical ones entries program against.
    val expect: Map[String, Map[String, DataType]] = Map(
      "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType),
      "embeddings" -> Map("vec_id" -> LongType),
      "lineitem" -> Map("l_orderkey" -> LongType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_returnflag" -> StringType,
        "l_shipdate" -> TimestampType),
      "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderdate" -> TimestampType),
      "customer" -> Map("c_custkey" -> LongType, "c_mktsegment" -> StringType),
      "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType))
    val drift = expect.flatMap { case (table, cols) =>
      val schema = Tables.load(spark, TestSpark.sf, table).schema
      cols.flatMap { case (name, dt) =>
        schema.find(_.name == name) match {
          case None => Some(s"$table.$name MISSING")
          case Some(f) if f.dataType != dt =>
            Some(s"$table.$name is ${f.dataType.simpleString}, entries expect ${dt.simpleString}")
          case _ => None
        }
      }
    }
    assert(drift.isEmpty,
      s"testdata regenerated with drifted schema — fix Tables.load, not the entries:\n${drift.mkString("\n")}")
  }
}
