package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Scd2

/** SCD Type-2 semantics on a hand-built dimension: version close-out,
  * reopen, no-op pass-through, brand-new insert, history preservation,
  * null-safe attribute comparison — and the no-dimension-shuffle plan
  * guarantee the module is designed around. */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val tOld = Timestamp.valueOf("2023-01-01 00:00:00")
  private val asOf = Timestamp.valueOf("2024-06-01 00:00:00")

  private def dim = Seq(
    (1L, "gold", 10.0, t0, null.asInstanceOf[Timestamp], 1),   // will change
    (2L, "silver", 20.0, t0, null.asInstanceOf[Timestamp], 1), // no-op change
    (3L, "bronze", 30.0, t0, null.asInstanceOf[Timestamp], 1), // untouched
    (4L, null, 40.0, t0, null.asInstanceOf[Timestamp], 1),     // null attr, no-op
    (1L, "old", 5.0, tOld, t0, 0)                              // history
  ).toDF("k", "seg", "bal", "eff_from", "eff_to", "is_current")

  private def changes = Seq(
    (1L, "platinum", 15.0),
    (2L, "silver", 20.0),
    (4L, null.asInstanceOf[String], 40.0),
    (9L, "new", 0.0)
  ).toDF("k", "seg", "bal")

  private lazy val out =
    Scd2.applyChanges(dim, changes, Seq("k"), Seq("seg", "bal"), lit(asOf))
      .orderBy("k", "eff_from").collect()

  test("changed key closes the old version and opens a new one") {
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.length == 3) // history + closed + reopened
    val closed = k1.find(r => r.getString(1) == "gold").get
    assert(closed.getTimestamp(4) == asOf && closed.getInt(5) == 0)
    val reopened = k1.find(r => r.getString(1) == "platinum").get
    assert(reopened.getTimestamp(3) == asOf &&
      reopened.getTimestamp(4) == null && reopened.getInt(5) == 1)
  }

  test("identical change rows and null-equal attributes are no-ops") {
    assert(out.count(_.getLong(0) == 2L) == 1)
    val k2 = out.find(_.getLong(0) == 2L).get
    assert(k2.getInt(5) == 1 && k2.getTimestamp(4) == null)
    // null seg <=> null seg must compare equal, not open a version
    assert(out.count(_.getLong(0) == 4L) == 1)
  }

  test("unmatched dimension rows and history pass through untouched") {
    val k3 = out.find(_.getLong(0) == 3L).get
    assert(k3.getString(1) == "bronze" && k3.getInt(5) == 1)
    val hist = out.find(r => r.getLong(0) == 1L && r.getInt(5) == 0 &&
      r.getTimestamp(3) == tOld).get
    assert(hist.getTimestamp(4) == t0) // interval unchanged
  }

  test("brand-new keys insert as open versions") {
    val k9 = out.filter(_.getLong(0) == 9L)
    assert(k9.length == 1)
    assert(k9(0).getString(1) == "new" && k9(0).getTimestamp(3) == asOf &&
      k9(0).getInt(5) == 1)
  }

  test("exactly one current version per key survives") {
    val perKey = out.filter(_.getInt(5) == 1).groupBy(_.getLong(0))
    assert(perKey.forall(_._2.length == 1))
  }

  test("a NULL is_current row routes to history instead of vanishing") {
    val nullRow = Seq((7L, "limbo", 70.0, t0, null.asInstanceOf[Timestamp]))
      .toDF("k", "seg", "bal", "eff_from", "eff_to")
      .withColumn("is_current", lit(null).cast("int"))
    val withNull = dim.unionByName(nullRow)
    val r = Scd2.applyChanges(withNull, changes, Seq("k"),
      Seq("seg", "bal"), lit(asOf)).filter(col("k") === 7L).collect()
    assert(r.length == 1 && r(0).getString(1) == "limbo", r.toSeq)
  }

  test("plan: the dimension side never shuffles — change joins broadcast") {
    val plan = Scd2.applyChanges(dim, changes, Seq("k"), Seq("seg", "bal"),
      lit(asOf)).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
