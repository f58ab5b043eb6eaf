package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checks (the dbt-test / Deequ
  * shape): each check yields one `(check_name, violations)` row, so a
  * pipeline can gate a load on `violations == 0` and a report can
  * trend counts over time.
  *
  * Scale design: ALL row-level checks run in ONE conditional-agg pass
  * over the table (a per-check scan would read the 100 TB input once
  * per constraint); uniqueness is a single count-per-key aggregation;
  * referential integrity is an anti join against the dimension's key
  * column only (column-pruned — broadcastable when the dim is small,
  * shuffled equi-join otherwise, never a cartesian). The per-check
  * outputs are 1-row frames, so the final UNION is free. */
object Quality {

  /** A row-level constraint: `violated` is true on rows BREAKING it,
    * e.g. `col("x").isNull` for NOT NULL. */
  final case class RowCheck(name: String, violated: Column)

  def notNull(c: String): RowCheck =
    RowCheck(s"${c}_not_null", col(c).isNull)

  def accepted(c: String, values: Seq[String]): RowCheck =
    RowCheck(s"${c}_accepted", !col(c).isin(values: _*) || col(c).isNull)

  /** All row checks in one pass: conditional sums melted to rows. */
  def rowChecks(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "no row checks given")
    val agg = df.agg(
      count(when(checks.head.violated, 1)).as(checks.head.name),
      checks.tail.map(c => count(when(c.violated, 1)).as(c.name)): _*)
    agg.select(explode(array(checks.map(c =>
      struct(lit(c.name).as("check_name"), col(c.name).as("violations"))): _*))
      .as("r")).select(col("r.check_name"), col("r.violations"))
  }

  /** Duplicate-key rows beyond the first per key value. */
  def unique(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** Fact keys with no matching dimension row (orphans). Both sides are
    * aliased before the join: surrogate keys often carry the SAME name
    * in fact and dimension, and unaliased `col(key) === col(key)` would
    * be ambiguous and fail analysis. */
  def refIntegrity(fact: DataFrame, name: String, keyCol: String,
                   dim: DataFrame, dimKey: String): DataFrame =
    fact.select(col(keyCol).as("__fk"))
      .join(dim.select(col(dimKey).as("__dk")), col("__fk") === col("__dk"),
        "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** A full report: union of any check frames built above. */
  def report(first: DataFrame, rest: DataFrame*): DataFrame =
    rest.foldLeft(first)(_ unionByName _)
}
