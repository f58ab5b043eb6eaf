package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 — apply a batch of attribute
  * changes to a versioned dimension table, closing out superseded
  * versions and opening new ones, with full history retained.
  *
  * The dimension carries (`effFrom`, `effTo`, `isCurrent`) bookkeeping:
  * exactly one current version per business key (`effTo` null), closed
  * versions keep their validity interval. A change batch row either
  *   - matches the current version with identical tracked attributes →
  *     no-op;
  *   - matches with any tracked attribute differing (null-safe
  *     comparison) → the current version closes at `asOf` and a new
  *     current version opens at `asOf`;
  *   - has no current version → a brand-new current version opens.
  * Dimension rows without a change row, and all history rows, pass
  * through untouched.
  *
  * Scale design — the dimension is NEVER shuffled: a change batch is a
  * daily delta, orders of magnitude smaller than the dimension, so
  * every join here broadcasts the change side and stays map-side. The
  * usual MERGE formulation (one full-outer join) cannot broadcast —
  * full outer forces a sort-merge shuffle of the whole dimension. The
  * trade: the current slice is SCANNED three times (classify, re-read
  * matched keys, one more column-pruned pass for the key set) — at
  * scale, parquet re-scans with column pruning are cheap against a
  * dimension-wide shuffle, and the scans read disjoint column subsets.
  */
object Scd2 {

  /** Apply `changes` to `dim` as of the `asOf` timestamp.
    *
    * @param dim      versioned dimension: business keys + attributes +
    *                 (`effFrom`, `effTo`, `isCurrent`) columns
    * @param changes  one row per business key with the new values of
    *                 the `tracked` attribute columns (keys must be
    *                 unique — it is a compacted delta, not a log)
    * @param keys     business key columns
    * @param tracked  attribute columns compared (null-safely) to decide
    *                 whether a new version opens; attribute columns of
    *                 `dim` not listed and not in `changes` carry the
    *                 previous version's value into new versions
    */
  def applyChanges(dim: DataFrame, changes: DataFrame, keys: Seq[String],
                   tracked: Seq[String], asOf: Column,
                   effFrom: String = "eff_from", effTo: String = "eff_to",
                   isCurrent: String = "is_current"): DataFrame = {
    val outCols = dim.columns.toSeq
    // null-safe split: a row with NULL is_current fails BOTH a === 1
    // and a =!= 1 filter and would silently vanish from the output —
    // route anything not provably current into the history branch
    val history = dim.filter(!(col(isCurrent) <=> 1))
    val current = dim.filter(col(isCurrent) <=> 1).alias("__t")
    val ch = broadcast(changes.withColumn("__spresent", lit(true))).alias("__s")

    def tcol(c: String) = col(s"__t.$c")
    def scol(c: String) = col(s"__s.$c")

    val joinCond = keys.map(k => tcol(k) === scol(k)).reduce(_ && _)
    val j = current.join(ch, joinCond, "left")
    val matched = col("__s.__spresent").isNotNull
    val changed = matched &&
      !tracked.map(c => tcol(c) <=> scol(c)).reduce(_ && _)

    // Current rows: pass through unchanged, or close out at asOf.
    val keptOrClosed = j.select(outCols.map { c =>
      if (c == effTo) when(changed, asOf).otherwise(tcol(c)).as(c)
      else if (c == isCurrent) when(changed, lit(0)).otherwise(tcol(c)).as(c)
      else tcol(c).as(c)
    }: _*)

    // New versions for changed keys: tracked values from the change row,
    // untracked attributes carried from the superseded version.
    val reopened = j.filter(changed).select(outCols.map { c =>
      if (c == effFrom) asOf.as(c)
      else if (c == effTo) lit(null).cast("timestamp").as(c)
      else if (c == isCurrent) lit(1).as(c)
      else if (tracked.contains(c)) scol(c).as(c)
      else tcol(c).as(c)
    }: _*)

    // Brand-new keys: change rows whose key has no current version. The
    // matched-key set is a subset of the (small) change batch, so both
    // sides of this anti join broadcast; deriving it from `j` costs one
    // extra column-pruned scan of the current slice, never a shuffle.
    // Already distinct: change keys are unique by contract and the
    // dimension has one current version per key, so no dedup pass (a
    // distinct here would be the plan's only exchange).
    val matchedKeys =
      j.filter(matched).select(keys.map(k => scol(k).as(k)): _*)
    val brandNew = changes
      .join(broadcast(matchedKeys), keys, "left_anti")
      .select(outCols.map { c =>
        if (c == effFrom) asOf.as(c)
        else if (c == effTo) lit(null).cast("timestamp").as(c)
        else if (c == isCurrent) lit(1).as(c)
        else if (changes.columns.contains(c)) col(c).as(c)
        else lit(null).as(c)
      }: _*)

    history.unionByName(keptOrClosed)
      .unionByName(reopened)
      .unionByName(brandNew)
  }
}
