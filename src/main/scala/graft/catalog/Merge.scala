package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO as a pure DataFrame transform.
  *
  * The reference issues five Delta `MERGE INTO` statements
  * (modules/insert_config.py:146-161, 202-270, 301-345, 379-426,
  * 443-468), including the `WHEN NOT MATCHED BY SOURCE THEN UPDATE`
  * soft-retire branch. Spark-on-parquet has no DML, so the kernel
  * re-expresses MERGE as a single full-outer join + projection:
  *
  *  - matched (key in both):      apply `whenMatchedUpdate` over target
  *  - not matched (source only):  insert source row (if enabled)
  *  - not matched by source:      apply `whenNotMatchedBySourceSet`
  *
  * Scale notes: a full-outer join shuffles both sides on the merge key —
  * that is unavoidable for NOT-MATCHED-BY-SOURCE semantics (every target
  * row must be observed) and is exactly what Delta's own MERGE does.
  * Without that clause, callers should use [[upsertOnly]], which keeps
  * the small side broadcastable (left join + anti-union). Nothing here
  * ever collects to the driver.
  */
object Merge {

  /** Reference a source-side column inside update/insert expressions. */
  def src(c: String): Column = col(s"__s.$c")

  /** Reference a target-side column inside update expressions. */
  def tgt(c: String): Column = col(s"__t.$c")

  /** Full MERGE with all three clause families.
    *
    * @param target  current table contents
    * @param source  staging rows
    * @param keys    equi-join merge keys (1 key for header/job, 2 for
    *                column config — insert_config.py:205,304)
    * @param whenMatchedUpdate   columns rewritten when the key matches;
    *                            unlisted columns keep the target value
    * @param whenNotMatchedInsert  insert source rows with no target match;
    *                              unlisted target columns default where
    *                              provided, else carry the source value
    * @param insertDefaults  overrides for inserted rows (audit stamps)
    * @param whenNotMatchedBySourceSet  columns rewritten for target rows
    *                            with no source match (soft-retire); empty
    *                            map = leave those rows untouched
    * @param requireUniqueSourceKeys  fail the job (exactly Delta's
    *                            multiple-match error) when two source rows
    *                            share a merge key AND match a target row,
    *                            instead of silently fanning out that
    *                            target row; duplicate keys that match no
    *                            target (NULL keys included) insert
    *                            normally. The check is a window count
    *                            folded into the merge's own scan — no
    *                            extra job — but it shuffles the source
    *                            side, so it is opt-in.
    *
    * Keys join with PLAIN equality, exactly like Delta MERGE: a
    * NULL-keyed source row never matches a NULL-keyed target row — it
    * inserts, and the NULL-keyed target row takes the BY SOURCE branch.
    */
  def merge(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      whenMatchedUpdate: Map[String, Column],
      whenNotMatchedInsert: Boolean = true,
      insertDefaults: Map[String, Column] = Map.empty,
      whenNotMatchedBySourceSet: Map[String, Column] = Map.empty,
      requireUniqueSourceKeys: Boolean = false): DataFrame = {
    val outCols = target.columns.toSeq
    val t = target.withColumn("__tpresent", lit(true)).alias("__t")
    val s0 = source.withColumn("__spresent", lit(true))
    val s = (if (requireUniqueSourceKeys)
      s0.withColumn("__scnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)))
    else s0).alias("__s")
    val joinCond = keys.map(k => tgt(k) === src(k)).reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")

    val matched = col("__t.__tpresent").isNotNull && col("__s.__spresent").isNotNull
    val sourceOnly = col("__t.__tpresent").isNull

    val projected = outCols.map { c =>
      val fromSource =
        if (source.columns.contains(c)) insertDefaults.getOrElse(c, src(c))
        else insertDefaults.getOrElse(c, lit(null))
      val matchedVal = whenMatchedUpdate.getOrElse(c, tgt(c))
      val notBySourceVal =
        if (whenNotMatchedBySourceSet.isEmpty) tgt(c)
        else whenNotMatchedBySourceSet.getOrElse(c, tgt(c))
      when(matched, matchedVal)
        .when(sourceOnly, fromSource)
        .otherwise(notBySourceVal)
        .as(c)
    }
    val withInsertFilter =
      if (whenNotMatchedInsert) joined
      else joined.filter(!sourceOnly)
    // Delta's multiple-match error fires only when duplicate source rows
    // MATCH a target row (fan-out); duplicate keys that match nothing —
    // including NULL keys, which never match under === — all insert,
    // exactly like Delta's WHEN NOT MATCHED.
    val guarded =
      if (requireUniqueSourceKeys)
        withInsertFilter.filter(
          when(matched && col("__s.__scnt") > 1, raise_error(
            concat(lit("MERGE: duplicate source rows for key ("),
              concat_ws(",", keys.map(k => src(k).cast("string")): _*), lit(")"))))
            .otherwise(lit(true)))
      else withInsertFilter
    guarded.select(projected: _*)
  }

  /** Insert-only MERGE (status seed, insert_config.py:146-161): keep all
    * target rows, add source rows whose key is absent. Left-anti keeps
    * the target side shuffle-free when the source is broadcastable. */
  def insertWhenNotMatched(
      target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val missing = source.join(target.select(keys.map(col): _*), keys, "left_anti")
    target.unionByName(missing.select(target.columns.map(c =>
      if (missing.columns.contains(c)) col(c) else lit(null).as(c)): _*))
  }

  /** Update+insert MERGE without the BY SOURCE clause: expressed as the
    * union of (target rows not in source) and (source-driven rows), so
    * the target side needs no full-outer shuffle when source is small.
    *
    * Both inputs are consumed by TWO branches (anti + semi/merge). When
    * either side is an expensive derivation rather than a table scan —
    * e.g. a per-batch partial aggregate feeding incremental-view
    * maintenance — persist it first, or the derivation re-evaluates per
    * branch; a stored table pays only a second (column-pruned) scan. */
  def upsertOnly(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      whenMatchedUpdate: Map[String, Column],
      insertDefaults: Map[String, Column] = Map.empty): DataFrame = {
    val untouched = target.join(source.select(keys.map(col): _*), keys, "left_anti")
    val merged = merge(
      target.join(source.select(keys.map(col): _*), keys, "left_semi"),
      source, keys, whenMatchedUpdate, whenNotMatchedInsert = true,
      insertDefaults = insertDefaults)
    untouched.unionByName(merged)
  }
}
