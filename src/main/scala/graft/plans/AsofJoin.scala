package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time (as-of) join: attach to every left row the single right
  * row with the nearest timestamp at-or-before it (backward) or
  * at-or-after it (forward), within the same key group — the lookup a
  * training-data pipeline does to join events against the latest
  * dimension snapshot, price tick, or model-version row.
  *
  * Spark has no built-in as-of join; the naive encodings are a range
  * join (O(n·m) row expansion) or a per-key correlated subquery. This
  * implementation is the scalable union+window formulation:
  *
  *   1. union left and right rows into one relation tagged by side,
  *   2. one shuffle: partition by key, sort by (ts, side),
  *   3. a running `last(right_payload, ignoreNulls)` window carries the
  *      most recent right row forward onto each left row,
  *   4. keep the left rows.
  *
  * Cost at 100 TB: exactly one shuffle of (|left| + |right|) rows — the
  * same as any equi-join on the key — with zero row expansion and a
  * per-partition sort. No cartesian, no interval explosion; skewed keys
  * behave like any windowed aggregate (hot key → one sorted run).
  *
  * Tie semantics: a right row at exactly the left timestamp matches
  * (inclusive, like DuckDB `ASOF JOIN ON l.ts >= r.ts`). Right rows must
  * be unique per (key, ts) — pre-aggregate otherwise — or the winner
  * among duplicates is unspecified.
  *
  * Unmatched left rows are kept with null right columns (left-outer
  * semantics, like `ASOF LEFT JOIN`).
  */
object AsofJoin {

  /** Most recent right row at-or-before each left row's timestamp.
    * `tolerance` (an interval literal like "5 minutes") bounds the
    * staleness: a match older than leftTs - tolerance is discarded —
    * the row keeps left-outer nulls instead of a stale lookup. */
  def backward(left: DataFrame, right: DataFrame,
               key: String, leftTs: String, rightTs: String,
               tolerance: Option[String] = None): DataFrame =
    asof(left, right, key, leftTs, rightTs, forward = false, tolerance)

  /** Earliest right row at-or-after each left row's timestamp;
    * `tolerance` bounds how far into the future the match may be. */
  def forward(left: DataFrame, right: DataFrame,
              key: String, leftTs: String, rightTs: String,
              tolerance: Option[String] = None): DataFrame =
    asof(left, right, key, leftTs, rightTs, forward = true, tolerance)

  private def asof(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, forward: Boolean,
                   tolerance: Option[String] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(_ == key).toSeq
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left: ${collisions.mkString(", ")} — rename before joining")
    val payloadType = StructType(right.schema.fields.filterNot(_.name == key))

    // One relation, both sides. Right rows carry their payload as a single
    // non-null struct (so a legitimately-null payload field can't make the
    // ignoreNulls window skip past the row); left rows carry null. A right
    // row with a NULL timestamp can never be "at or before/after" anything
    // (ASOF comparison semantics) — drop it rather than letting it sort to
    // an end and shadow real matches.
    val leftSide = left.select(
      left.columns.map(col).toSeq ++ Seq(
        col(leftTs).as("__asof_ts"),
        // The scan order below puts right before left at equal timestamps,
        // so ties are inclusive in both directions.
        lit(1).as("__asof_side"),
        lit(null).cast(payloadType).as("__asof_payload")): _*)
    val rightSide = right.filter(col(rightTs).isNotNull).select(
      left.schema.fields.map { f =>
        if (f.name == key) col(key) else lit(null).cast(f.dataType).as(f.name)
      }.toSeq ++ Seq(
        col(rightTs).as("__asof_ts"),
        lit(0).as("__asof_side"),
        struct(payloadCols.map(col): _*).as("__asof_payload")): _*)

    // Both directions use the INCREMENTAL running frame
    // [unboundedPreceding, currentRow] + last(ignoreNulls) — O(n) per key.
    // Backward scans time ascending; forward scans time DESCENDING, where
    // "most recently seen right row" is exactly the earliest at-or-after
    // match. (first() over [currentRow, unboundedFollowing] computes the
    // same thing but re-aggregates the whole suffix per row — O(n²) on a
    // hot key.) NULL left timestamps sort to the START of the scan in
    // both directions (nulls_first) — before any right row has been
    // seen — so they match nothing, like the SQL comparison would.
    val (tsOrder, sideOrder) =
      if (forward) (col("__asof_ts").desc_nulls_first, col("__asof_side").asc)
      else (col("__asof_ts").asc_nulls_first, col("__asof_side").asc)
    val frame = Window.partitionBy(col(key)).orderBy(tsOrder, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // bind the window result through a NAMED column so the tolerance
    // check reads it instead of re-evaluating the window expression
    val matched = leftSide.unionByName(rightSide)
      .withColumn("__asof_raw",
        last(col("__asof_payload"), ignoreNulls = true).over(frame))
    // tolerance: discard a match whose timestamp is farther from the
    // left row than the interval — the row reverts to left-outer nulls.
    // Evaluated on the matched struct's own ts field, so it composes
    // with the single-window plan (still no join node).
    // getField, not col("a.b") string parsing: a payload column whose
    // NAME contains a dot must never be misread as nested access
    val matchCol = tolerance match {
      case None => col("__asof_raw")
      case Some(tol) =>
        val iv = expr(s"INTERVAL $tol")
        val matchedTs = col("__asof_raw").getField(rightTs)
        if (forward)
          when(matchedTs <= col("__asof_ts") + iv, col("__asof_raw"))
        else
          when(matchedTs >= col("__asof_ts") - iv, col("__asof_raw"))
    }

    matched
      .withColumn("__asof_match", matchCol)
      .filter(col("__asof_side") === 1)
      .select(left.columns.map(col).toSeq ++
        payloadCols.map(c => col("__asof_match").getField(c).as(c)): _*)
  }
}
