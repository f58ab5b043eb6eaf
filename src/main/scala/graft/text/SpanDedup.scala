package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-substring removal — the ExactSubstr pass of
  * "Deduplicating Training Data Makes Language Models Better" (Lee et
  * al., 2022): any token span that occurs more than once ACROSS the
  * corpus (boilerplate, licenses, templated paragraphs, self-repeats)
  * is excised from every occurrence, not just deduplicated at document
  * granularity.
  *
  * Distributable form: instead of the paper's single-machine suffix
  * array, every w-token gram START POSITION is marked when its gram's
  * corpus-wide occurrence count is ≥ 2; marked starts closer than w
  * tokens chain into one span (gaps-and-islands — the transitive
  * closure of overlapping [p, p+w) intervals), and the merged spans
  * are cut from the token stream. Every repeated run of ≥ w tokens is
  * recovered exactly (each of its gram starts repeats corpus-wide);
  * runs shorter than w are below the detection window, the same
  * threshold role the paper's minimum match length plays.
  *
  * Scale shape: the positional gram relation is one row per token —
  * corpus-sized, the irreducible cost of exact-substring dedup — but
  * it carries only (doc id, pos, hash64): the text never shuffles. The
  * occurrence count is one map-combined aggregate over gram hashes;
  * marked positions come back via an equi-join on the hash; the span
  * merge is a per-document window (documents bound the partitions);
  * excision is a map-side HOF filter of the token array against the
  * doc's (tiny) span list. Nothing is quadratic; at 100 TB the gram
  * relation shuffle dominates, exactly as the suffix-array sort does
  * in the reference implementation.
  *
  * Hashes use the md5-60 portable hash so another engine can replay
  * position marking bit-for-bit (64-bit collisions could merge two
  * distinct grams — P ≈ (corpus grams)²·2⁻⁶⁰ corpus-wide, vanishing,
  * and identical under replay since the hash is shared). */
object SpanDedup {

  /** Merged repeated spans per document: (doc_id, span_start, span_end)
    * with 1-based token positions, end exclusive. */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    w: Int = 5): DataFrame = {
    val grams = positionalGrams(df, idCol, textCol, w)
    // corpus-wide occurrence count ≥ 2 marks a repeated gram — TOTAL
    // occurrences, so a doc repeating its own paragraph is caught too
    val dup = grams.groupBy(col("gh")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select(col("gh"))
    val marked = grams.join(dup, Seq("gh"), "left_semi")
      .select(col("id"), col("pos"))
    mergeSpans(marked, idCol, w)
  }

  /** Spans of `df` matching ANY w-gram of the REFERENCE relation —
    * span-level decontamination: where the document-granular pass
    * ([[graft.text.Decontaminate]]) flags or drops a whole document
    * that overlaps an eval benchmark, this excises just the
    * contaminated spans and keeps the rest of the document in the
    * training mix. Marking is a semi join against the reference's
    * DISTINCT gram hashes — eval suites are small, so that relation
    * broadcasts and marking is map-side; everything downstream (island
    * merge, excision) is the [[repeatedSpans]] machinery. */
  def matchingSpans(df: DataFrame, idCol: String, textCol: String,
                    ref: DataFrame, refIdCol: String, refTextCol: String,
                    w: Int = 5): DataFrame = {
    val refGrams = positionalGrams(ref, refIdCol, refTextCol, w)
      .select(col("gh")).distinct()
    val marked = positionalGrams(df, idCol, textCol, w)
      .join(refGrams, Seq("gh"), "left_semi")
      .select(col("id"), col("pos"))
    mergeSpans(marked, idCol, w)
  }

  /** Transitive merge of overlapping [pos, pos+w) intervals per doc:
    * a new island starts where the gap to the previous marked start
    * is ≥ w. */
  private def mergeSpans(marked: DataFrame, idCol: String,
                         w: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    marked
      .withColumn("__brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) >= w, 1)
          .otherwise(0))
      .withColumn("__isl",
        sum(col("__brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("id"), col("__isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + w).as("span_end"))
      .select(col("id").as(idCol), col("span_start"), col("span_end"))
  }

  /** Documents with their repeated spans excised: every token whose
    * 1-based position falls inside a merged span is dropped and the
    * rest re-joined with single spaces (whitespace normalizes, like
    * every rebuild in this family). Output: idCol, `deduped_text`,
    * `n_spans`, `n_removed` (tokens cut), plus `carryCols`. */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          w: Int = 5,
                          carryCols: Seq[String] = Nil): DataFrame =
    excise(df, repeatedSpans(df, idCol, textCol, w), idCol, textCol, carryCols)

  /** [[matchingSpans]] applied: documents with every benchmark-matching
    * span excised. Same output contract as [[removeRepeatedSpans]]. */
  def removeMatchingSpans(df: DataFrame, idCol: String, textCol: String,
                          ref: DataFrame, refIdCol: String,
                          refTextCol: String, w: Int = 5,
                          carryCols: Seq[String] = Nil): DataFrame =
    excise(df, matchingSpans(df, idCol, textCol, ref, refIdCol, refTextCol, w),
      idCol, textCol, carryCols)

  private def excise(df: DataFrame, spanRows: DataFrame, idCol: String,
                     textCol: String, carryCols: Seq[String]): DataFrame = {
    val spans = spanRows
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    df.join(spans, Seq(idCol), "left")
      .select((col(idCol) +: coalesce(col("__spans"),
          array().cast("array<struct<span_start:long,span_end:long>>"))
          .as("__spans") +:
        TextFunctions.tokens(col(textCol)).as("__toks") +:
        carryCols.map(col)): _*)
      .select((col(idCol) +:
        array_join(filter(col("__toks"), (t, i) =>
          !exists(col("__spans"), s =>
            i + 1 >= s.getField("span_start") && i + 1 < s.getField("span_end"))),
          " ").as("deduped_text") +:
        size(col("__spans")).cast("long").as("n_spans") +:
        aggregate(col("__spans"), lit(0L),
          (acc, s) => acc + s.getField("span_end") - s.getField("span_start"))
          .as("n_removed") +:
        carryCols.map(col)): _*)
  }

  /** One row per gram START: (id, pos 1-based, md5-60 hash of the
    * space-joined w-gram). No distinct — POSITIONS are the point. */
  private def positionalGrams(df: DataFrame, idCol: String,
                              textCol: String, w: Int): DataFrame =
    df.select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("id"), posexplode(
        when(size(col("__toks")) >= w,
          transform(sequence(lit(1), size(col("__toks")) - lit(w - 1)),
            i => Dedup.md5Hash60(
              concat_ws(" ", slice(col("__toks"), i, lit(w))))))
          .otherwise(array().cast("array<bigint>"))))
      .select(col("id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("gh"))
}
