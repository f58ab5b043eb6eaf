package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import graft.Tables

/** Text-EXTRACTION-stage operators — the steps a web-scale training
  * pipeline runs BEFORE any of the filter/dedup families see a
  * document: markup stripping (crawled pages arrive as HTML, not
  * prose), line-level quality rules (the C4 recipe drops individual
  * lines, not whole documents), and the hashing-trick featurizer that
  * turns cleaned text into a fixed-width vector without any trained
  * model. The reference has no extraction surface (its scope is
  * config-driven file ingestion, `/root/reference/modules/
  * etl_functions.py`); these extend the LLM-data battery upstream of
  * the existing scrub/quality/dedup stages. The corpus is synthetic
  * lowercase prose with no markup, so each fixture PLANTS the
  * structure it strips — deterministically from (doc_id, text) in
  * both engines, the established oracle stance.
  *
  * All three are map-side-dominant by construction: the HTML cleaner
  * is a codegen'd regexp/replace ladder (zero shuffles), the line
  * filter runs entirely in per-row array HOFs (zero shuffles), and
  * the featurizer's only shuffle is the map-combined (doc, bucket)
  * aggregation — the shapes that survive 100 TB unchanged.
  */
object ExtractionQueries {

  private val dims = 16

  val defs: Seq[(String, Q)] = Seq(

    // HTML text extraction — the first transform a crawl pipeline
    // applies: strip <script>/<style> blocks and comments WITH their
    // content, strip remaining tags, unescape the five core entities,
    // collapse whitespace; plus <title> field extraction (the metadata
    // a crawl record keeps). The fixture wraps every document in a
    // deterministic page (head/style/script with planted '<' and '"'
    // traps inside, heading, entity-bearing footer div) so every rule
    // fires on every row. The chain order is part of the contract:
    // blocks before tags (a tag-stripper alone would leak script
    // bodies into text), entities AFTER tags ('&lt;3' must not become
    // a tag), '&amp;' LAST (so '&amp;lt;' decodes to the literal
    // '&lt;', never twice). Every pattern is in the RE2-safe subset
    // both engines execute identically ((?s) + non-greedy, no
    // lookaround). Plan: one codegen'd map pass, no shuffle, no UDF —
    // at 100 TB this runs at scan speed next to the parquet reader.
    "q_html_strip" -> Q(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val html = concat(
          lit("<html><head><title>doc "), col("doc_id").cast("string"),
          lit("</title><style>p { color: red; }</style></head><body>"),
          lit("<script type=\"text/javascript\">if (1 < 2) { emit(\"x&y\"); }</script>"),
          lit("<h1>heading "), col("doc_id").cast("string"),
          lit("</h1><p class=\"body\">"), col("text"),
          lit("</p><!-- hidden comment --><div id=\"d1\">" +
            "tom &amp; jerry say &quot;hi&#39; &lt;3 &gt;</div></body></html>"))
        val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
        val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
        val noCmt = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
        val noTag = regexp_replace(noCmt, "<[^>]+>", " ")
        val unesc = replace(replace(replace(replace(replace(noTag,
          lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
          lit("&amp;"), lit("&"))
        val clean = trim(regexp_replace(unesc, "\\s+", " "))
        docs.select(col("doc_id"),
          regexp_extract(html, "<title>(.*?)</title>", 1).as("title"),
          length(html).as("n_raw"),
          length(clean).as("n_clean"),
          md5(clean).as("clean_fp"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH page AS (
             |  SELECT doc_id,
             |    '<html><head><title>doc ' || doc_id
             |    || '</title><style>p { color: red; }</style></head><body>'
             |    || '<script type="text/javascript">if (1 < 2) { emit("x&y"); }</script>'
             |    || '<h1>heading ' || doc_id || '</h1><p class="body">' || text
             |    || '</p><!-- hidden comment --><div id="d1">'
             |    || 'tom &amp; jerry say &quot;hi&#39; &lt;3 &gt;</div></body></html>'
             |      AS html
             |  FROM documents),
             |cleaned AS (
             |  SELECT doc_id, html,
             |    trim(regexp_replace(
             |      replace(replace(replace(replace(replace(
             |        regexp_replace(
             |        regexp_replace(
             |        regexp_replace(
             |        regexp_replace(html,
             |          '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
             |          '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
             |          '(?s)<!--.*?-->', ' ', 'g'),
             |          '<[^>]+>', ' ', 'g'),
             |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             |        '&#39;', ''''), '&amp;', '&'),
             |      '\s+', ' ', 'g')) AS clean
             |  FROM page)
             |SELECT doc_id,
             |  regexp_extract(html, '<title>(.*?)</title>', 1) AS title,
             |  CAST(length(html) AS INT) AS n_raw,
             |  CAST(length(clean) AS INT) AS n_clean,
             |  md5(clean) AS clean_fp
             |FROM cleaned
             |ORDER BY doc_id""".stripMargin)),

    // C4-style LINE-level filtering — the rules that drop individual
    // lines, not documents: a line survives only if it (a) carries no
    // boilerplate marker ('javascript', 'cookie'), (b) ends in
    // terminal punctuation, and (c) has ≥ 5 words. The corpus has no
    // line structure, so the fixture derives it: tokens chunk into
    // 8-word lines and each line draws one of five deterministic
    // decorations by (doc_id + line#) % 5 — boilerplate suffix,
    // terminal '.', bare (no punctuation), terminal '!', cookie
    // notice — so every rule fires and the short-tail case falls out
    // of the last chunk naturally. Attrition is attributed to the
    // FIRST failing rule in order boiler → punct → short (the
    // q_attrition convention) so the counts sum exactly to n_lines.
    // The whole operator is per-row array HOFs — construct, flag,
    // filter, rejoin — with ZERO shuffles: line filtering at 100 TB
    // is embarrassingly parallel and this plan keeps it that way
    // (the kept text re-fingerprints per doc, so the oracle pins the
    // rebuilt bytes, not just the counts).
    "q_line_filter" -> Q(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val base = docs.select(col("doc_id"),
          filter(split(trim(col("text")), "\\s+"),
            t => length(t) > 0).as("t"))
        val nl = ceil(size(col("t")).cast("double") / lit(8.0)).cast("int")
        def lineOf(i: org.apache.spark.sql.Column) = {
          val raw = array_join(slice(col("t"), i * 8 + 1, lit(8)), " ")
          val m = pmod(col("doc_id") + i, lit(5L))
          when(m === 0, concat(raw, lit(" javascript required to view")))
            .when(m === 1, concat(raw, lit(".")))
            .when(m === 2, raw)
            .when(m === 3, concat(raw, lit("!")))
            .otherwise(concat(raw,
              lit(" click here to accept our cookie policy.")))
        }
        val lines = when(size(col("t")) === 0,
          array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), nl - 1), lineOf(_)))
        def boiler(l: org.apache.spark.sql.Column) =
          l.contains("javascript") || l.contains("cookie")
        def punct(l: org.apache.spark.sql.Column) =
          substring(l, -1, 1).isin(".", "!", "?")
        def short_(l: org.apache.spark.sql.Column) =
          size(split(l, " ")) < 5
        val withLines = base.select(col("doc_id"), lines.as("lines"))
        withLines.select(col("doc_id"),
          size(col("lines")).as("n_lines"),
          size(filter(col("lines"), l => boiler(l))).as("n_boiler"),
          size(filter(col("lines"), l => !boiler(l) && !punct(l)))
            .as("n_nopunct"),
          size(filter(col("lines"), l => !boiler(l) && punct(l) && short_(l)))
            .as("n_short"),
          size(filter(col("lines"), l => !boiler(l) && punct(l) && !short_(l)))
            .as("n_kept"),
          md5(array_join(filter(col("lines"),
            l => !boiler(l) && punct(l) && !short_(l)), "\n")).as("clean_fp"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t0 AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> length(x) > 0) AS t
             |  FROM documents),
             |ln AS (
             |  SELECT doc_id,
             |    list_transform(range(0, CAST(ceil(len(t) / 8.0) AS INT)),
             |      i -> CASE CAST((doc_id + i) % 5 AS INT)
             |        WHEN 0 THEN array_to_string(t[i*8+1 : i*8+8], ' ')
             |          || ' javascript required to view'
             |        WHEN 1 THEN array_to_string(t[i*8+1 : i*8+8], ' ') || '.'
             |        WHEN 2 THEN array_to_string(t[i*8+1 : i*8+8], ' ')
             |        WHEN 3 THEN array_to_string(t[i*8+1 : i*8+8], ' ') || '!'
             |        ELSE array_to_string(t[i*8+1 : i*8+8], ' ')
             |          || ' click here to accept our cookie policy.'
             |        END) AS lines
             |  FROM t0)
             |SELECT doc_id,
             |  CAST(len(lines) AS INT) AS n_lines,
             |  CAST(len(list_filter(lines, l ->
             |    l LIKE '%javascript%' OR l LIKE '%cookie%')) AS INT)
             |    AS n_boiler,
             |  CAST(len(list_filter(lines, l ->
             |    NOT (l LIKE '%javascript%' OR l LIKE '%cookie%')
             |    AND right(l, 1) NOT IN ('.', '!', '?'))) AS INT)
             |    AS n_nopunct,
             |  CAST(len(list_filter(lines, l ->
             |    NOT (l LIKE '%javascript%' OR l LIKE '%cookie%')
             |    AND right(l, 1) IN ('.', '!', '?')
             |    AND len(string_split(l, ' ')) < 5)) AS INT) AS n_short,
             |  CAST(len(list_filter(lines, l ->
             |    NOT (l LIKE '%javascript%' OR l LIKE '%cookie%')
             |    AND right(l, 1) IN ('.', '!', '?')
             |    AND len(string_split(l, ' ')) >= 5)) AS INT) AS n_kept,
             |  -- DuckDB's array_to_string yields NULL on an empty list
             |  -- where Spark's array_join yields '' — pin the '' form
             |  md5(coalesce(array_to_string(list_filter(lines, l ->
             |    NOT (l LIKE '%javascript%' OR l LIKE '%cookie%')
             |    AND right(l, 1) IN ('.', '!', '?')
             |    AND len(string_split(l, ' ')) >= 5), chr(10)), '')) AS clean_fp
             |FROM ln
             |ORDER BY doc_id""".stripMargin)),

    // Hashing-trick document featurizer — the model-free text→vector
    // bridge (Weinberger et al. 2009, the Vowpal Wabbit input layer):
    // each token hashes to one of 16 signed buckets (bucket = h mod
    // 16, sign from the next hash bit — the signed variant that makes
    // collisions cancel in expectation), per-doc bucket sums form the
    // feature vector. Integer votes, so the result is EXACT under any
    // partitioning. The reduction is 16 conditional sums per doc —
    // compile-time-bounded aggregate state in one codegen'd
    // HashAggregate with map-side combine (the q_pref_pairs /
    // q_label_vote stance: never a collect_list). One shuffle total;
    // at production dims (2^18) the same operator keeps the (doc, j,
    // v) relation long-form and feeds the existing vector family
    // instead of widening the aggregate — the 16-wide form here pins
    // the arithmetic. Vector emitted array_join'd (scalar-only output
    // contract); l1 and nnz are the norms a downstream consumer gates
    // on.
    "q_hash_embed" -> Q(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          explode(filter(split(trim(col("text")), "\\s+"),
            t => length(t) > 0)).as("tok"))
        val h = graft.text.Dedup.md5Hash60(concat(lit("fh:"), col("tok")))
        val feat = toks.select(col("doc_id"),
          pmod(h, lit(dims.toLong)).as("j"),
          when(pmod(shiftright(h, 4), lit(2L)) === 0, 1L)
            .otherwise(-1L).as("sgn"))
        val vCols = (0 until dims).map(k =>
          sum(when(col("j") === k, col("sgn")).otherwise(0L)).as(s"v$k"))
        val agg = feat.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tok"), vCols: _*)
        val vec = concat_ws(" ", (0 until dims).map(k => col(s"v$k")): _*)
        val l1 = (0 until dims).map(k => abs(col(s"v$k"))).reduce(_ + _)
        val nnz = (0 until dims)
          .map(k => when(col(s"v$k") =!= 0L, 1).otherwise(0)).reduce(_ + _)
        agg.select(col("doc_id"), col("n_tok"), vec.as("vec"),
          l1.as("l1"), nnz.as("nnz"))
          .orderBy(col("doc_id"))
      },
      Some {
        val vs = (0 until dims).map(k =>
          s"CAST(sum(CASE WHEN j = $k THEN sgn ELSE 0 END) AS BIGINT) AS v$k")
          .mkString(",\n    ")
        val vecSql = (0 until dims).map(k => s"v$k").mkString(", ")
        val l1Sql = (0 until dims).map(k => s"abs(v$k)").mkString(" + ")
        val nnzSql = (0 until dims)
          .map(k => s"(CASE WHEN v$k <> 0 THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH t0 AS (
           |  SELECT doc_id,
           |    list_filter(string_split_regex(trim(text), '\\s+'),
           |      x -> length(x) > 0) AS t
           |  FROM documents),
           |tok AS (SELECT doc_id, unnest(t) AS tok FROM t0),
           |h AS (
           |  SELECT doc_id,
           |    ('0x' || substr(md5('fh:' || tok), 1, 15))::BIGINT AS h
           |  FROM tok),
           |f AS (
           |  SELECT doc_id, h % $dims AS j,
           |    CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END AS sgn
           |  FROM h),
           |v AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
           |    $vs
           |  FROM f GROUP BY doc_id)
           |SELECT doc_id, n_tok,
           |  concat_ws(' ', $vecSql) AS vec,
           |  CAST($l1Sql AS BIGINT) AS l1,
           |  CAST($nnzSql AS INT) AS nnz
           |FROM v
           |ORDER BY doc_id""".stripMargin
      }),

    // Content-level PII scrub — the redaction pass a released corpus
    // gets BEFORE training (distinct from the reference's column-level
    // masking fork, which protects known schema fields; this finds PII
    // embedded in free text): per-document match counts per category
    // plus the redacted text's fingerprint. Patterns live in the
    // RE2-safe subset both engines run identically (explicit character
    // classes and counted repeats — no \d, \b or lookaround), and the
    // replace chain order is part of the contract: email first, then
    // SSN, then phone — SSN and phone shapes share digit-dash
    // structure, so a fixed order is what makes the composition
    // deterministic (both engines scan leftmost, non-overlapping).
    // Plan: one codegen'd map pass at scan speed, no shuffle but the
    // final count rollup; the fixture plants all three categories on
    // 20 docs so every pattern fires on every run.
    "q_pii_scrub" -> Q(
      (s, dir) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
        val ssn = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
        val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            when(col("doc_id") < 20,
              concat(col("text"),
                lit(" contact user"), col("doc_id").cast("string"),
                lit("@example.com or 555-123-4567 ssn 123-45-6789")))
              .otherwise(col("text")).as("text"))
        val redacted = regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), email, "[EMAIL]"),
            ssn, "[SSN]"),
          phone, "[PHONE]")
        val perDoc = docs.select(col("doc_id"),
          regexp_count(col("text"), lit(email)).cast("long").as("n_email"),
          regexp_count(regexp_replace(col("text"), email, "[EMAIL]"),
            lit(ssn)).cast("long").as("n_ssn"),
          regexp_count(regexp_replace(
              regexp_replace(col("text"), email, "[EMAIL]"), ssn, "[SSN]"),
            lit(phone)).cast("long").as("n_phone"),
          md5(redacted).as("redacted_fp"))
        perDoc.filter(col("n_email") + col("n_ssn") + col("n_phone") > 0)
          .orderBy(col("doc_id"))
      },
      Some("""WITH planted AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id < 20
             |      THEN text || ' contact user' || doc_id
             |        || '@example.com or 555-123-4567 ssn 123-45-6789'
             |      ELSE text END AS text
             |  FROM documents),
             |scrub AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(text,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+'))
             |      AS BIGINT) AS n_email,
             |    regexp_replace(text,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+',
             |      '[EMAIL]', 'g') AS t1
             |  FROM planted),
             |s2 AS (
             |  SELECT doc_id, n_email,
             |    CAST(len(regexp_extract_all(t1, '[0-9]{3}-[0-9]{2}-[0-9]{4}'))
             |      AS BIGINT) AS n_ssn,
             |    regexp_replace(t1, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '[SSN]', 'g')
             |      AS t2
             |  FROM scrub),
             |s3 AS (
             |  SELECT doc_id, n_email, n_ssn,
             |    CAST(len(regexp_extract_all(t2, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))
             |      AS BIGINT) AS n_phone,
             |    regexp_replace(t2, '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]',
             |      'g') AS t3
             |  FROM s2)
             |SELECT doc_id, n_email, n_ssn, n_phone, md5(t3) AS redacted_fp
             |FROM s3
             |WHERE n_email + n_ssn + n_phone > 0
             |ORDER BY doc_id""".stripMargin))
  )
}
