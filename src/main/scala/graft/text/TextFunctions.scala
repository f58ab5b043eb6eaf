package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a large-scale training-data pipeline:
  * tokenization, token counting, language ID, quality scoring, document
  * fingerprinting. All pure `functions._` compositions — codegen'd, no
  * UDFs — so they run inside whole-stage codegen at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens of the trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: word pieces + standalone punctuation —
    * the `\w+|[^\w\s]` regex both Java and RE2 agree on. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("\\w+|[^\\w\\s]"))

  /** Language-specific stopword hit counts (ASCII word-boundary regex,
    * identical semantics in Java regex and RE2). */
  val stopwordPatterns: Map[String, String] = Map(
    "en" -> "\\b(the|and|of|to|in|is)\\b",
    "es" -> "\\b(el|la|de|que|los|las)\\b",
    "de" -> "\\b(der|die|und|das|ist|nicht)\\b",
    "fr" -> "\\b(le|la|et|les|des|est)\\b")

  /** CJK character class (BMP unified ideographs). */
  val cjkPattern: String = "[\\x{4e00}-\\x{9fff}]"

  def stopwordHits(text: Column, lang: String): Column =
    regexp_count(lower(text), lit(stopwordPatterns(lang)))

  /** n-gram-heuristic language ID: any CJK → zh; otherwise the language
    * with the most stopword hits, first-wins in (en, es, de, fr) order;
    * no hits at all → 'und'. */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, "en")
    val es = stopwordHits(text, "es")
    val de = stopwordHits(text, "de")
    val fr = stopwordHits(text, "fr")
    when(regexp_count(text, lit(cjkPattern)) > 0, lit("zh"))
      .when(en === 0 && es === 0 && de === 0 && fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** The subword vocabulary for [[subwordStats]]: a BPE-ish merge
    * table of common English subwords and corpus-domain words, longest
    * matches taken greedily. ONE definition feeds both the native
    * expression and the DuckDB oracle's VALUES list, so the two greedy
    * walks can never drift onto different vocabularies. Order is
    * irrelevant (the kernel re-sorts longest-first per first char). */
  val subwordVocab: Seq[String] = Seq(
    "the", "ing", "tion", "ation", "ment", "ness", "able", "con", "com",
    "pro", "pre", "per", "and", "ent", "ion", "ter", "ate", "est", "ers",
    "an", "in", "on", "at", "or", "re", "er", "es", "en", "ed", "st",
    "ar", "al", "le", "it", "is", "to", "of", "ou", "th", "nd", "ve",
    "se", "ne", "de", "co", "ro", "ra", "ri", "li", "la", "ta", "ti",
    "ma", "me", "mo", "no", "ha", "he", "hi", "us", "un", "ur", "ut",
    "om", "ol", "el", "il", "ca", "ce", "ch", "ck", "da", "do", "wi",
    "wo", "ow", "sp", "str", "tr", "pl", "gr", "br", "bl", "cl", "fl",
    "sh", "batch", "spark", "data", "join", "merge", "stream", "window",
    "table", "group")

  /** Subword-token accounting: struct(n_words, n_subwords) per
    * document via the `graft_subword` native kernel — greedy
    * longest-match against [[subwordVocab]], one generated pass, no
    * UDF, no shuffle. Training pipelines budget in subword tokens;
    * `n_subwords / n_words` is also a cheap fertility signal (high →
    * vocabulary-miss-heavy text). */
  def subwordStats(text: Column): Column =
    call_function("graft_subword", text)

  /** Punctuation characters per character of text. */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[.,;:!?]")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  /** English stopwords per whitespace token. */
  def stopwordRatio(text: Column): Column =
    stopwordHits(text, "en").cast("double") /
      greatest(tokenCount(text).cast("double"), lit(1.0))

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column =
    length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
      greatest(tokenCount(text).cast("double"), lit(1.0))

  /** Composite quality score in [0,1]: length saturation, word-shape
    * sanity, low punctuation noise. Deterministic double arithmetic —
    * identical on any engine that follows IEEE 754. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val wordScore =
      when(avgTokenLen(text).between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    val punctScore = lit(1.0) - least(punctRatio(text) * lit(5.0), lit(1.0))
    round((lenScore + wordScore + punctScore) / lit(3.0), 4)
  }

  /** Content fingerprint: md5 over whitespace-normalized lowercased
    * text — the exact-dedup key that survives formatting noise. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** PII scrub patterns: (regex, replacement token), applied in order.
    * Conservative ASCII regexes with identical semantics in Java regex
    * and RE2, so any engine reproduces the scrub byte-for-byte. Email
    * first (its local part would otherwise partly match the phone
    * pattern's digit runs).
    *
    * The phone pattern is deliberately AGGRESSIVE: any ≥9-character run
    * of digits/spaces/dashes/parens masks, which also hits year ranges
    * ("2020-2021") and spaced number columns. For a training-data
    * hygiene pass that is the right side of the trade — over-masking a
    * digit run loses little signal; leaking a phone number is
    * unrecoverable. RE2 has no lookaround, so a more surgical pattern
    * cannot be expressed engine-portably. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+?\\d[\\d() -]{7,}\\d" -> "<PHONE>")

  /** Mask emails, IPv4 addresses and phone-like digit runs — the text
    * hygiene pass run before training text leaves the pipeline. Pure
    * codegen'd regexp_replace chain. */
  def scrubPII(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** How many PII spans a scrub of `text` would mask: one left-to-right
    * scan of the ordered pattern alternation over the RAW text. Counting
    * each pattern independently would double-count spans matching more
    * than one pattern (an email's digit run also looks phone-like), and
    * counting sentinel tokens in the scrubbed output would miscount
    * documents that already contain the literal string `<EMAIL>` etc.
    * Both Java regex and RE2 alternate leftmost-first, so the count is
    * engine-reproducible. */
  def piiCount(text: Column): Column =
    regexp_count(text, lit(piiPatterns.map(_._1).mkString("|")))
}
