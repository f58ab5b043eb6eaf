package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Production-size subword vocabularies for the `graft_subword` kernel.
  *
  * A real training pipeline loads a learned BPE/unigram merge table of
  * 32k–100k entries; this sandbox has no tokenizer artifacts, so
  * [[synthetic]] derives a deterministic stand-in of the same shape —
  * the letter statistics of English subwords (syllable-ish
  * consonant/vowel alternation, token lengths 2–10 skewed short,
  * shared prefixes so trie paths branch realistically). The point is
  * NOT linguistic fidelity; it is that the matcher's data structure is
  * exercised at production fan-out: ~32k tokens, thousands sharing
  * first characters, so a per-first-char linear scan would degrade and
  * a trie must not (SubwordPerfSpec holds the kernel to ≥ 10 MB/s per
  * core against this table).
  *
  * Deterministic across JVMs: `java.util.Random` is spec-pinned, and
  * insertion order is fixed — same seed, same vocabulary, always.
  */
object SubwordVocab {

  private val vowels = "aeiou"
  /** Frequency-skewed consonant pool: common letters repeat so the
    * generated tokens cluster on shared prefixes like a learned table
    * does. */
  private val consonants = "tttnnnsssrrrhhlldccmmffppggwwybbvkxqjz"
  private val clusters = Array(
    "th", "st", "ch", "sh", "tr", "pr", "pl", "gr", "br", "str", "nt",
    "nd", "ng", "ck", "sp", "cl", "fl", "sc", "wh", "qu")

  /** A deterministic BPE-ish merge table of `size` distinct tokens. */
  def synthetic(size: Int = 32768, seed: Long = 0x5eedL): Seq[String] = {
    val rnd = new java.util.Random(seed)
    val out = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(12)
    while (out.size < size) {
      sb.setLength(0)
      val syllables = 1 + rnd.nextInt(3)
      var k = 0
      while (k < syllables) {
        val r = rnd.nextInt(10)
        if (r < 4) sb.append(consonants.charAt(rnd.nextInt(consonants.length)))
        else if (r < 6) sb.append(clusters(rnd.nextInt(clusters.length)))
        sb.append(vowels.charAt(rnd.nextInt(vowels.length)))
        if (rnd.nextInt(3) == 0)
          sb.append(consonants.charAt(rnd.nextInt(consonants.length)))
        k += 1
      }
      if (sb.length() >= 2) out.add(sb.toString)
    }
    import scala.jdk.CollectionConverters._
    out.asScala.toSeq
  }

  /** Deterministic pseudo-text drawn from the same letter statistics,
    * for throughput measurement: `approxChars` characters of
    * whitespace-separated words whose interiors hit and miss the
    * synthetic vocab the way prose hits a learned one. */
  def syntheticText(approxChars: Int, seed: Long): String = {
    val rnd = new java.util.Random(seed)
    val sb = new java.lang.StringBuilder(approxChars + 16)
    while (sb.length() < approxChars) {
      val syllables = 1 + rnd.nextInt(4)
      var k = 0
      while (k < syllables) {
        val r = rnd.nextInt(10)
        if (r < 4) sb.append(consonants.charAt(rnd.nextInt(consonants.length)))
        else if (r < 6) sb.append(clusters(rnd.nextInt(clusters.length)))
        sb.append(vowels.charAt(rnd.nextInt(vowels.length)))
        if (rnd.nextInt(3) == 0)
          sb.append(consonants.charAt(rnd.nextInt(consonants.length)))
        k += 1
      }
      sb.append(if (rnd.nextInt(12) == 0) '\n' else ' ')
    }
    sb.toString
  }

  /** Vocabulary INDUCTION from the corpus: the top `size` character
    * n-grams (lengths nMin..nMax) by total positional frequency,
    * weighted by word occurrence — the frequency-ranked flavor of
    * subword learning (full BPE merges are inherently sequential; the
    * distributed part of EITHER scheme is this same word-count pass).
    *
    * Scale shape, the important part: the corpus is touched exactly
    * once, by the word-count aggregation (map-side-combined shuffle on
    * the word). Everything after — the n-gram explosion, the gram
    * aggregation, the top-K — runs over the word DICTIONARY, which is
    * vocabulary-sized (Heaps' law: ~millions of rows at 100 TB), not
    * corpus-sized. Ties rank deterministically (freq desc, gram asc),
    * so the result is engine-reproducible and oracle-checkable. */
  def induceNgramTable(df: DataFrame, textCol: String, size: Int,
                       nMin: Int = 2, nMax: Int = 5): DataFrame = {
    val words = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val grams = words.select(col("cnt"),
      explode(flatten(transform(sequence(lit(nMin), lit(nMax)), n =>
        when(length(col("w")) >= n,
          transform(sequence(lit(1), length(col("w")) - n + lit(1)),
            i => col("w").substr(i, n)))
          .otherwise(array().cast("array<string>"))))).as("gram"))
    grams.groupBy(col("gram"))
      .agg(sum(col("cnt")).as("freq"))
      .orderBy(col("freq").desc, col("gram"))
      .limit(size)
  }

  /** The induced table collected to a merge list for the
    * `graft_subword` kernel — bounded by `size`, same stance as
    * k-means centroids: the dictionary-sized model state is the one
    * thing that legitimately lives on the driver. */
  def induce(df: DataFrame, textCol: String, size: Int = 32768,
             nMin: Int = 2, nMax: Int = 5): Seq[String] =
    graft.plans.Materialize.modelState(
      induceNgramTable(df, textCol, size, nMin, nMax),
      s"induced subword vocabulary (limit $size rows)", size)
      .map(_.getString(0)).toSeq
}
