package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SubwordTokenCount
import graft.text.SubwordVocab

/** Proves the subword kernel at production vocabulary size: 32k merge
  * entries (vs the 92-token oracle vocab), trie-matched. Correctness
  * first — the trie walk must agree with the transparent
  * longest-first linear scan on the big table — then throughput: the
  * kernel must sustain ≥ 10 MB/s on one core, the floor below which a
  * 100 TB corpus pass stops being a tokenization-bound day job and
  * becomes the bottleneck. (A per-first-char linear scan fails this by
  * an order of magnitude at 32k tokens; that is why the trie exists.)
  */
class SubwordPerfSpec extends AnyFunSuite {

  private val bigVocab = SubwordVocab.synthetic(32768, 0x5eedL)

  private def kernel(vocab: Seq[String]) =
    SubwordTokenCount(org.apache.spark.sql.catalyst.expressions.Literal("x"), vocab)

  test("synthetic vocab is the contracted shape") {
    assert(bigVocab.size === 32768)
    assert(bigVocab.distinct.size === bigVocab.size)
    assert(bigVocab.forall(t => t.length >= 2 && !t.exists(Character.isWhitespace)))
    // production fan-out: first characters must be heavily shared or
    // the trie is not being exercised any harder than the 92-token table
    val maxBucket = bigVocab.groupBy(_.charAt(0)).values.map(_.size).max
    assert(maxBucket > 1000, s"largest first-char bucket only $maxBucket")
    // determinism across invocations
    assert(SubwordVocab.synthetic(32768, 0x5eedL) === bigVocab)
  }

  /** Slow transparent reference: longest-first scan over the whole
    * vocab at each position — O(|V|) per step but unarguably the
    * greedy longest-match semantics. */
  private def refCounts(vocab: Array[String], text: String): (Long, Long) = {
    val byLen = vocab.sortBy(-_.length)
    val words = text.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    var toks = 0L
    words.foreach { w =>
      var i = 0
      while (i < w.length) {
        byLen.find(t => w.startsWith(t, i)) match {
          case Some(t) => i += t.length
          case None => i += 1
        }
        toks += 1
      }
    }
    (words.length.toLong, toks)
  }

  test("trie matches the linear reference on the 32k vocab") {
    val k = kernel(bigVocab)
    // a modest sample is enough: the reference scan is O(|V|) per char
    val sample = bigVocab.take(500).toArray
    val rnd = new java.util.Random(7)
    (0 until 40).foreach { i =>
      val text = SubwordVocab.syntheticText(400 + rnd.nextInt(400), 1000L + i)
      val row = k.compute(org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val (rw, rt) = refCounts(bigVocab.toArray, text)
      assert(row.getLong(0) === rw, s"words, case $i")
      assert(row.getLong(1) === rt, s"subwords, case $i")
    }
    // vocab tokens themselves must match exactly (best == full length)
    sample.foreach { t =>
      val row = k.compute(org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(row.getLong(0) === 1L, t)
    }
  }

  test("kernel sustains >= 10 MB/s/core on the 32k vocab") {
    val k = kernel(bigVocab)
    val docs = (0 until 256).map(i =>
      org.apache.spark.unsafe.types.UTF8String.fromString(
        SubwordVocab.syntheticText(64 * 1024, 9000L + i))).toArray
    val bytes = docs.map(_.numBytes.toLong).sum
    def pass(): Long = {
      var acc = 0L
      var i = 0
      while (i < docs.length) { acc += k.compute(docs(i)).getLong(1); i += 1 }
      acc
    }
    val warm = pass() // JIT warm-up, also sanity: tokens came out
    assert(warm > 0L)
    val t0 = System.nanoTime()
    val res = pass()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(res === warm)
    val mbps = bytes / 1e6 / sec
    info(f"subword kernel: ${bytes / 1e6}%.1f MB in $sec%.3f s = $mbps%.1f MB/s (1 core)")
    assert(mbps >= 10.0, f"kernel too slow: $mbps%.1f MB/s < 10 MB/s")
  }
}
