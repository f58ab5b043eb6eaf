package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.text.Dedup

/** Streaming near-duplicate detection: the LSH signature index as
  * STREAM STATE.
  *
  * The batch near-dup path ([[graft.text.Dedup.candidatePairs]])
  * materializes a signature relation and self-joins it — the whole
  * corpus at once. The streaming form is what an INGESTION pipeline
  * runs instead: every arriving document is MinHash-signed, exploded
  * into its LSH band buckets, and each bucket's accumulated membership
  * (every earlier document that hashed there, held in the state store)
  * is the index the newcomer is checked against. A pair that lands in
  * the same bucket across micro-batches is found the moment its second
  * member arrives — no batch-wide self-join ever runs.
  *
  * Determinism: candidate pairs are emitted as unordered (min, max) id
  * pairs, once per bucket, when the LATER member arrives (within a
  * batch, members are processed in id order). The emitted pair SET is
  * therefore exactly "all same-bucket pairs whose estimated Jaccard
  * clears the pre-filter" — independent of how documents are split
  * into micro-batches — which is what lets a batch oracle replay it.
  * Redelivery-safe: an id already in the bucket's membership is
  * skipped, so a replayed file emits nothing new.
  *
  * Precision is NOT decided here: like the batch path, the estimate
  * only pre-filters (same 4σ margin as
  * [[graft.text.Dedup.verifiedNearDuplicates]]); callers pipe the
  * emitted candidates through
  * [[graft.text.Dedup.verifyPairsJaccard]] for the exact w-gram
  * Jaccard — the streaming index decides recall only.
  *
  * Scale shape (the 100 TB story): state per bucket is its member
  * list — (id, k-slot signature), ~0.5 KB per membership at k = 64,
  * `bands` memberships per document, independent of document size (the
  * text itself never enters state, and never shuffles past the
  * signing map stage). Bucket membership is the same relation the
  * batch path self-joins, held incrementally; a year-long corpus run
  * backs it with the RocksDB state store and compacts via snapshots.
  * Per-bucket comparison cost is bounded exactly like the batch
  * self-join fan-out: a bucket only grows past a handful of members
  * where real duplicate mass exists. A pathological boilerplate bucket
  * (the stop-gram analogue) is capped by `maxBucket`: buckets at the
  * cap stop indexing new members — mirroring the batch path's
  * stop-gram df cap, which likewise trades recall on boilerplate
  * collisions for bounded fan-out. */
object StreamNearDup {

  /** One document's membership in one band bucket. */
  final case class BucketDoc(band: Int, bh: Long, doc_id: Long, sig: Array[Long])

  /** Unordered candidate pair, id_a < id_b. */
  final case class CandidatePair(id_a: Long, id_b: Long)

  /** Bucket state: accumulated members (id + signature). */
  final case class Member(id: Long, sig: Array[Long])

  /** Agreement fraction of two k-slot signatures — the JVM mirror of
    * the codegen'd `graft_sig_agreement` expression (equal slots / k),
    * used on the state side where values are already deserialized. */
  private def agreement(a: Array[Long], b: Array[Long]): Double = {
    val n = math.min(a.length, b.length)
    var eq = 0
    var i = 0
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    if (a.length == 0) 0.0 else eq.toDouble / a.length
  }

  /** Candidate pairs over a STREAMING (idCol, textCol) relation.
    * Emits every same-bucket pair whose estimated Jaccard clears
    * `threshold - 2/√k` (the 4σ pre-filter), as append-mode output.
    * Follow with [[graft.text.Dedup.verifyPairsJaccard]] on the
    * corresponding batch relation for exact precision. */
  def candidateStream(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.7, w: Int = 3,
                      k: Int = 64, bands: Int = 16,
                      maxBucket: Int = 10000)(
      implicit spark: SparkSession): Dataset[CandidatePair] = {
    import spark.implicits._
    val cutoff = math.max(0.0, threshold - 2.0 / math.sqrt(k.toDouble))
    // sign + band map-side: the text column ends here
    val exploded = docs
      .select(col(idCol).cast("long").as("doc_id"),
        Dedup.tokenHashes(col(textCol)).as("th"))
      .select(col("doc_id"),
        Dedup.minhashFromBaseHashes(
          Dedup.shingleHashesFromTokenHashes(col("th"), w), k).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(Dedup.bandHashes(col("sig"), k, bands)).as("b"))
      .select(col("b.band").as("band"), col("b.bh").as("bh"),
        col("doc_id"), col("sig"))
      .as[BucketDoc]
    exploded
      .groupByKey(d => (d.band, d.bh))
      .flatMapGroupsWithState[List[Member], CandidatePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows: Iterator[BucketDoc], state) =>
          var members = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[CandidatePair]
          // id order makes within-batch processing deterministic; the
          // emitted pair set is order-independent either way (unordered
          // pairs, emitted when the later member arrives)
          rows.toSeq.sortBy(_.doc_id).foreach { d =>
            if (!members.exists(_.id == d.doc_id) && members.size < maxBucket) {
              members.foreach { m =>
                if (agreement(m.sig, d.sig) >= cutoff)
                  out += CandidatePair(math.min(m.id, d.doc_id),
                    math.max(m.id, d.doc_id))
              }
              members = Member(d.doc_id, d.sig) :: members
            }
          }
          state.update(members)
          out.result().iterator
      }
  }
}
