package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata. The
  * Spark-side machinery — schema, partition-friendly projections, batch
  * shapes — is real; the actual media decode is STUBBED with a
  * deterministic fake (the decode libraries are not in this
  * environment), clearly marked below.
  */
object Binary {

  /** Typed row for the decoded-feature path. */
  final case class MediaFeature(
      doc_id: Long, media_type: String, byte_len: Long,
      width: Int, height: Int, channels: Int)

  /** Synthesize a media table from documents: payload = utf-8 bytes of
    * the text (an opaque stand-in), media_type cycled deterministically. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"))

  /** Pure-expression metadata extraction: byte length, content digest,
    * leading-bytes signature ("magic number" analogue). All codegen'd —
    * this is the path that scans 100 TB of payloads. */
  def payloadMetadata(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("media_type"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      sha2(col("payload"), 256).as("digest"),
      lower(hex(substring(col("payload"), 1, 8))).as("magic"))

  // ======================================================================
  // STUB: media decode. A real deployment decodes payload bytes with an
  // image/audio library inside mapPartitions (one decoder instance per
  // partition, vectorized batches). This environment has no such
  // libraries, so the decode is a DETERMINISTIC FAKE of the right shape:
  // dimensions derived from payload length/bytes. The Spark plumbing
  // (typed Dataset, per-partition execution, schema) is real.
  // ======================================================================
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val len = if (payload == null) 0 else payload.length
    val w = 64 + (len % 577)            // fake width
    val h = 64 + ((len * 31) % 433)     // fake height
    val c = if (len % 2 == 0) 3 else 1  // fake channel count
    (w, h, c)
  }

  /** Decode features via the per-partition path (mapPartitions so a real
    * decoder would be initialized once per partition, not per row). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: val decoder = Decoder.open() — once per partition
        rows.map { case (id, mt, payload) =>
          val (w, h, c) = decodeStub(payload)
          MediaFeature(id, mt, if (payload == null) 0L else payload.length.toLong, w, h, c)
        }
      }
  }

  /** Byte-value histogram of the payload — a REAL feature extractor
    * (no stub): byte distributions drive content-type sniffing,
    * compressed-vs-text detection and corruption screens, and this is
    * the per-row kernel shape any media featurizer has: payload in,
    * fixed-width vector out.
    *
    * Emits long-format rows (doc_id, bucket, cnt), buckets of width
    * 256/`buckets`; empty payloads contribute no rows. Computed by the
    * native one-pass kernel
    * ([[graft.functions.ByteHistogramKernel]] — payload in, count
    * vector out, map-only) and unrolled to long format with a
    * 64-rows-per-doc posexplode; the old per-BYTE explode + groupBy
    * ([[byteHistogramExplode]]) shuffled one row per payload byte,
    * which at 100 TB is a corpus-sized shuffle for a per-row
    * statistic. FunctionsSpec pins the two forms bit-equal. */
  def byteHistogram(media: DataFrame, buckets: Int = 16): DataFrame =
    media
      .select(col("doc_id"),
        posexplode(call_function("graft_bytehist",
          col("payload"), lit(buckets))).as(Seq("bucket", "cnt")))
      .filter(col("cnt") > 0)
      .select(col("doc_id"), col("bucket").cast("long").as("bucket"),
        col("cnt"))

  /** The declarative per-byte explode form of [[byteHistogram]] — kept
    * as the independent reference implementation the kernel is spec'd
    * bit-equal against (and the shape portable SQL engines replay). */
  def byteHistogramExplode(media: DataFrame, buckets: Int = 16): DataFrame = {
    require(buckets > 0 && 256 % buckets == 0, s"256 must divide into $buckets buckets")
    val width = 256 / buckets
    media
      .select(col("doc_id"), hex(col("payload")).as("h"),
        octet_length(col("payload")).as("n"))
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN n > 0 THEN
           |  transform(sequence(1, n),
           |    i -> cast(conv(substring(h, 2*i - 1, 2), 16, 10) AS BIGINT)
           |         div $width)
           |ELSE array() END""".stripMargin)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Frame sampling analogue: fixed-offset byte slices of the payload
    * (a video decoder would seek to timestamps; the slicing/explode
    * plumbing is identical). */
  def sampleFrames(media: DataFrame, frameBytes: Int, nFrames: Int): DataFrame =
    media.select(col("doc_id"),
      posexplode(expr(
        s"""transform(sequence(0, ${nFrames - 1}), i ->
           |  substring(payload, i * $frameBytes + 1, $frameBytes))""".stripMargin)))
      .toDF("doc_id", "frame_no", "frame_bytes")
      .filter(octet_length(col("frame_bytes")) > 0)
}
