package graft.ops

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import graft.Q
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.2 q92): treat media payloads
  * as opaque `BINARY` columns with typed metadata, and run decode /
  * feature-extraction as partition-local batch work.
  *
  * The codec is REAL: payloads are genuine GZIP streams (java.util.zip —
  * the one codec guaranteed in this environment; no image/audio libs
  * ship here) and the decode step parses genuine structure — the 2-byte
  * magic, the 4-byte little-endian ISIZE trailer, and a full
  * decompression whose length is verified against ISIZE. An image codec
  * (e.g. javax.imageio) drops in at the same signature; callers only see
  * [[MediaMeta]].
  *
  * Scale: encode/decode are the expensive map stages — they pipeline over
  * the scan with no shuffle; the only shuffle is the final small
  * aggregation.
  */
object Multimodal {

  /** Decoded-media metadata: compressed length, decompressed length, the
    * ISIZE field parsed from the gzip trailer, whether the decompressed
    * byte count matches it, and the container format from the magic bytes.
    */
  final case class MediaMeta(doc_id: Long, enc_len: Long, dec_len: Long,
                             isize: Long, isize_ok: Boolean, format: String)

  object GzipCodec {
    /** Real encode: text bytes → GZIP stream. */
    def encode(bytes: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bos)
      gz.write(bytes); gz.close()
      bos.toByteArray
    }

    /** Real decode as a streaming FOLD: magic check, full decompression
      * with every buffer segment handed to `onChunk`, ISIZE-trailer parse
      * and verification (RFC 1952 §2.3.1: last 4 bytes, little-endian,
      * uncompressed size mod 2^32). The stream is COUNTED, never
      * buffered: buffering would die with an uncatchable OutOfMemoryError
      * (not IOException) on an oversized/bomb payload — the exact
      * task-kill the corrupt classification exists to prevent. A payload
      * that passes the magic check but fails to decompress
      * (truncated/bit-flipped — inevitable in a 100 TB media corpus) is
      * surfaced as a `format="corrupt"` record rather than an exception
      * that would kill the whole task. ONE decode loop serves both
      * [[decode]] (metadata only) and [[Multimodal.features]] (histogram
      * fold) — a decode-path fix lands in both by construction.
      */
    def fold(docId: Long, payload: Array[Byte])
            (onChunk: (Array[Byte], Int) => Unit): MediaMeta = {
      val len = payload.length
      val isGzip = len > 18 &&
        (payload(0) & 0xff) == 0x1f && (payload(1) & 0xff) == 0x8b
      if (!isGzip) MediaMeta(docId, len.toLong, -1L, -1L, isize_ok = false, "raw")
      else {
        var in: GZIPInputStream = null
        try {
          // the constructor already parses the full header and can throw
          in = new GZIPInputStream(new java.io.ByteArrayInputStream(payload))
          val buf = new Array[Byte](8192)
          var decLen = 0L
          var n = in.read(buf)
          while (n >= 0) {
            if (n > 0) onChunk(buf, n)
            decLen += n
            n = in.read(buf)
          }
          val isize = (payload(len - 4) & 0xffL) |
            ((payload(len - 3) & 0xffL) << 8) |
            ((payload(len - 2) & 0xffL) << 16) |
            ((payload(len - 1) & 0xffL) << 24)
          MediaMeta(docId, len.toLong, decLen, isize,
            isize_ok = isize == (decLen & 0xffffffffL), "gzip")
        } catch {
          case _: java.io.IOException =>
            MediaMeta(docId, len.toLong, -1L, -1L, isize_ok = false, "corrupt")
        } finally if (in != null) in.close()
      }
    }

    /** Metadata-only decode (the q92 path). */
    def decode(docId: Long, payload: Array[Byte]): MediaMeta =
      fold(docId, payload)((_, _) => ())
  }

  /** documents.text carried as a REAL gzip-compressed binary payload
    * column — the stand-in for a media blob (the testdata has no binary
    * table). Encode is partition-local typed-Dataset work, the Scala
    * analog of a `mapInPandas` encode batch.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, lang, text) =>
        (id, lang, GzipCodec.encode(text.getBytes("UTF-8")))
      })
      .toDF("doc_id", "lang", "payload")
  }

  /** Partition-local decode: binary rows in, typed metadata out. Metadata
    * carried alongside the payload (here `lang`) rides through the decode
    * in the same tuple — re-joining it to the media table would force the
    * expensive encode stage (not projection-prunable through
    * mapPartitions) to run a second time over the whole corpus.
    */
  def decoded(s: SparkSession, dir: String): Dataset[(String, MediaMeta)] = {
    import s.implicits._
    mediaTable(s, dir)
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, lang, bytes) =>
        (lang, GzipCodec.decode(id, bytes))
      })
  }

  /** Decoded-payload feature vector: byte length + a 16-bin histogram of
    * the decompressed bytes (bin = high nibble). The structural stand-in
    * for an image/audio embedding: real numbers computed from the real
    * decoded stream, `array<float>` shaped exactly like the embeddings
    * table, so everything downstream (vec_cosine, sign-bucket ANN, k-NN
    * join) applies unchanged. Raw/corrupt payloads carry an empty vector.
    */
  final case class MediaFeatures(doc_id: Long, dec_len: Long,
                                 features: Array[Float])

  /** Decode + feature-extract fused in ONE partition-local pass — the
    * histogram folds over the same 8 KB read buffer the GzipCodec decode
    * loop uses, so feature extraction adds zero extra IO or buffering
    * (and inherits decode's no-buffer bomb safety + corrupt
    * classification). A real image featurizer (decode → resize → pool)
    * drops in at the same signature. Precision note: counts accumulate
    * in Long and emit as Float for vec_cosine compatibility — exact up
    * to 2^24 bytes PER BIN (~268 MB payloads at uniform spread); beyond
    * that, bins round to the nearest representable float, which shifts
    * cosine by < 1e-7 and is irrelevant to similarity use. The
    * MultimodalSpec mass-conservation assert is therefore a testdata
    * invariant, not a production claim past that bound.
    */
  def features(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, dir)
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, _, payload) =>
        val hist = new Array[Long](16)
        val meta = GzipCodec.fold(id, payload) { (buf, n) =>
          var i = 0
          while (i < n) { hist((buf(i) & 0xf0) >> 4) += 1; i += 1 }
        }
        if (meta.format == "gzip") MediaFeatures(id, meta.dec_len, hist.map(_.toFloat))
        else MediaFeatures(id, -1L, Array.empty)
      })
  }

  val queries: Map[String, Q] = Map(
    // Decode → per-lang compression stats; lang travels with the decode
    // tuple so the corpus is encoded exactly once per run.
    // Declared rows-only (no oracle): DuckDB has no gzip codec to mirror.
    // All output columns are scalars (driver-harness rule).
    "q92_multimodal_decode" -> ((s, dir) => {
      decoded(s, dir).toDF("lang", "m")
        .select(col("lang"), col("m.*"))
        .groupBy(col("lang"), col("format"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("enc_len")).as("enc_bytes"),
          sum(col("dec_len")).as("dec_bytes"),
          min(col("isize_ok")).as("all_isize_ok"))
        .orderBy(col("lang"), col("format"))
    })
  )

  val oracle: Map[String, String] = Map.empty
}
